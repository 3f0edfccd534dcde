#!/usr/bin/env python3
"""Bisect the _decode_cubes fast-mode chunk: which near-surface
select/scatter formulation is fastest on TPU at lr-kt shapes.

    python tools/chunk_prof.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def device_ms(name, fn, K=16, repeats=4):
    import jax
    import jax.numpy as jnp

    def leaf_contrib(leaf):
        x = jnp.asarray(leaf)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.where(jnp.isfinite(x), x, 0.0)
        return jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def run(k, eps0):
        def body(_, acc):
            out = fn(acc)
            c = sum(leaf_contrib(l) for l in jax.tree_util.tree_leaves(out))
            return acc + jnp.clip(c * 1e-20, -1e-8, 1e-8)
        return jax.lax.fori_loop(0, k, body, eps0)

    np.asarray(run(1, np.float32(0.0)))

    def timed(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(k, np.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (timed(2 * K) - timed(K)) / K * 1e3
    print(f"{name:52s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.models.decoder import apply_decoder
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.ops import voxel as voxops
    from nerf_fusion_tpu.system import mesher as mesher_mod

    repo = Path(__file__).resolve().parent.parent
    model, margs = load_model(repo / "ckpt/default/hyper.json", 300)
    dec_params, dec_cfg = model.decoder_params, model.decoder_config

    B, r = 512, 4
    L = margs.code_length
    n_hi = (2 * r) ** 3
    reeval = 65536
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(0, 0.3, (B, L)).astype(np.float32))
    valid = jnp.ones((B,), bool)

    device_ms("_decode_cubes fast chunk (current)",
              lambda eps: mesher_mod._decode_cubes(
                  dec_params, dec_cfg, lat + eps, valid, r, True, reeval))
    device_ms("_decode_cubes fast chunk (prec=default)",
              lambda eps: mesher_mod._decode_cubes(
                  dec_params, dec_cfg, lat + eps, valid, r, True, reeval,
                  "default"))
    device_ms("_decode_cubes FULL chunk (prec=high)",
              lambda eps: mesher_mod._decode_cubes(
                  dec_params, dec_cfg, lat + eps, valid, r, False, reeval))
    device_ms("_decode_cubes FULL chunk (prec=default)",
              lambda eps: mesher_mod._decode_cubes(
                  dec_params, dec_cfg, lat + eps, valid, r, False, reeval,
                  "default"))

    # pieces
    n_lo = r ** 3
    offs_lo = jnp.asarray(mesher_mod._coarse_offsets(r))
    offs_hi = jnp.asarray(mesher_mod._sample_offsets(r))
    T = jnp.asarray(mesher_mod._upsample_blend_matrix(r))
    HI = jax.lax.Precision.HIGHEST

    def coarse_up(eps):
        sdf_lo, std_lo = apply_decoder(
            dec_params, dec_cfg,
            jnp.concatenate([jnp.repeat(lat + eps, n_lo, 0),
                             jnp.tile(offs_lo, (B, 1))], 1))
        sdf_hi = jnp.matmul(sdf_lo.reshape(B, n_lo), T.T,
                            precision=HI).reshape(B * n_hi)
        std_hi = jnp.matmul(std_lo.reshape(B, n_lo), T.T,
                            precision=HI).reshape(B * n_hi)
        return sdf_hi, std_hi

    device_ms("  coarse decode + blend upsample", coarse_up)
    sdf_hi0, std_hi0 = jax.jit(coarse_up)(np.float32(0.0))

    def select_current(eps):
        near = (jnp.abs(sdf_hi0 + eps) < 0.05) & jnp.repeat(valid, n_hi)
        flat_idx = jnp.arange(B * n_hi)
        sel_idx, sel_valid, _ = voxops.compact_by_mask(flat_idx, near, reeval)
        return sel_idx, sel_valid

    device_ms("  near-select via compact_by_mask (segsum)", select_current)

    def select_scatter(eps):
        near = (jnp.abs(sdf_hi0 + eps) < 0.05) & jnp.repeat(valid, n_hi)
        flat_idx = jnp.arange(B * n_hi)
        rank = jnp.cumsum(near) - 1
        n = jnp.sum(near).astype(jnp.int32)
        dest = jnp.where(near & (rank < reeval), rank, reeval)
        out = jnp.zeros((reeval + 1,), flat_idx.dtype).at[dest].set(
            flat_idx, mode="drop", indices_are_sorted=True)
        return out[:reeval], jnp.arange(reeval) < n

    device_ms("  near-select via sorted scatter", select_scatter)

    sel_idx, sel_valid = jax.jit(select_current)(np.float32(0.0))

    def reeval_and_scatter(eps, sorted_flag):
        sel_b = sel_idx // n_hi
        sel_o = sel_idx % n_hi
        sdf_re, std_re = apply_decoder(
            dec_params, dec_cfg,
            jnp.concatenate([lat[sel_b] + eps, offs_hi[sel_o]], 1))
        sdf_re, std_re = sdf_re[:, 0], std_re[:, 0]
        dest = jnp.where(sel_valid, sel_idx, B * n_hi)
        kw = dict(mode="drop")
        if sorted_flag:
            kw["indices_are_sorted"] = True
        sdf = jnp.concatenate([sdf_hi0, jnp.zeros((1,))]).at[dest].set(
            jnp.where(sel_valid, sdf_re, 0.0), **kw)[:-1]
        std = jnp.concatenate([std_hi0, jnp.zeros((1,))]).at[dest].set(
            jnp.where(sel_valid, std_re, 0.0), **kw)[:-1]
        return sdf, std

    device_ms("  reeval + scatter-back (sorted flag)",
              lambda eps: reeval_and_scatter(eps, True))
    device_ms("  reeval + scatter-back (no flag)",
              lambda eps: reeval_and_scatter(eps, False))

    # where-merge alternative: avoid the scatter entirely by recomputing
    # membership: a position was re-evaluated iff its rank among near cells
    # is < reeval.
    def reeval_where_merge(eps):
        near = jnp.abs(sdf_hi0) < 0.05
        rank = jnp.cumsum(near) - 1
        sel_b = sel_idx // n_hi
        sel_o = sel_idx % n_hi
        sdf_re, std_re = apply_decoder(
            dec_params, dec_cfg,
            jnp.concatenate([lat[sel_b] + eps, offs_hi[sel_o]], 1))
        # scatter of the re-decoded values gathered back by rank
        take = jnp.clip(rank, 0, reeval - 1)
        sdf = jnp.where(near & (rank < reeval), sdf_re[:, 0][take], sdf_hi0)
        std = jnp.where(near & (rank < reeval), std_re[:, 0][take], std_hi0)
        return sdf, std

    device_ms("  reeval + gather-by-rank where-merge", reeval_where_merge)


if __name__ == "__main__":
    main()
