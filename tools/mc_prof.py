#!/usr/bin/env python3
"""Decompose marching_cubes_sparse device time at lr-kt flagship shapes.

    python tools/mc_prof.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def device_ms(name, fn, K=8, repeats=4):
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
    print(f"{name:44s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.ops import marching_cubes as mc
    from nerf_fusion_tpu.ops import voxel as vox

    B, r = 4096, 4
    C = 40960
    n_xyz = (80, 40, 80)
    n_vox = int(np.prod(n_xyz))
    rng = np.random.default_rng(0)

    # Synthetic but realistic batch: B distinct voxel ids, latents->slots.
    ids = rng.choice(n_vox, B, replace=False).astype(np.int32)
    indexer = np.full((n_vox,), -1, np.int32)
    indexer[ids] = np.arange(B)
    batch_map = np.full((C,), -1, np.int32)
    batch_map[:B] = np.arange(B)
    # smooth-ish sdf field with a surface crossing per voxel
    S = 2 * r
    g = np.linspace(-0.6, 0.6, S, dtype=np.float32)
    base = g[None, :, None, None] + 0.3 * g[None, None, :, None] \
        + 0.1 * g[None, None, None, :]
    cube_sdf = jnp.asarray(base + rng.normal(0, 0.05, (B, S, S, S)).astype(np.float32))
    cube_std = jnp.asarray(rng.uniform(0.02, 0.1, (B, S, S, S)).astype(np.float32))
    indexer = jnp.asarray(indexer)
    batch_map = jnp.asarray(batch_map)
    ids_j = jnp.asarray(ids)
    valid = jnp.ones((B,), bool)
    bmin = jnp.asarray([-3.5, -0.5, -2.5], jnp.float32)

    device_ms("marching_cubes_sparse (whole)",
              lambda eps: mc.marching_cubes_sparse(
                  indexer, batch_map, ids_j, valid, cube_sdf + eps, cube_std,
                  n_xyz, 0.1, bmin, r, C, 0.15, 1 << 18))

    corner = jax.jit(lambda eps: mc._corner_field(
        indexer, batch_map, ids_j, cube_sdf + eps, cube_std, n_xyz, r, C))
    device_ms("  _corner_field (27-offset blend)", corner)

    sdf, std = corner(np.float32(0.0))

    cr = np.arange(r)
    cx, cy, cz = np.meshgrid(cr, cr, cr, indexing="ij")
    cell = jnp.asarray(np.stack([cx, cy, cz], -1).reshape(-1, 3), jnp.int32)
    corners_i = jnp.asarray(mc.CORNERS.astype(np.int32))
    cidx = cell[:, None, :] + corners_i[None, :, :]
    Q = cell.shape[0]

    def corner_gather(eps):
        c_sdf = (sdf + eps)[:, cidx[..., 0], cidx[..., 1], cidx[..., 2]]
        c_std = std[:, cidx[..., 0], cidx[..., 1], cidx[..., 2]]
        return c_sdf, c_std

    device_ms("  corner gather (B,Q,8)", corner_gather)

    c_sdf, c_std = jax.jit(corner_gather)(np.float32(0.0))

    def edge_all(eps):
        ec = jnp.asarray(mc.EDGE_CORNERS)
        v1 = (c_sdf + eps)[..., ec[:, 0]]
        v2 = c_sdf[..., ec[:, 1]]
        s1 = c_std[..., ec[:, 0]]
        s2 = c_std[..., ec[:, 1]]
        denom = v2 - v1
        t = jnp.where(jnp.abs(denom) < 1e-5, 0.0,
                      -v1 / jnp.where(denom == 0, 1.0, denom))
        t = jnp.clip(t, 0.0, 1.0)
        p1 = jnp.asarray(mc.CORNERS[mc.EDGE_CORNERS[:, 0]], jnp.float32)
        p2 = jnp.asarray(mc.CORNERS[mc.EDGE_CORNERS[:, 1]], jnp.float32)
        edge_pos = p1[None, None] + t[..., None] * (p2 - p1)[None, None]
        edge_std = s1 + t * (s2 - s1)
        return edge_pos, edge_std

    device_ms("  edge lerp over ALL B*Q cells", edge_all)

    edge_pos, edge_std = jax.jit(edge_all)(np.float32(0.0))
    inside = (c_sdf < 0).astype(jnp.int32)
    config = jnp.sum(inside * (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :],
                     axis=-1)
    NC = min(B * Q, max(4096, B * 4 * r))
    active = valid[:, None] & (config > 0) & (config < 255)

    def compact_gather(eps):
        flat_active = active.reshape(-1)
        cell_idx, cell_ok, _ = vox.compact_by_mask(
            jnp.arange(B * Q, dtype=jnp.int32), flat_active, NC)
        ew = (edge_pos + eps).reshape(B * Q, 12 * 3)[cell_idx]
        es = edge_std.reshape(B * Q, 12)[cell_idx]
        cfg_c = config.reshape(-1)[cell_idx]
        fid_c = ids_j[cell_idx // Q]
        return ew, es, cfg_c, cell_ok, fid_c

    device_ms(f"  active compact + row gather (NC={NC})", compact_gather)

    ew, es, cfg_c, cell_ok, fid_c = jax.jit(compact_gather)(np.float32(0.0))
    SEL, EX = mc._tri_select_consts()
    T = mc.MAX_TRIS_PER_CELL

    ew3 = ew.reshape(NC, 12, 3)

    def sel_mats(eps):
        onehot = ((cfg_c + (eps * 0).astype(cfg_c.dtype))[:, None]
                  == jnp.arange(256, dtype=cfg_c.dtype)).astype(jnp.float32)
        tri_sel = jnp.matmul(onehot, jnp.asarray(SEL))
        tri_ok = jnp.matmul(onehot, jnp.asarray(EX)) > 0.5
        return tri_sel, tri_ok

    device_ms("  onehot + SEL/EX matmuls", sel_mats)
    tri_sel_v, tri_ok_v = jax.jit(sel_mats)(np.float32(0.0))
    tri_sel_v = tri_sel_v.reshape(NC, T, 3, 12)

    def apply_einsum(eps):
        verts = jnp.einsum("ntke,ned->ntkd", tri_sel_v, ew3 + eps,
                           precision=mc._HI)
        vstd = jnp.einsum("ntke,ne->ntk", tri_sel_v, es + eps,
                          precision=mc._HI)
        return verts, vstd

    device_ms("  edge-value einsum application", apply_einsum)
    verts_v, vstd_v = jax.jit(apply_einsum)(np.float32(0.0))

    # gather variant: one-hot -> edge INDICES, then take_along_axis on the
    # (complex-packed) edge values — 3 gathers of NC*15 instead of the
    # batched tiny einsum.
    T3 = T * 3
    EIDX = np.zeros((256, T3), np.float32)
    from nerf_fusion_tpu.ops.mc_tables import TRI_TABLE
    for c in range(256):
        row = TRI_TABLE[c]
        for t in range(T):
            if row[3 * t] < 0:
                break
            for kk in range(3):
                EIDX[c, t * 3 + kk] = float(row[3 * t + kk])

    def apply_gather(eps):
        onehot = (cfg_c[:, None] == jnp.arange(256, dtype=cfg_c.dtype)
                  ).astype(jnp.float32)
        eidx = jnp.matmul(onehot, jnp.asarray(EIDX)).astype(jnp.int32)
        ewv = ew.reshape(NC, 12, 3) + eps
        cxy = jax.lax.complex(ewv[..., 0], ewv[..., 1])          # (NC,12)
        cz_s = jax.lax.complex(ewv[..., 2], es)                  # (NC,12)
        gxy = jnp.take_along_axis(cxy, eidx, axis=1)             # (NC,15)
        gzs = jnp.take_along_axis(cz_s, eidx, axis=1)
        verts = jnp.stack([jnp.real(gxy), jnp.imag(gxy),
                           jnp.real(gzs)], -1).reshape(NC, T, 3, 3)
        vstd = jnp.imag(gzs).reshape(NC, T, 3)
        return verts, vstd

    device_ms("  edge-value GATHER application", apply_gather)

    def budget_compact(eps):
        tri_valid = tri_ok_v & cell_ok[:, None] & \
            (jnp.max(vstd_v + eps, -1) <= 0.15)
        flat_valid = tri_valid.reshape(-1)
        n_tri = jnp.sum(flat_valid).astype(jnp.int32)
        rank = jnp.cumsum(flat_valid) - 1
        budget = 1 << 18
        keep = flat_valid & (rank < budget)
        seg = jnp.clip(rank, 0, budget - 1)
        packed = jnp.concatenate([
            verts_v.reshape(-1, 9), vstd_v.reshape(-1, 3),
            jnp.broadcast_to(fid_c[:, None], (NC, T)).reshape(-1, 1)
            .astype(jnp.float32) + 1.0,
        ], axis=1) * keep.astype(jnp.float32)[:, None]
        out = jax.ops.segment_sum(packed, seg, num_segments=budget,
                                  indices_are_sorted=True)
        return out, n_tri

    device_ms("  sorted-segment budget compaction", budget_compact)


if __name__ == "__main__":
    main()
