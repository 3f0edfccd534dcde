#!/usr/bin/env python3
"""Decompose fused_extract's device time: chunked decode vs marching cubes
vs candidate selection.  Device-loop protocol (tools/microbench.py).

    python tools/extract_prof.py [--data output/lrkt_data/lr-kt]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fusion-lr-kt-fast.yaml")
    ap.add_argument("--data", default="output/lrkt_data/lr-kt")
    ap.add_argument("--eps", type=float, default=None,
                    help="override mesh_reuse_latent_eps for the "
                         "steady-state PROD section")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.ops import voxel as voxops
    from nerf_fusion_tpu.ops.marching_cubes import marching_cubes_sparse
    from nerf_fusion_tpu.system import mesher as mesher_mod
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    repo = Path(__file__).resolve().parent.parent
    args = exp_util.parse_config_yaml(repo / cli.config)
    model, margs = load_model(repo / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    args.run_async = False
    if cli.eps is not None:
        args.mesh_reuse_latent_eps = cli.eps
    tq = json.loads((Path(cli.data) / "first_tq.json").read_text())
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    seq = ICLNUIMSequence(path=cli.data, start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    pipe = FusionPipeline(model, args)
    for i in range(42):
        pipe.process_frame(next(seq), i)
    pipe.trajectory()

    vmap = pipe.map
    cfg = vmap.cfg
    upd_all = jnp.ones((cfg.latent_capacity,), bool)
    r = int(args.resolution)
    mesh_budget = pipe.mesher.mesh_budget
    tri_budget = pipe.mesher.fused_tri_budget
    reeval = max(1024, int(mesher_mod.MESH_CHUNK * (2 * r) ** 3
                           * pipe.mesher.reeval_fraction))
    dec_params = vmap.model.decoder_params
    dec_cfg = vmap.model.decoder_config
    state = vmap.state
    C = cfg.latent_capacity
    CH = mesher_mod.MESH_CHUNK

    # ---- whole thing
    device_ms("fused_extract (whole)", lambda eps: mesher_mod.fused_extract(
        state, upd_all, cfg, dec_params, dec_cfg, r, True, mesh_budget,
        tri_budget, reeval, 0.15 + eps))

    # ---- candidate selection only (replicates the head of fused_extract)
    @jax.jit
    def select(eps):
        upd = upd_all & (state.positions >= 0)
        upd_ids, upd_valid, _ = voxops.compact_by_mask(
            state.positions, upd, mesh_budget)
        exp_ids, exp_valid = voxops.expand_neighbors6(
            upd_ids, upd_valid, cfg.n_xyz)
        uniq, uniq_valid, _, _ = voxops.masked_unique(
            exp_ids, exp_valid, mesh_budget)
        slots = state.indexer[jnp.clip(uniq, 0, cfg.n_voxels - 1)]
        slot_c = jnp.clip(slots, 0, C - 1)
        keep = uniq_valid & (slots >= 0) & \
            (state.obs_count[slot_c] > cfg.ignore_count_th + eps)
        lat_b = jnp.where(keep[:, None], state.latents[slot_c], 0.0)
        return lat_b, keep, uniq

    device_ms("candidate selection", select)

    lat_b, keep, uniq = select(np.float32(0.0))

    # ---- decode only (the scan over chunks)
    n_chunks = mesh_budget // CH
    L = lat_b.shape[-1]

    @jax.jit
    def decode_all(eps):
        def chunk_body(_, inp):
            lat_c, val_c = inp
            csdf, cstd = mesher_mod._decode_cubes(
                dec_params, dec_cfg, lat_c + eps, val_c, r, True, reeval)
            return 0, (csdf, cstd)
        _, (sdf_ch, std_ch) = jax.lax.scan(
            chunk_body, 0,
            (lat_b.reshape(n_chunks, CH, L), keep.reshape(n_chunks, CH)))
        return sdf_ch, std_ch

    device_ms(f"decode scan ({n_chunks}x{CH} voxels)", decode_all)

    sdf_ch, std_ch = decode_all(np.float32(0.0))
    shape = (mesh_budget, 2 * r, 2 * r, 2 * r)
    cube_sdf = sdf_ch.reshape(shape)
    cube_std = std_ch.reshape(shape)
    batch_map = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(keep, jnp.clip(state.indexer[jnp.clip(
            uniq, 0, cfg.n_voxels - 1)], 0, C - 1), C)].set(
        jnp.arange(mesh_budget, dtype=jnp.int32), mode="drop")

    # ---- one decode chunk, split fast-mode stages
    lat_c = lat_b[:CH]
    val_c = keep[:CH]
    device_ms("  one chunk: full _decode_cubes",
              lambda eps: mesher_mod._decode_cubes(
                  dec_params, dec_cfg, lat_c + eps, val_c, r, True, reeval))

    from nerf_fusion_tpu.models.decoder import apply_decoder
    n_lo = r ** 3
    offs_lo = jnp.asarray(mesher_mod._coarse_offsets(r))

    @jax.jit
    def coarse_only(eps):
        lat_rep = jnp.repeat(lat_c + eps, n_lo, axis=0)
        offs_rep = jnp.tile(offs_lo, (CH, 1))
        sdf, std = apply_decoder(dec_params, dec_cfg,
                                 jnp.concatenate([lat_rep, offs_rep], 1))
        return sdf, std

    device_ms(f"  coarse decode ({CH * n_lo} pts)", coarse_only)

    @jax.jit
    def reeval_decode(eps):
        sel_b = jnp.arange(reeval) % CH
        offs_hi = jnp.asarray(mesher_mod._sample_offsets(r))
        sel_o = jnp.arange(reeval) % offs_hi.shape[0]
        sdf, std = apply_decoder(
            dec_params, dec_cfg,
            jnp.concatenate([lat_c[sel_b] + eps, offs_hi[sel_o]], 1))
        return sdf, std

    device_ms(f"  reeval decode ({reeval} pts)", reeval_decode)

    # ---- MC only
    device_ms("marching_cubes_sparse", lambda eps: marching_cubes_sparse(
        state.indexer, batch_map, uniq.astype(jnp.int32), keep,
        cube_sdf + eps, cube_std, cfg.n_xyz, cfg.voxel_size,
        jnp.asarray(cfg.bound_min, jnp.float32),
        r, C, 0.15, tri_budget))

    # ---- steady-state PRODUCTION cadence extraction (the number VERDICT
    # r4 #4 gates): run the pipeline on to the next cadence boundary, grab
    # the REAL accumulated updated-set (and, with mesh_reuse_latent_eps
    # configured, the mesher's live latent snapshot), then device-loop
    # fused_extract with the pipeline's exact parameters — decode mode and
    # precision from the config, reuse cache on vs off.
    mesher = pipe.mesher
    frames_late = [next(seq) for i in range(42, 81)]
    for i, f in zip(range(42, 80), frames_late):
        pipe.process_frame(f, i)
    # frame 80 is a cadence frame: run its track + integrate exactly as
    # process_frame would, then snapshot the accumulated updated-set
    # BEFORE the extraction that would consume it — that mask is the real
    # steady-state cadence batch.
    f80 = frames_late[-1]
    pose = pipe.tracker.track_camera(
        f80.rgb, f80.depth, f80.calib,
        depth_cut=(args.depth_cut_min, args.depth_cut_max))
    pts, nrm, mask = pipe.tracker.last_processed_pc
    vmap.integrate_keyframe(pts, nrm, valid=mask, pose=pose)
    pipe.trajectory()
    mesher.join_async()
    state = vmap.state
    with vmap._upd_lock:
        upd_real = vmap._updated_dev
        if vmap.updated_slots.any():
            h = jnp.asarray(vmap.updated_slots)
            upd_real = h if upd_real is None else (upd_real | h)
    if upd_real is None:
        upd_real = upd_all
    n_upd = int(jax.device_get(upd_real.sum()))
    blend = mesher._get_blend(r, None)
    mprec = mesher.decode_precision
    mfast = pipe.mesh_fast
    print(f"steady state at frame 80: {n_upd} updated slots, "
          f"decode={'fast' if mfast else 'full'}/{mprec}, "
          f"reuse_eps={mesher.reuse_latent_eps}")

    device_ms("PROD cadence extract (no reuse cache)",
              lambda eps: mesher_mod.fused_extract(
                  state, upd_real, cfg, dec_params, dec_cfg, r, mfast,
                  mesh_budget, tri_budget, reeval, 0.15 + eps, mprec,
                  blend=blend)[0].n_triangles, K=8)

    if mesher.reuse_latent_eps > 0.0 and mesher._mesh_cache is not None:
        cache = mesher._mesh_cache
        eps_r = jnp.float32(mesher.reuse_latent_eps)
        kept = int(jax.device_get(jnp.sum(
            upd_real & (state.positions >= 0)
            & (~cache[1] | (jnp.max(jnp.abs(state.latents - cache[0]),
                                    axis=-1) > eps_r)))))
        print(f"  reuse gate keeps {kept}/{n_upd} updated slots")
        device_ms("PROD cadence extract (latent-reuse cache)",
                  lambda eps: mesher_mod.fused_extract(
                      state, upd_real, cfg, dec_params, dec_cfg, r, mfast,
                      mesh_budget, tri_budget, reeval, 0.15 + eps, mprec,
                      blend=blend, mesh_cache=cache,
                      reuse_eps=eps_r)[0].n_triangles, K=8)


if __name__ == "__main__":
    main()
