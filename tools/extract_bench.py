#!/usr/bin/env python3
"""Device-time decomposition of fused_extract at the lr-kt budgets.

Builds real map state by running the flagship pipeline over a few
frames, then times each extraction stage with the device-loop protocol
(tools/microbench.py): decode chunks, corner-field blend, the MC cell
pass pieces, and the whole program.  Targets the one remaining multi-ms
amortized cost of the frame loop (cadence extraction).

    python tools/extract_bench.py [--frames 25]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from microbench import device_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fusion-lr-kt-fast.yaml")
    ap.add_argument("--data", default="output/lrkt_data/lr-kt")
    ap.add_argument("--frames", type=int, default=25)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.ops import marching_cubes as mc
    from nerf_fusion_tpu.ops import voxel as voxops
    from nerf_fusion_tpu.system import mesher as mesher_mod
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    print("device:", jax.devices()[0])
    args = exp_util.parse_config_yaml(Path(cli.config))
    model, margs = load_model(args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    tq = args.sequence_kwargs["first_tq"]
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    seq = ICLNUIMSequence(path=cli.data, start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    frames = [next(seq) for _ in range(cli.frames)]
    pipe = FusionPipeline(model, args)
    for i, f in enumerate(frames):
        pipe.process_frame(f, i)

    vmap = pipe.map
    state, cfg = vmap.state, vmap.cfg
    dec_params = vmap.model.decoder_params
    dec_cfg = vmap.model.decoder_config
    r = int(args.resolution)
    B = pipe.mesher.mesh_budget
    tri_budget = pipe.mesher.fused_tri_budget
    reeval = max(1024, int(mesher_mod.MESH_CHUNK * (2 * r) ** 3
                           * pipe.mesher.reeval_fraction))
    upd_all = jnp.ones((cfg.latent_capacity,), bool)
    print(f"budgets: mesh={B} tri={tri_budget} reeval/chunk={reeval} r={r} "
          f"occupancy={int(np.asarray(state.n_occupied))}")

    # ---- whole program ----------------------------------------------------
    device_time("fused_extract WHOLE", lambda eps: mesher_mod.fused_extract(
        state._replace(latents=state.latents + eps), upd_all, cfg,
        dec_params, dec_cfg, r, True, B, tri_budget, reeval, 0.15)[0]
        .n_triangles, K=4)

    # ---- stage inputs (one real extraction's intermediates) ---------------
    C = cfg.latent_capacity
    upd = upd_all & (state.positions >= 0)
    upd_ids, upd_valid, _ = voxops.compact_by_mask(state.positions, upd, B)
    exp_ids, exp_valid = voxops.expand_neighbors6(upd_ids, upd_valid, cfg.n_xyz)
    uniq, uniq_valid, _, _ = voxops.masked_unique(exp_ids, exp_valid, B)
    slots = state.indexer[jnp.clip(uniq, 0, cfg.n_voxels - 1)]
    slot_c = jnp.clip(slots, 0, C - 1)
    keep = uniq_valid & (slots >= 0) & \
        (state.obs_count[slot_c] > cfg.ignore_count_th)
    batch_map = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(keep, slot_c, C)].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop")
    lat_b = jnp.where(keep[:, None], state.latents[slot_c], 0.0)

    device_time("  candidate select (compact+expand+unique)",
                lambda eps: voxops.masked_unique(
                    *voxops.expand_neighbors6(
                        *voxops.compact_by_mask(
                            state.positions,
                            upd_all & (state.positions + int(eps * 0) >= 0),
                            B)[:2], cfg.n_xyz), B)[0], K=8)

    CH = mesher_mod.MESH_CHUNK
    n_chunks = B // CH
    lat_c = lat_b[:CH]
    val_c = keep[:CH]
    device_time(f"  _decode_cubes 1 chunk ({CH}) x{n_chunks}",
                lambda eps: mesher_mod._decode_cubes(
                    dec_params, dec_cfg, lat_c + eps, val_c, r, True,
                    reeval)[0], K=8)

    # full cube grids for the MC stage
    import jax.lax as lax
    L = lat_b.shape[-1]

    def all_chunks(eps):
        def body(_, inp):
            lc, vc = inp
            s, d = mesher_mod._decode_cubes(dec_params, dec_cfg, lc, vc,
                                            r, True, reeval)
            return 0, (s, d)
        _, (s, d) = lax.scan(body, 0, ((lat_b + eps).reshape(n_chunks, CH, L),
                                       keep.reshape(n_chunks, CH)))
        return s

    device_time("  decode ALL chunks (scan)", all_chunks, K=4)
    cube_sdf = all_chunks(0.0).reshape(B, 2 * r, 2 * r, 2 * r)
    cube_std = jnp.abs(cube_sdf) * 0.1 + 0.01

    device_time("  _corner_field (27-offset blend matmuls)",
                lambda eps: mc._corner_field(
                    state.indexer, batch_map, uniq.astype(jnp.int32),
                    cube_sdf + eps, cube_std, cfg.n_xyz, r, C)[0], K=8)

    device_time("  marching_cubes_sparse WHOLE",
                lambda eps: mc.marching_cubes_sparse(
                    state.indexer, batch_map, uniq.astype(jnp.int32), keep,
                    cube_sdf + eps, cube_std, cfg.n_xyz, cfg.voxel_size,
                    jnp.asarray(cfg.bound_min, jnp.float32),
                    r, C, 0.15, tri_budget).n_triangles, K=4)

    # ---- MC sub-pieces -----------------------------------------------------
    sdf, std = mc._corner_field(state.indexer, batch_map,
                                uniq.astype(jnp.int32), cube_sdf, cube_std,
                                cfg.n_xyz, r, C)

    cr = np.arange(r)
    cx, cy, cz = np.meshgrid(cr, cr, cr, indexing="ij")
    cell = jnp.asarray(np.stack([cx, cy, cz], -1).reshape(-1, 3), jnp.int32)
    corners_i = jnp.asarray(mc.CORNERS.astype(np.int32))
    cidx = cell[:, None, :] + corners_i[None, :, :]
    Q = cell.shape[0]

    def corner_gather(eps):
        s = sdf + eps
        return (s[:, cidx[..., 0], cidx[..., 1], cidx[..., 2]],
                std[:, cidx[..., 0], cidx[..., 1], cidx[..., 2]])

    device_time("    corner gather (B,Q,8) static-idx", corner_gather, K=8)
    c_sdf, c_std = corner_gather(0.0)

    ec = jnp.asarray(mc.EDGE_CORNERS)

    def edge_lerp(eps):
        v1 = (c_sdf + eps)[..., ec[:, 0]]
        v2 = (c_sdf + eps)[..., ec[:, 1]]
        s1 = c_std[..., ec[:, 0]]
        s2 = c_std[..., ec[:, 1]]
        denom = v2 - v1
        t = jnp.where(jnp.abs(denom) < 1e-5, 0.0,
                      -v1 / jnp.where(denom == 0, 1.0, denom))
        t = jnp.clip(t, 0.0, 1.0)
        p1 = jnp.asarray(mc.CORNERS[mc.EDGE_CORNERS[:, 0]], jnp.float32)
        p2 = jnp.asarray(mc.CORNERS[mc.EDGE_CORNERS[:, 1]], jnp.float32)
        edge_pos = p1[None, None] + t[..., None] * (p2 - p1)[None, None]
        return edge_pos, s1 + t * (s2 - s1)

    device_time("    edge lerp ALL cells (B,Q,12,3)", edge_lerp, K=8)

    device_time("    active compact (B*Q)",
                lambda eps: voxops.compact_by_mask(
                    jnp.arange(B * Q, dtype=jnp.int32),
                    ((c_sdf + eps) < 0).any(-1).reshape(-1),
                    min(B * Q, max(4096, B * 4 * r)))[0], K=8)


if __name__ == "__main__":
    main()
