#!/usr/bin/env python3
"""Decompose integrate_keyframe device time at lr-kt flagship shapes.

    python tools/integrate_prof.py
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
    print(f"{name:48s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.encoder import apply_encoder
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.ops import voxel as vox
    from nerf_fusion_tpu.system import map as map_mod
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    repo = Path(__file__).resolve().parent.parent
    data = repo / "output" / "lrkt_data" / "lr-kt"
    args = exp_util.parse_config_yaml(repo / "configs" / "fusion-lr-kt-fast.yaml")
    model, margs = load_model(repo / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    args.run_async = False
    tq = json.loads((data / "first_tq.json").read_text())
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    seq = ICLNUIMSequence(path=str(data), start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    pipe = FusionPipeline(model, args)
    for i in range(42):
        pipe.process_frame(next(seq), i)
    pipe.trajectory()

    vmap = pipe.map
    cfg = vmap.cfg
    state = vmap.state
    tr = pipe.tracker
    pts, nrm, mask = tr.last_processed_pc
    pose = tr.all_pd_pose[-1]
    pose_R = (jnp.asarray(pose.q.rotation_matrix, jnp.float32)
              if hasattr(pose, "q") else pose[0])
    pose_t = (jnp.asarray(pose.t, jnp.float32)
              if hasattr(pose, "q") else pose[1])
    pts = jnp.asarray(pts, jnp.float32)
    nrm = jnp.asarray(nrm, jnp.float32)
    mask = jnp.asarray(mask, bool)

    device_ms("integrate_keyframe (whole)",
              lambda eps: map_mod.integrate_keyframe(
                  state, cfg, vmap.model.encoder_params, vmap.model.encoder_bn,
                  vmap.model.encoder_config, pts + eps, nrm, mask,
                  pose_R, pose_t))

    # stage probes (mirror the body)
    bound_min = jnp.asarray(cfg.bound_min, jnp.float32)
    HI = jax.lax.Precision.HIGHEST

    @jax.jit
    def head(eps):
        p = jnp.matmul(pts + eps, pose_R.T, precision=HI) + pose_t[None, :]
        n = jnp.matmul(nrm, pose_R.T, precision=HI)
        xyz_norm, grid = vox.world_to_grid(p, bound_min, cfg.voxel_size)
        valid = mask & vox.in_bounds(grid, cfg.n_xyz)
        gid = vox.linearize_id(
            jnp.clip(grid, 0, jnp.asarray(cfg.n_xyz) - 1), cfg.n_xyz)
        return xyz_norm, gid, valid, n

    device_ms("  transform + grid", head)
    xyz_norm, gid, valid, nrm_w = jax.jit(head)(np.float32(0.0))

    device_ms("  occurrence_count (prune)",
              lambda eps: vox.occurrence_count(
                  gid + (eps * 0).astype(gid.dtype), valid))

    device_ms("  _allocate", lambda eps: map_mod._allocate(
        state, cfg, gid + (eps * 0).astype(gid.dtype), valid))

    @jax.jit
    def focus(eps):
        enc_slot_mask = (state.positions >= 0) & \
            (state.obs_count + eps < cfg.encoder_count_th)
        enc_pos = jnp.where(enc_slot_mask, state.positions, 0)
        exp_ids, exp_valid = vox.expand_neighbors6(
            enc_pos, enc_slot_mask, cfg.n_xyz)
        focus_grid = jnp.zeros((cfg.n_voxels,), bool).at[
            jnp.where(exp_valid, exp_ids, 0)].set(exp_valid, mode="drop")
        return focus_grid[gid] & valid

    device_ms("  focus grid + membership", focus)
    point_focus = jax.jit(focus)(np.float32(0.0))

    n_xyz_arr = jnp.asarray(cfg.n_xyz, jnp.int32)
    offs = jnp.asarray(map_mod._CORNER_OFFSETS)

    @jax.jit
    def corner8(eps):
        tgt = jnp.ceil(xyz_norm[:, None, :] + eps
                       + offs[None, :, :]).astype(jnp.int32) - 1
        tgt = jnp.clip(tgt, 0, n_xyz_arr[None, None, :] - 1)
        rel = xyz_norm[:, None, :] - tgt.astype(jnp.float32) - 0.5
        tgt_gid = vox.linearize_id(tgt, cfg.n_xyz)
        tgt_slot = state.indexer[tgt_gid]
        feats = jnp.concatenate(
            [rel, jnp.broadcast_to(nrm_w[:, None, :], rel.shape)],
            axis=-1).reshape(-1, 6)
        return feats, tgt_slot

    device_ms("  x8 corner gather/features", corner8)
    feats, tgt_slot = jax.jit(corner8)(np.float32(0.0))

    device_ms(f"  encoder fwd ({feats.shape[0]} pts)",
              lambda eps: apply_encoder(
                  vmap.model.encoder_params, vmap.model.encoder_bn,
                  vmap.model.encoder_config, feats + eps, train=False))

    enc_latent, _ = jax.jit(lambda: apply_encoder(
        vmap.model.encoder_params, vmap.model.encoder_bn,
        vmap.model.encoder_config, feats, train=False))()
    seg = jnp.clip(tgt_slot.reshape(-1), 0, cfg.latent_capacity - 1)
    cmask = point_focus[:, None] & (tgt_slot >= 0)
    cmask = cmask.reshape(-1)

    device_ms(f"  segment_sum fusion ({seg.shape[0]}x{enc_latent.shape[1]})",
              lambda eps: (
                  vox.masked_segment_sum(enc_latent + eps, seg, cmask,
                                         cfg.latent_capacity),
                  vox.masked_segment_sum(jnp.ones_like(seg, jnp.float32),
                                         seg, cmask, cfg.latent_capacity)))

    # cumulative prefixes of the real body (isolated probes hide
    # fusion/layout interactions; whole - last prefix = the residual)
    @jax.jit
    def prefix_through_allocate(eps):
        st = map_mod._allocate(state, cfg,
                               gid + (eps * 0).astype(gid.dtype), valid)
        return st.indexer.sum(), st.n_occupied

    device_ms("  prefix: transform+prune+allocate", prefix_through_allocate)

    @jax.jit
    def prefix_through_encoder(eps):
        st = map_mod._allocate(state, cfg, gid, valid)
        enc_slot_mask = (st.positions >= 0) & \
            (st.obs_count < cfg.encoder_count_th)
        enc_pos = jnp.where(enc_slot_mask, st.positions, 0)
        exp_ids, exp_valid = vox.expand_neighbors6(enc_pos, enc_slot_mask,
                                                   cfg.n_xyz)
        focus_grid = jnp.zeros((cfg.n_voxels,), bool).at[
            jnp.where(exp_valid, exp_ids, 0)].set(exp_valid, mode="drop")
        pf = focus_grid[gid] & valid
        tgt = jnp.ceil(xyz_norm[:, None, :] + eps
                       + offs[None, :, :]).astype(jnp.int32) - 1
        tgt = jnp.clip(tgt, 0, n_xyz_arr[None, None, :] - 1)
        rel = xyz_norm[:, None, :] - tgt.astype(jnp.float32) - 0.5
        tgt_gid2 = vox.linearize_id(tgt, cfg.n_xyz)
        tgt_slot2 = st.indexer[tgt_gid2]
        f = jnp.concatenate(
            [rel, jnp.broadcast_to(nrm_w[:, None, :], rel.shape)],
            axis=-1).reshape(-1, 6)
        lat, _ = apply_encoder(vmap.model.encoder_params,
                               vmap.model.encoder_bn,
                               vmap.model.encoder_config, f, train=False)
        return lat.sum(), pf.sum(), tgt_slot2.sum()

    device_ms("  prefix: ... + focus + corner + encoder",
              prefix_through_encoder)

    def fusion_sorted(eps):
        segk = jnp.where(cmask, seg, cfg.latent_capacity)
        s, order = jax.lax.sort(
            (segk, jnp.arange(segk.shape[0], dtype=jnp.int32)), num_keys=1)
        vals = jnp.concatenate(
            [enc_latent + eps, jnp.ones((seg.shape[0], 1), jnp.float32)], 1)
        out = jax.ops.segment_sum(vals[order], s,
                                  num_segments=cfg.latent_capacity + 1,
                                  indices_are_sorted=True)
        return out[:cfg.latent_capacity]

    device_ms("  fusion via sort + sorted segment_sum", fusion_sorted)


if __name__ == "__main__":
    main()
