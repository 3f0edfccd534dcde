#!/usr/bin/env python3
"""Per-op device-time profile of the flagship lr-kt workload.

Times each pipeline component with a real D2H sync (np.asarray of one
output element) so the numbers survive tunnel wall-clock variance
(see MEMORY: trust per-op syncs, not aggregate walls).

    python tools/profile_lrkt.py [--frames 8]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def sync(x):
    import jax
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        if hasattr(l, "block_until_ready"):
            l.block_until_ready()
    # block_until_ready lies through the tunnel: force one element D2H
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def timeit(name, fn, n=5):
    fn()  # warm (compile)
    sync_out = None
    t0 = time.perf_counter()
    for _ in range(n):
        sync_out = fn()
    sync(sync_out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fusion-lr-kt-fast.yaml")
    ap.add_argument("--data", default="output/lrkt_data/lr-kt")
    ap.add_argument("--frames", type=int, default=25)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.system import mesher as mesher_mod
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    print("device:", jax.devices()[0])
    args = exp_util.parse_config_yaml(Path(args_cli.config))
    model, margs = load_model(args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    tq = args.sequence_kwargs["first_tq"]
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    seq = ICLNUIMSequence(path=args_cli.data, start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    frames = [next(seq) for _ in range(args_cli.frames)]
    pipe = FusionPipeline(model, args)

    # ---- pipeline warm-up over real frames (fills map + compiles) --------
    t0 = time.perf_counter()
    for i, f in enumerate(frames):
        pipe.process_frame(f, i)
    pipe.trajectory()
    sync(pipe.mesher.current_mesh() if pipe.mesher.vertices is not None else 0)
    print(f"warmup {len(frames)} frames (incl. compiles): "
          f"{time.perf_counter() - t0:.1f} s")

    tr = pipe.tracker
    f = frames[-1]
    calib = f.calib

    # ---- track: the fused one-program-per-frame step ---------------------
    from nerf_fusion_tpu.system.tracker import fused_frame_step

    def run_track():
        (pre, pose_R, pose_t, rgbw, nuns, iters, plog, pcnt) = fused_frame_step(
            pipe.map.state, pipe.map.cfg,
            pipe.map.model.decoder_params, pipe.map.model.decoder_config,
            tr.tcfg, tr.prev_pyr, jnp.asarray(f.rgb), jnp.asarray(f.depth),
            calib.fx, calib.fy, calib.cx, calib.cy, 0.5, 5.0,
            tr.point_budget, tr.gn_point_budget,
            tr.all_pd_pose[-1][0], tr.all_pd_pose[-1][1],
            tr.rgb_weight, tr.n_unstable,
            tr._pose_log, tr._pose_count)
        tr._pose_log = plog  # donated
        return pose_t

    timeit("fused_frame_step (track, full frame)", run_track)

    # ---- preprocess alone ------------------------------------------------
    timeit("preprocess_frame",
           lambda: sync(tr.preprocess(f.rgb, f.depth, calib))[0])

    # ---- GN schedule alone (preprocessed inputs) -------------------------
    from nerf_fusion_tpu.system.tracker import track_gauss_newton
    pre = tr.preprocess(f.rgb, f.depth, calib)
    lastR, lastt = tr.all_pd_pose[-1]
    k = tr.gn_point_budget

    def run_gn():
        dR, dt, iters = track_gauss_newton(
            pipe.map.state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tr.tcfg, tr.prev_pyr, pre.pyramid,
            pre.points[:k], pre.mask[:k], lastR, lastt,
            jnp.eye(3), jnp.zeros(3),
            calib.fx, calib.fy, calib.cx, calib.cy, tr.rgb_weight)
        return dt, iters

    out = run_gn()
    timeit("track_gauss_newton (staged schedule)", lambda: run_gn()[0])
    print("   iters used per group:", np.asarray(sync(out[1])))

    # ---- integrate -------------------------------------------------------
    pts, nrm, mask = tr.last_processed_pc
    pose = tr.all_pd_pose[-1]

    def run_integrate():
        pipe.map.integrate_keyframe(pts, nrm, valid=mask, pose=pose)
        return pipe.map.state.n_occupied

    timeit("integrate_keyframe", run_integrate)

    # ---- fused_extract at the lr-kt budgets ------------------------------
    vmap = pipe.map
    upd_all = jnp.ones((vmap.cfg.latent_capacity,), bool)
    r = int(args.resolution)
    reeval = max(1024, int(mesher_mod.MESH_CHUNK * (2 * r) ** 3
                           * pipe.mesher.reeval_fraction))

    def run_extract():
        res = mesher_mod.fused_extract(
            vmap.state, upd_all, vmap.cfg, vmap.model.decoder_params,
            vmap.model.decoder_config, r, True,
            pipe.mesher.mesh_budget, pipe.mesher.fused_tri_budget,
            reeval, 0.15)
        return res[0].n_triangles

    timeit(f"fused_extract (budget={pipe.mesher.mesh_budget}, "
           f"tri={pipe.mesher.fused_tri_budget}, reeval={reeval})",
           run_extract, n=3)

    n_occ = int(np.asarray(vmap.state.n_occupied))
    print(f"map occupancy: {n_occ} voxels "
          f"(drain rounds/extract ~ {n_occ / pipe.mesher.mesh_budget:.1f})")

    # ---- triangle D2H cost ----------------------------------------------
    res = mesher_mod.fused_extract(
        vmap.state, upd_all, vmap.cfg, vmap.model.decoder_params,
        vmap.model.decoder_config, r, True, pipe.mesher.mesh_budget,
        pipe.mesher.fused_tri_budget, reeval, 0.15)
    tri = res[0].vertices

    def fetch():
        return np.asarray(tri)

    t0 = time.perf_counter()
    v = fetch()
    dt = time.perf_counter() - t0
    print(f"triangle D2H {v.nbytes / 1e6:.1f} MB: {dt * 1e3:.0f} ms "
          f"({v.nbytes / dt / 1e6:.1f} MB/s)")


if __name__ == "__main__":
    main()
