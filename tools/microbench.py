#!/usr/bin/env python3
"""Component device-time microbench for the lr-kt flagship workload.

Protocol (round-3 recalibration): dispatch-burst timing still pays the
tunnel's per-sync roundtrip (~25-40 ms observed) amortized over the
burst, which inflated round-2 numbers by up to 4x.  Each op is now timed
INSIDE a dynamic-trip-count ``fori_loop``: successive iterations are
data-chained through a carried epsilon folded into a float input (no
cross-iteration overlap) and every output leaf is sum-reduced into the
carry (no DCE / slice narrowing), so ``(t[2K]-t[K])/K`` is pure device
time — the dispatch+sync constant cancels, min-over-repeats rejects
tunnel load spikes (MEMORY tpu-tunnel-perf-variance).

Host-involved transfers (H2D upload, triangle D2H) keep wall-clock
timing: the tunnel IS their cost.

    python tools/microbench.py [--json out.json]
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

RESULTS = {}


def wall_time(name, fn, repeats=6, burst=4):
    """Wall-clock of a host-involved op (transfers): burst + one sync."""
    import jax
    fn()  # compile/warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(burst):
            out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / burst)
    RESULTS[name] = best * 1e3
    print(f"{name:48s} {best * 1e3:9.2f} ms")
    return best


def device_time(name, make_fn, K=16, repeats=5):
    """True device ms/op of ``make_fn(eps) -> pytree``.

    ``eps`` (traced f32 scalar, ~1e-14) must be folded into a float
    input of the op so iteration i+1 depends on iteration i's outputs.
    """
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
            out = make_fn(acc)
            c = sum(leaf_contrib(l) for l in jax.tree_util.tree_leaves(out))
            return acc + jnp.clip(c * 1e-20, -1e-8, 1e-8)
        return jax.lax.fori_loop(0, k, body, eps0)

    np.asarray(run(1, np.float32(0.0)))  # compile + warm

    def timed(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(k, np.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (timed(2 * K) - timed(K)) / K * 1e3
    RESULTS[name] = ms
    print(f"{name:48s} {ms:9.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fusion-lr-kt-fast.yaml")
    ap.add_argument("--data", default="output/lrkt_data/lr-kt")
    ap.add_argument("--json", default=None)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.system import map as map_mod
    from nerf_fusion_tpu.system import mesher as mesher_mod
    from nerf_fusion_tpu.system.frontend import preprocess_frame
    from nerf_fusion_tpu.system.tracker import (fused_frame_step,
                                                track_gauss_newton)
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
    n_warm = 22
    frames = [next(seq) for _ in range(n_warm)]
    pipe = FusionPipeline(model, args)
    t0 = time.perf_counter()
    for i, f in enumerate(frames):
        pipe.process_frame(f, i)
    pipe.trajectory()
    print(f"warmup {n_warm} frames: {time.perf_counter() - t0:.1f} s")

    tr, f = pipe.tracker, frames[-1]
    calib = f.calib
    rgb_host, depth_host = np.asarray(f.rgb), np.asarray(f.depth)

    # H2D (the per-frame transfer the prefetch-upload thread hides)
    def h2d():
        return jax.device_put(rgb_host), jax.device_put(depth_host)

    wall_time("H2D rgb+depth (uint8+uint16, 1.5 MB)", h2d)

    rgb_dev, depth_dev = h2d()
    t = tr.tcfg
    dscale = float(getattr(calib, "dscale", 1.0))

    device_time(
        "preprocess_frame (device inputs)",
        lambda eps: preprocess_frame(
            rgb_dev, depth_dev, calib.fx + eps, calib.fy, calib.cx, calib.cy,
            0.5, 5.0, tr.point_budget, subsample=t.subsample,
            depth_scale=dscale,
            outlier_radius=t.outlier_radius, outlier_min_nb=t.outlier_min_nb,
            normal_radius=t.normal_radius, normal_min_nb=t.normal_min_nb,
            box_filter_size=t.box_filter_size,
            box_filter_exact=t.box_filter_exact))

    pre_full = tr.preprocess(rgb_dev, depth_dev, calib)
    lastR, lastt = tr.all_pd_pose[-1]
    k = tr.gn_point_budget

    device_time(
        "track_gauss_newton",
        lambda eps: track_gauss_newton(
            pipe.map.state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tr.tcfg, tr.prev_pyr,
            pre_full.pyramid, pre_full.points[:k], pre_full.mask[:k],
            lastR, lastt, jnp.eye(3), jnp.zeros(3),
            calib.fx + eps, calib.fy, calib.cx, calib.cy, tr.rgb_weight))

    device_time(
        "fused_frame_step (device frame)",
        lambda eps: fused_frame_step(
            pipe.map.state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tr.tcfg, tr.prev_pyr,
            rgb_dev, depth_dev,
            calib.fx + eps, calib.fy, calib.cx, calib.cy, 0.5, 5.0,
            tr.point_budget, tr.gn_point_budget, lastR, lastt,
            tr.rgb_weight, tr.n_unstable, tr._pose_log, tr._pose_count,
            depth_scale=dscale))

    pts, nrm, mask = tr.last_processed_pc
    pose = tr.all_pd_pose[-1]
    if hasattr(pose, "q"):
        pose_R = jnp.asarray(pose.q.rotation_matrix, jnp.float32)
        pose_t = jnp.asarray(pose.t, jnp.float32)
    else:
        pose_R, pose_t = pose
    vmap = pipe.map
    device_time(
        "integrate_keyframe",
        lambda eps: map_mod.integrate_keyframe(
            vmap.state, vmap.cfg, vmap.model.encoder_params,
            vmap.model.encoder_bn, vmap.model.encoder_config,
            jnp.asarray(pts, jnp.float32) + eps, jnp.asarray(nrm, jnp.float32),
            jnp.asarray(mask, bool), pose_R, pose_t))

    upd_all = jnp.ones((vmap.cfg.latent_capacity,), bool)
    r = int(args.resolution)
    reeval = max(1024, int(mesher_mod.MESH_CHUNK * (2 * r) ** 3
                           * pipe.mesher.reeval_fraction))

    # mirror the pipeline's actual extraction configuration (decode mode +
    # precision are config-driven; fast=True was the pre-round-3 default)
    mfast = pipe.mesh_fast
    mprec = pipe.mesher.decode_precision
    blend = pipe.mesher._get_blend(r, None)
    device_time(
        "fused_extract (cadence batch)",
        lambda eps: mesher_mod.fused_extract(
            vmap.state, upd_all, vmap.cfg, vmap.model.decoder_params,
            vmap.model.decoder_config, r, mfast, pipe.mesher.mesh_budget,
            pipe.mesher.fused_tri_budget, reeval, 0.15 + eps, mprec,
            blend=blend),
        K=8, repeats=4)

    res = mesher_mod.fused_extract(
        vmap.state, upd_all, vmap.cfg, vmap.model.decoder_params,
        vmap.model.decoder_config, r, mfast, pipe.mesher.mesh_budget,
        pipe.mesher.fused_tri_budget, reeval, 0.15, mprec, blend=blend)
    tri = res[0].vertices
    t0 = time.perf_counter()
    v = np.asarray(tri)
    dt = time.perf_counter() - t0
    RESULTS["triangle_d2h_MBps"] = v.nbytes / dt / 1e6
    print(f"triangle D2H {v.nbytes / 1e6:.1f} MB: {dt * 1e3:.0f} ms "
          f"({v.nbytes / dt / 1e6:.1f} MB/s)")

    steady = (RESULTS["fused_frame_step (device frame)"]
              + RESULTS["integrate_keyframe"] / 20.0
              + RESULTS["fused_extract (cadence batch)"] / 20.0)
    RESULTS["steady_state_ms_per_frame"] = steady
    print(f"\nsteady-state device time/frame: {steady:.1f} ms "
          f"-> {1e3 / steady:.1f} fps ceiling")
    if cli.json:
        Path(cli.json).write_text(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
