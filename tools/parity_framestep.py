#!/usr/bin/env python3
"""Device-loop time of the PARITY fused_frame_step on a real in-motion
frame (microbench/gn_prof re-track an already-converged frame, which
early-exits the staged GN schedule and under-reports the dense cost).

Warm the pipeline to frame i-1, then time frame i's full step with the
device-loop protocol (identical inputs each trip -> identical iteration
counts as the real frame).

    python tools/parity_framestep.py [config-name.yaml] [frame_idx]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np

REPO = Path(__file__).resolve().parent.parent


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
    print(f"{name:55s} {ms:8.3f} ms")
    return ms


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "fusion-lr-kt.yaml"
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 57

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    import bench
    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.system.frontend import preprocess_frame
    from nerf_fusion_tpu.system.tracker import (fused_frame_step,
                                                track_gauss_newton)

    tq = bench._ensure_lrkt_data()
    pipe, args = bench._build(REPO / "configs" / cfg, first_tq=tq)
    seq = ICLNUIMSequence(path=str(bench.LRKT_DATA), start_frame=0,
                          end_frame=-1, first_tq=tq, load_gt=True)
    frames = [next(seq) for _ in range(idx + 1)]
    for f in frames:
        f.rgb = jax.device_put(f.rgb)
        f.depth = jax.device_put(f.depth)
    t0 = time.perf_counter()
    for i in range(idx):          # warm up to frame idx-1 inclusive
        pipe.process_frame(frames[i], i)
    pipe.trajectory()
    print(f"warm to frame {idx - 1}: {time.perf_counter() - t0:.1f} s")

    tr, f = pipe.tracker, frames[idx]
    calib = f.calib
    dscale = float(getattr(calib, "dscale", 1.0))
    lastR, lastt = tr.all_pd_pose[-1]
    state = pipe.map.state
    prev_pyr = tr.prev_pyr
    plog, pcnt = tr._pose_log, tr._pose_count

    step = device_ms(
        "fused_frame_step (REAL next frame, full parity)",
        lambda eps: fused_frame_step(
            state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tr.tcfg, prev_pyr,
            f.rgb, f.depth,
            calib.fx + eps, calib.fy, calib.cx, calib.cy, 0.5, 5.0,
            tr.point_budget, tr.gn_point_budget, lastR, lastt,
            tr.rgb_weight, tr.n_unstable, plog, pcnt,
            depth_scale=dscale)[:6])

    t = tr.tcfg
    pre = device_ms(
        "preprocess_frame only",
        lambda eps: preprocess_frame(
            f.rgb, f.depth, calib.fx + eps, calib.fy, calib.cx, calib.cy,
            0.5, 5.0, tr.point_budget, subsample=t.subsample,
            depth_scale=dscale,
            outlier_radius=t.outlier_radius, outlier_min_nb=t.outlier_min_nb,
            normal_radius=t.normal_radius, normal_min_nb=t.normal_min_nb,
            box_filter_size=t.box_filter_size,
            box_filter_exact=t.box_filter_exact))

    pre_full = tr.preprocess(f.rgb, f.depth, calib)
    k = tr.gn_point_budget
    gn = device_ms(
        "track_gauss_newton (REAL next frame)",
        lambda eps: track_gauss_newton(
            state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tr.tcfg, prev_pyr,
            pre_full.pyramid, pre_full.points[:k], pre_full.mask[:k],
            lastR, lastt, jnp.eye(3), jnp.zeros(3),
            calib.fx + eps, calib.fy, calib.cx, calib.cy, tr.rgb_weight))

    _, _, iters = track_gauss_newton(
        state, pipe.map.cfg, pipe.map.model.decoder_params,
        pipe.map.model.decoder_config, tr.tcfg, prev_pyr,
        pre_full.pyramid, pre_full.points[:k], pre_full.mask[:k],
        lastR, lastt, jnp.eye(3), jnp.zeros(3),
        calib.fx, calib.fy, calib.cx, calib.cy, tr.rgb_weight)
    print("iters used:", np.asarray(iters))
    print(f"frame-step overhead vs pre+gn: {step - pre - gn:.2f} ms")


if __name__ == "__main__":
    main()
