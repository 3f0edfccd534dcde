#!/usr/bin/env python3
"""Per-stage decomposition of the fused frame step at lr-kt-fast shapes.

Uses tools/microbench.py's device-loop protocol (epsilon-chained
fori_loop, (t[2K]-t[K])/K) for TRUE device times of each preprocess
sub-stage and each GN term.  GN terms are isolated with single-iteration
``TrackerConfig`` variants (static tcfg -> each variant is its own
compiled program; budget ~30 s of compiles on a warm cache).

    python tools/stage_bench.py [--json out.json]
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

from microbench import RESULTS, device_time  # noqa: E402


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
    from nerf_fusion_tpu.ops import imgproc
    from nerf_fusion_tpu.system.frontend import preprocess_frame
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.system.tracker import track_gauss_newton
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
    frames = [next(seq) for _ in range(12)]
    pipe = FusionPipeline(model, args)
    for i, f in enumerate(frames):
        pipe.process_frame(f, i)
    pipe.trajectory()

    tr, f = pipe.tracker, frames[-1]
    calib = f.calib
    rgb_dev = jax.device_put(np.asarray(f.rgb))
    depth_dev = jax.device_put(np.asarray(f.depth))
    t = tr.tcfg
    dscale = float(getattr(calib, "dscale", 1.0))
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy

    # ---- preprocess sub-stages ------------------------------------------
    # device-resident float inputs at the stage boundaries
    pre_full = tr.preprocess(rgb_dev, depth_dev, calib)
    rgbf = rgb_dev.astype(jnp.float32) / 255.0
    depthf = jnp.where(depth_dev == 0, jnp.nan,
                       depth_dev.astype(jnp.float32) / dscale)
    depthf = jnp.where((depthf < 0.5) | (depthf > 5.0), jnp.nan, depthf)
    intensity = jnp.mean(rgbf, axis=-1)
    d1 = imgproc.resize_half_nearest(depthf)
    pts0 = imgproc.unproject_depth(d1, fx * .5, fy * .5, cx * .5, cy * .5)
    valid = jnp.isfinite(d1)
    pts0 = jnp.where(valid[None], pts0, 0.0)
    nrm, nok = imgproc.estimate_normals_image(
        pts0, valid, radius=t.normal_radius, radius_px=3,
        min_neighbors=t.normal_min_nb)
    flat_p = pts0.reshape(3, -1).T
    flat_n = nrm.reshape(3, -1).T
    flat_v = (valid & nok).reshape(-1)
    flat_c = rgbf[::2, ::2].reshape(-1, 3)

    device_time("pre: raw->float + intensity + cut",
                lambda eps: (jnp.mean(rgb_dev.astype(jnp.float32) / 255.0,
                                      axis=-1) + eps,
                             jnp.where(depth_dev == 0, jnp.nan,
                                       depth_dev.astype(jnp.float32)
                                       / (dscale + eps))),
                K=32)

    def pyramid(eps):
        i0 = intensity + eps
        i1 = imgproc.resize_half_bilinear(i0)
        i2 = imgproc.resize_half_bilinear(i1)
        d0 = depthf + eps
        dd1 = imgproc.resize_half_nearest(d0)
        dd2 = imgproc.resize_half_nearest(dd1)
        return (i1, i2, dd1, dd2, imgproc.gradient_xy(i0),
                imgproc.gradient_xy(i1), imgproc.gradient_xy(i2))

    device_time("pre: pyramid (2 resizes x2 + 3 grads)", pyramid, K=32)
    device_time("pre: unproject 320x240",
                lambda eps: imgproc.unproject_depth(
                    d1, fx * .5 + eps, fy * .5, cx * .5, cy * .5), K=32)
    device_time("pre: radius_neighbor_count (7x7)",
                lambda eps: imgproc.radius_neighbor_count(
                    pts0 + eps, valid, radius=t.outlier_radius, radius_px=3),
                K=32)
    device_time("pre: estimate_normals_image (7x7)",
                lambda eps: imgproc.estimate_normals_image(
                    pts0 + eps, valid, radius=t.normal_radius, radius_px=3,
                    min_neighbors=t.normal_min_nb), K=32)
    device_time("pre: box_filter hash 2^20",
                lambda eps: imgproc.box_filter_points(
                    flat_p + eps, flat_n, flat_v,
                    voxel_size=t.box_filter_size,
                    capacity=tr.point_budget, colors=flat_c), K=16)
    device_time("pre: box_filter exact (sort)",
                lambda eps: imgproc.box_filter_points_exact(
                    flat_p + eps, flat_n, flat_v,
                    voxel_size=t.box_filter_size,
                    capacity=tr.point_budget, colors=flat_c), K=16)
    device_time("pre: flatten+transpose p/n planes",
                lambda eps: ((pts0 + eps).reshape(3, -1).T,
                             (nrm + eps).reshape(3, -1).T), K=32)
    device_time("pre: rgb [::2,::2] + reshape(-1,3)",
                lambda eps: (rgbf + eps)[::2, ::2].reshape(-1, 3), K=32)
    device_time("pre: WHOLE preprocess_frame",
                lambda eps: preprocess_frame(
                    rgb_dev, depth_dev, fx + eps, fy, cx, cy,
                    0.5, 5.0, tr.point_budget, subsample=t.subsample,
                    depth_scale=dscale,
                    outlier_radius=t.outlier_radius,
                    outlier_min_nb=t.outlier_min_nb,
                    normal_radius=t.normal_radius,
                    normal_min_nb=t.normal_min_nb,
                    box_filter_size=t.box_filter_size,
                    box_filter_exact=t.box_filter_exact), K=16)

    # ---- GN terms -------------------------------------------------------
    lastR, lastt = tr.all_pd_pose[-1]
    k = tr.gn_point_budget
    pts, mask = pre_full.points[:k], pre_full.mask[:k]

    def gn_with(tcfg_mod, name, K=16):
        device_time(name, lambda eps: track_gauss_newton(
            pipe.map.state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tcfg_mod, tr.prev_pyr,
            pre_full.pyramid, pts, mask, lastR, lastt,
            jnp.eye(3), jnp.zeros(3),
            fx + eps, fy, cx, cy, tr.rgb_weight), K=K)

    # Single-iteration groups isolate one term (while_loop runs build_Hg
    # twice for a 1-iter group: iterate + the worse-detection re-eval).
    base = t._replace(iter_config=((1, (("sdf",),)),))
    gn_with(base, "gn: 1-group sdf only (2 evals)")
    for lev in (0, 1, 2):
        gn_with(t._replace(iter_config=((1, (("rgb", lev),)),)),
                f"gn: 1-group rgb@{lev} only (2 evals)")
    gn_with(t._replace(iter_config=((10, (("rgb", 2),)),)),
            "gn: group1 rgb@2 x10 (full)")
    gn_with(t, "gn: FULL staged schedule", K=8)

    print()
    if cli.json:
        Path(cli.json).write_text(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
