#!/usr/bin/env python3
"""Worst-case GN cost: time the staged schedule with a perturbed initial
pose so every group runs its full iteration budget (the flagship bench's
sequence early-exits after ~12 iters; a hard real sequence would not).

    python tools/gn_cost.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.system.tracker import track_gauss_newton
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion
    from nerf_fusion_tpu.utils import se3_jax as sj

    args = exp_util.parse_config_yaml("configs/fusion-lr-kt-fast.yaml")
    model, margs = load_model(args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    tq = args.sequence_kwargs["first_tq"]
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])
    seq = ICLNUIMSequence(path="output/lrkt_data/lr-kt", first_tq=tq,
                          load_gt=True)
    pipe = FusionPipeline(model, args)
    frames = [next(seq) for _ in range(25)]
    for i, f in enumerate(frames):
        pipe.process_frame(f, i)
    pipe.trajectory()

    tr = pipe.tracker
    f = frames[-1]
    pre = tr.preprocess(f.rgb, f.depth, f.calib)
    lastR, lastt = tr.all_pd_pose[-1]
    k = tr.gn_point_budget

    def run(pert_deg, pert_t):
        """GN from a perturbed init; returns (time_ms_min, iters)."""
        ang = np.deg2rad(pert_deg)
        xi = jnp.asarray([pert_t, 0.0, 0.0, ang, 0.0, 0.0], jnp.float32)
        eR, et = sj.se3_exp(xi)

        def gn():
            dR, dt, iters = track_gauss_newton(
                pipe.map.state, pipe.map.cfg, pipe.map.model.decoder_params,
                pipe.map.model.decoder_config, tr.tcfg, tr.prev_pyr,
                pre.pyramid, pre.points[:k], pre.mask[:k], lastR, lastt,
                eR, et, f.calib.fx, f.calib.fy, f.calib.cx, f.calib.cy,
                tr.rgb_weight)
            return dt, iters

        out = gn()
        np.asarray(out[0])
        best = float("inf")
        iters = None
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                out = gn()
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / 3)
            iters = np.asarray(out[1])
        return best * 1e3, iters

    for deg, t in [(0.0, 0.0), (1.0, 0.01), (3.0, 0.03), (6.0, 0.08)]:
        ms, iters = run(deg, t)
        total = int(iters.sum())
        print(f"perturb {deg:3.1f}deg/{t*100:4.1f}cm: {ms:7.1f} ms, "
              f"iters {iters.tolist()} (total {total}, "
              f"{ms / max(total, 1):.2f} ms/iter)")


if __name__ == "__main__":
    main()
