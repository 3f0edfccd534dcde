#!/usr/bin/env python3
"""Split track_gauss_newton's device time by term and budget.

Times the full staged schedule, then single-group variants (rgb-only per
level, sdf-only) and sparse pixel-budget settings, using real lr-kt state
after 42 warm frames.

    python tools/gn_prof.py [config-name.yaml]   # default fusion-lr-kt-fast
"""

import dataclasses
import json
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
    import copy

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.system.tracker import track_gauss_newton
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    repo = Path(__file__).resolve().parent.parent
    data = repo / "output" / "lrkt_data" / "lr-kt"
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "fusion-lr-kt-fast.yaml"
    args = exp_util.parse_config_yaml(repo / "configs" / cfg_name)
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

    tr = pipe.tracker
    f = seq[41] if hasattr(seq, "__getitem__") else None
    frame = next(seq)
    rgb_dev, depth_dev = jax.device_put(np.asarray(frame.rgb)), \
        jax.device_put(np.asarray(frame.depth))
    calib = frame.calib
    pre = tr.preprocess(rgb_dev, depth_dev, calib)
    lastR, lastt = tr.all_pd_pose[-1]
    k = tr.gn_point_budget

    def run_cfg(tcfg):
        return lambda eps: track_gauss_newton(
            pipe.map.state, pipe.map.cfg, pipe.map.model.decoder_params,
            pipe.map.model.decoder_config, tcfg, tr.prev_pyr,
            pre.pyramid, pre.points[:k], pre.mask[:k],
            lastR, lastt, jnp.eye(3), jnp.zeros(3),
            calib.fx + eps, calib.fy, calib.cx, calib.cy, tr.rgb_weight)

    base = tr.tcfg
    device_ms("full staged schedule (10/10/50)", run_cfg(base))

    # iter_config entries are (n, (terms...)) with terms like ('sdf',)
    # or ('rgb', level) — mirror TrackerConfig.from_args' frozen format.
    variants = {
        "rgb level2 x10 only": ((10, (("rgb", 2),)),),
        "rgb level1 x10 only": ((10, (("rgb", 1),)),),
        "rgb level0 x10 only": ((10, (("rgb", 0),)),),
        "sdf x10 only": ((10, (("sdf",),)),),
        "sdf+rgb0 x10": ((10, (("sdf",), ("rgb", 0))),),
    }
    print("base iter_config:", base.iter_config)
    for name, ic in variants.items():
        device_ms(name, run_cfg(base._replace(iter_config=ic)))

    for budget in (24576, 16384, 8192):
        device_ms(f"full schedule @ pixel_budget={budget}",
                  run_cfg(base._replace(rgb_pixel_budget=budget)))


if __name__ == "__main__":
    main()
