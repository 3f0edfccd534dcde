#!/usr/bin/env python3
"""Measure host-side dispatch cost of the per-frame loop: wall time of
dispatch-only (no sync) vs sync-bracketed windows.  If dispatch-only wall
per frame ~= synced wall per frame, the pipeline is HOST-bound (each
dispatch's RPC through the tunnel gates throughput, not device time).

    python tools/dispatch_probe.py [config-name.yaml]
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


def main():
    import jax

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    repo = Path(__file__).resolve().parent.parent
    data = repo / "output" / "lrkt_data" / "lr-kt"
    cfg = sys.argv[1] if len(sys.argv) > 1 else "fusion-lr-kt-fast.yaml"
    args = exp_util.parse_config_yaml(repo / "configs" / cfg)
    model, margs = load_model(repo / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    args.run_async = False
    tq = json.loads((data / "first_tq.json").read_text())
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    seq = ICLNUIMSequence(path=str(data), start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    frames = [next(seq) for _ in range(110)]
    for f in frames:
        f.rgb = jax.device_put(f.rgb)
        f.depth = jax.device_put(f.depth)

    pipe = FusionPipeline(model, args)
    for i in range(30):
        pipe.process_frame(frames[i], i)
    pipe.trajectory()

    # Dispatch-only wall: 40 frames, NO sync inside or after the loop.
    for trial in range(3):
        base = 30 + trial * 20
        t0 = time.perf_counter()
        for k in range(20):
            pipe.process_frame(frames[base + k], base + k)
        dt = (time.perf_counter() - t0) / 20
        print(f"dispatch-only wall/frame (20 frames): {dt * 1e3:7.2f} ms")
    t0 = time.perf_counter()
    pipe.trajectory()
    print(f"drain after dispatch-only: {(time.perf_counter() - t0) * 1e3:.0f} ms")

    # Synced window for comparison.
    t0 = time.perf_counter()
    for k in range(90, 110):
        pipe.process_frame(frames[k], k)
    pipe.trajectory()
    print(f"synced wall/frame (20 frames):        "
          f"{(time.perf_counter() - t0) / 20 * 1e3:7.2f} ms")

    # Raw dispatch floor: the smallest jitted program we have, called 100x.
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    tiny(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(100):
        x = tiny(x)
    dt = (time.perf_counter() - t0) / 100
    x.block_until_ready()
    print(f"tiny-jit dispatch wall/call:          {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
