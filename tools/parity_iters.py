#!/usr/bin/env python3
"""Where does the parity config's frame time go on REAL frames?

Mirrors bench.py's lr-kt protocol (pre-uploaded frames, warm cache),
then over the timed range records per-frame GN iterations-used per
group (device-collected, one D2H at the end) and a cadence-frame vs
tracking-frame wall split.  The round-4 profilers timed a REPEATED
converged frame, which exits the staged schedule immediately and hides
the dense level-0 cost entirely.

    python tools/parity_iters.py [config-name.yaml] [n_frames]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "fusion-lr-kt.yaml"
    n_run = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    os.environ.setdefault("BENCH_LRKT_CONFIG", cfg)

    import jax

    sys.path.insert(0, str(REPO))
    import bench
    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence

    tq = bench._ensure_lrkt_data()
    pipe, args = bench._build(REPO / "configs" / cfg, first_tq=tq)
    seq = ICLNUIMSequence(path=str(bench.LRKT_DATA), start_frame=0,
                          end_frame=-1, first_tq=tq, load_gt=True)
    n_warm = 30
    n_total = min(len(seq), n_warm + n_run)
    frames = [next(seq) for _ in range(n_total)]
    for f in frames:
        f.rgb = jax.device_put(f.rgb)
        f.depth = jax.device_put(f.depth)

    t0 = time.perf_counter()
    pipe.process_frame(frames[0], 0)
    pipe.trajectory()
    print(f"first frame {time.perf_counter() - t0:.1f} s")
    for i in range(1, n_warm):
        pipe.process_frame(frames[i], i)
    bench._sync_all(pipe)

    iters = []          # (frame_id, device (G,) iters-used)
    cad_wall, trk_wall = [], []
    i = n_warm
    while i + 20 <= n_total:
        t0 = time.perf_counter()
        pipe.process_frame(frames[i], i)    # cadence frame (i % 20 == 0)
        iters.append(pipe.tracker.last_iters)
        bench._sync_all(pipe)
        t1 = time.perf_counter()
        for j in range(i + 1, i + 20):
            pipe.process_frame(frames[j], j)
            iters.append(pipe.tracker.last_iters)
        bench._sync_all(pipe)
        t2 = time.perf_counter()
        cad_wall.append(t1 - t0)
        trk_wall.append((t2 - t1) / 19.0)
        i += 20

    it = np.asarray(jax.device_get(iters))          # (N, G)
    cad = np.asarray(cad_wall) * 1e3
    trk = np.asarray(trk_wall) * 1e3
    print(f"config: {cfg}  frames timed: {len(it)}")
    print(f"iters used per group: mean {it.mean(0).round(2)}  "
          f"p50 {np.percentile(it, 50, 0).round(1)}  "
          f"p90 {np.percentile(it, 90, 0).round(1)}  max {it.max(0)}")
    print(f"cadence frame wall (incl sync tail): med {np.median(cad):.1f} ms"
          f"  p90 {np.percentile(cad, 90):.1f}")
    print(f"tracking frame wall: med {np.median(trk):.2f} ms  "
          f"p90 {np.percentile(trk, 90):.2f}")
    # effective fps over whole timed range for cross-checking vs bench
    total = cad.sum() + 19.0 * trk.sum()
    print(f"effective fps (sync-split protocol): {20 * len(cad) / total * 1e3:.1f}")


if __name__ == "__main__":
    main()
