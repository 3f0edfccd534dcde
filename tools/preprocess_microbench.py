#!/usr/bin/env python3
"""Per-stage device timing of preprocess_frame at the flagship lr-kt shape.

Protocol (MEMORY tpu-tunnel-perf-variance): each op is dispatched in a
burst, then ONE 1-element D2H sync; time/burst_size amortizes the ~25 ms
tunnel roundtrip to ~1.6 ms at burst 16; min over repeats rejects tunnel
load spikes.

Usage: python tools/preprocess_microbench.py [reps] [burst]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from nerf_fusion_tpu.ops import imgproc  # noqa: E402
from nerf_fusion_tpu.system import frontend  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BURST = int(sys.argv[2]) if len(sys.argv) > 2 else 16

H, W = 480, 640
FX, FY, CX, CY = 481.2, 480.0, 319.5, 239.5
CAP = 16384
rng = np.random.default_rng(0)
depth_np = (1.5 + 0.8 * np.sin(np.linspace(0, 6, H))[:, None]
            + 0.3 * np.cos(np.linspace(0, 9, W))[None, :]).astype(np.float32)
depth_np[rng.random((H, W)) < 0.05] = np.nan
rgb_np = rng.random((H, W, 3), dtype=np.float32)

rgb = jax.device_put(jnp.asarray(rgb_np))
depth = jax.device_put(jnp.asarray(depth_np))


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(BURST):
            out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / BURST)
    print(f"{name:44s} {best*1e3:8.2f} ms")
    return best


# --- stage isolation (subsample 0.5 -> 320x240 point cloud) ---
intensity = jnp.mean(rgb, axis=-1)
d1 = depth[::2, ::2]
pts = imgproc.unproject_depth(d1, FX * .5, FY * .5, CX * .5, CY * .5)
valid = jnp.isfinite(d1)
pts0 = jnp.where(valid[None], pts, 0.0)
flat_p = pts0.reshape(3, -1).T
nrm = jnp.where(valid[None], pts0 / jnp.maximum(
    jnp.linalg.norm(pts0, axis=0, keepdims=True), 1e-6), 0.0)
flat_n = nrm.reshape(3, -1).T
flat_v = valid.reshape(-1)
flat_c = rgb[::2, ::2].reshape(-1, 3)

bench("noop (sync floor)", lambda d: d[0, 0] + 1.0, d1)
bench("resize_half_bilinear 640->320", imgproc.resize_half_bilinear,
      intensity)
bench("gradient_xy 640x480", imgproc.gradient_xy, intensity)
bench("pyramid only (3 lvl i/d/g)", lambda r, d: frontend.preprocess_frame(
    r, d, FX, FY, CX, CY, 0.1, 8.0, CAP).pyramid.gradient[2], rgb, depth)
bench("unproject 320x240", imgproc.unproject_depth, d1,
      FX * .5, FY * .5, CX * .5, CY * .5)
bench("radius_neighbor_count (7x7)", lambda p, v:
      imgproc.radius_neighbor_count(p, v, radius=0.05, radius_px=3), pts0, valid)
bench("estimate_normals_image (7x7)", lambda p, v:
      imgproc.estimate_normals_image(p, v, radius=0.1, radius_px=3,
                                     min_neighbors=5), pts0, valid)
bench("count+normals both", lambda p, v:
      imgproc.estimate_normals_image(p, v, radius=0.1, radius_px=3,
                                     min_neighbors=5)
      + (imgproc.radius_neighbor_count(p, v, radius=0.05, radius_px=3),),
      pts0, valid)
bench("box_filter_points (hash 2^20)", lambda p, n, v, c:
      imgproc.box_filter_points(p, n, v, voxel_size=0.02, capacity=CAP,
                                colors=c), flat_p, flat_n, flat_v, flat_c)
bench("box_filter_points_exact (sort)", lambda p, n, v, c:
      imgproc.box_filter_points_exact(p, n, v, voxel_size=0.02,
                                      capacity=CAP, colors=c),
      flat_p, flat_n, flat_v, flat_c)
bench("preprocess_frame WHOLE", lambda r, d: frontend.preprocess_frame(
    r, d, FX, FY, CX, CY, 0.1, 8.0, CAP).points, rgb, depth)
