"""Per-frame RGB-D preprocessing: one jitted program from images to
oriented, outlier-filtered, voxel-downsampled points + image pyramids.

Replaces the reference's preprocessing chain (system/tracker.py:42-57,
75-120: CUDA pyramid/gradients, unproject, KD-tree radius outlier, KD-tree
PCA normals, torch_scatter box filter) with image-space stencil kernels and
fixed-capacity compaction — a single device program, one H2D copy per
frame, no KD-trees (SURVEY.md §7.1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import imgproc


class Pyramid(NamedTuple):
    intensity: tuple   # 3 levels (H, W)
    depth: tuple       # 3 levels
    gradient: tuple    # 3 levels (H, W, 2)


class Preprocessed(NamedTuple):
    pyramid: Pyramid
    points: jnp.ndarray    # (M, 3) camera-frame surface points
    normals: jnp.ndarray   # (M, 3) camera-frame normals
    colors: jnp.ndarray    # (M, 3) mean rgb per box cell (tracker.py:118
                           # last_colored_pcd parity, for texture export)
    mask: jnp.ndarray      # (M,) bool
    drop_frac: jnp.ndarray # () fraction of points lost to box-filter hash
                           # collisions (quality signal; bench gates on it)


@functools.partial(jax.jit, static_argnames=(
    "point_budget", "subsample", "outlier_radius", "outlier_min_nb",
    "normal_radius", "normal_min_nb", "box_filter_size", "box_filter_exact"))
def preprocess_frame(rgb, depth, fx, fy, cx, cy,
                     depth_cut_min, depth_cut_max, point_budget: int,
                     subsample: float = 0.5, depth_scale=1.0,
                     outlier_radius: float = 0.05, outlier_min_nb: int = 16,
                     normal_radius: float = 0.1, normal_min_nb: int = 5,
                     box_filter_size: float = 0.02,
                     box_filter_exact: bool = True):
    """rgb (H,W,3), depth (H,W) -> Preprocessed.

    ``rgb`` may be float32 in [0,1] or raw uint8; ``depth`` float32 metres
    (NaN = invalid) or raw uint16 counts with ``depth_scale`` counts/metre
    (0 = invalid).  Raw frames convert ON DEVICE: sensor/PNG data crosses
    host->device at native width (1.8 MB vs 4.9 MB per 640x480 frame),
    which matters on PCIe and dominates on thinner links.

    ``subsample`` is the tracking config's ``sdf.subsample`` depth scale
    (0.5 in fusion-lr-kt.yaml, 1.0 in train_scannet.yaml).  The metric
    thresholds default to the reference's hardcoded values (outliers: >=16
    neighbours within 5 cm, tracker.py:109; normals: 10 cm window >= 5,
    tracker.py:112; box filter 2 cm, tracker.py:119) — tuned for VGA-class
    depth.  At much coarser pixel pitch (e.g. 80x60, where neighbouring
    rays are >5 cm apart beyond ~1.5 m) the outlier gate starves; such
    sensors configure the tracking ``preprocess:`` block instead.
    """
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) / 255.0
    if depth.dtype != jnp.float32:
        depth = jnp.where(depth == 0, jnp.nan,
                          depth.astype(jnp.float32) / depth_scale)
    intensity = jnp.mean(rgb, axis=-1)
    depth = jnp.where((depth < depth_cut_min) | (depth > depth_cut_max),
                      jnp.nan, depth)

    i0 = intensity
    i1 = imgproc.resize_half_bilinear(i0)
    i2 = imgproc.resize_half_bilinear(i1)
    d0 = depth
    d1 = imgproc.resize_half_nearest(d0)
    d2 = imgproc.resize_half_nearest(d1)
    g0 = imgproc.gradient_xy(i0)
    g1 = imgproc.gradient_xy(i1)
    g2 = imgproc.gradient_xy(i2)
    pyr = Pyramid((i0, i1, i2), (d0, d1, d2), (g0, g1, g2))

    # Point-cloud path at `subsample` scale (tracker.py:91-98).
    # Plane-major (3, H, W).
    assert subsample in (1.0, 0.5, 0.25), "supported depth subsample scales"
    if subsample == 1.0:
        pc_depth = d0
    elif subsample == 0.5:
        pc_depth = d1
    else:
        pc_depth = d2
    s = subsample
    pts = imgproc.unproject_depth(pc_depth, fx * s, fy * s, cx * s, cy * s)
    valid = jnp.isfinite(pc_depth)
    pts0 = jnp.where(valid[None], pts, 0.0)

    # Radius outlier removal (reference default: >=16 within 5 cm,
    # tracker.py:109).
    ncount = imgproc.radius_neighbor_count(pts0, valid,
                                           radius=outlier_radius, radius_px=3)
    valid = valid & (ncount >= outlier_min_nb)

    # Windowed-PCA normals, camera-facing (tracker.py:112).
    normals, nvalid = imgproc.estimate_normals_image(
        pts0, valid, radius=normal_radius, radius_px=3,
        min_neighbors=normal_min_nb)
    valid = valid & nvalid

    # Box-filter downsample into the fixed budget (tracker.py:119).
    flat_p = pts0.reshape(3, -1).T
    flat_n = normals.reshape(3, -1).T
    flat_v = valid.reshape(-1)
    # rgb at the point-cloud scale for the colored-cloud output.  The W
    # decimation is a one-hot einsum on the MXU: a `[::2, ::2]` slice of
    # the (H, W, 3) image relayouts (~0.54 ms vs 0.06 on a v5e at
    # 640x480, tools/decimate_exp.py); rgb is finite by construction so
    # no NaN-smear guard is needed.
    if subsample == 1.0:
        rgb_pc = rgb
    else:
        step = 2 if subsample == 0.5 else 4
        rgb_pc = jnp.einsum("hwc,wk->hkc", rgb[::step],
                            imgproc.lane_sel(rgb.shape[1], step, rgb.dtype),
                            precision=jax.lax.Precision.HIGHEST)
    flat_c = rgb_pc.reshape(-1, 3)
    box_fn = (imgproc.box_filter_points_exact if box_filter_exact
              else imgproc.box_filter_points)
    bp, bn, bc, bm, drop = box_fn(
        flat_p, flat_n, flat_v, voxel_size=box_filter_size,
        capacity=point_budget, colors=flat_c)
    return Preprocessed(pyr, bp, bn, bc, bm, drop)
