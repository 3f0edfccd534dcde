"""Strided-decimation rewrites must match plain-slice semantics exactly.

The TPU-side spellings (one-hot lane-selection matmuls, stride folded
into the top-k mask) replace `[::s, ::s]` slices that force lane-dim
relayouts (tools/decimate_exp.py records the costs).  These tests pin
element-exact equivalence, NaN handling included, so layout-motivated
rewrites can never drift the math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_fusion_tpu.ops import imgproc


def test_resize_half_nearest_matches_slice_nan_aware():
    rng = np.random.default_rng(0)
    for H, W in ((480, 640), (121, 161), (8, 10)):
        d = (rng.random((H, W)) + 0.3).astype(np.float32)
        d[rng.random((H, W)) < 0.25] = np.nan
        out = np.asarray(imgproc.resize_half_nearest(jnp.asarray(d)))
        ref = d[::2, ::2]
        assert out.shape == ref.shape
        assert np.array_equal(np.nan_to_num(out, nan=-1.0),
                              np.nan_to_num(ref, nan=-1.0))


def test_lane_sel_einsum_matches_rgb_slice():
    rng = np.random.default_rng(1)
    rgb = rng.random((96, 130, 3)).astype(np.float32)
    for step in (2, 4):
        S = imgproc.lane_sel(rgb.shape[1], step, jnp.float32)
        out = np.asarray(jnp.einsum("hwc,wk->hkc", jnp.asarray(rgb)[::step],
                                    S, precision=jax.lax.Precision.HIGHEST))
        assert np.array_equal(out, rgb[::step, ::step])


def _odometry_inputs(rng, H, W):
    pi = rng.random((H, W)).astype(np.float32)
    pd = (rng.random((H, W)) + 0.5).astype(np.float32)
    pd[rng.random((H, W)) < 0.15] = np.nan
    ci = rng.random((H, W)).astype(np.float32)
    cd = (rng.random((H, W)) + 0.5).astype(np.float32)
    cd[rng.random((H, W)) < 0.15] = np.nan
    g = rng.normal(size=(2, H, W)).astype(np.float32)
    g[:, :1] = np.nan  # gradient border NaNs
    krkinv = (np.eye(3) + 0.01 * rng.normal(size=(3, 3))).astype(np.float32)
    kt = (0.05 * rng.normal(size=3)).astype(np.float32)
    return pi, pd, ci, cd, g, krkinv, kt


def test_rgb_odometry_strided_matches_stride1_restriction():
    """The matmul-decimated strided path must equal the stride-1 result
    restricted to the strided pixel grid (the semantics the old
    [::s, ::s]-slice implementation had)."""
    rng = np.random.default_rng(2)
    pi, pd, ci, cd, g, krkinv, kt = _odometry_inputs(rng, 120, 161)
    common = (jnp.asarray(pi), jnp.asarray(pd), jnp.asarray(ci),
              jnp.asarray(cd), jnp.asarray(g), 525.0, 525.0, 80.0, 60.0,
              jnp.asarray(krkinv), jnp.asarray(kt), 0.01, 0.2)
    f1, J1, ok1 = imgproc.rgb_odometry(*common, stride=1)
    for stride in (2, 3):
        f, J, ok = imgproc.rgb_odometry(*common, stride=stride)
        assert np.array_equal(np.asarray(ok),
                              np.asarray(ok1)[::stride, ::stride])
        assert np.array_equal(np.asarray(f),
                              np.asarray(f1)[::stride, ::stride])
        assert np.array_equal(np.asarray(J),
                              np.asarray(J1)[:, ::stride, ::stride])


def test_select_photometric_pixels_respects_stride_and_budget():
    rng = np.random.default_rng(3)
    H, W, k = 60, 81, 256
    inten = rng.random((H, W)).astype(np.float32)
    depth = (rng.random((H, W)) + 0.5).astype(np.float32)
    depth[rng.random((H, W)) < 0.1] = np.nan
    dIdxy = rng.normal(size=(2, H, W)).astype(np.float32)
    for stride in (1, 2):
        u, v, i1, d1, gx, gy, valid = imgproc.select_photometric_pixels(
            jnp.asarray(inten), jnp.asarray(depth), jnp.asarray(dIdxy),
            k, 0.0, stride=stride)
        u, v, valid = np.asarray(u), np.asarray(v), np.asarray(valid)
        # every valid pick sits on the stride grid with finite depth and
        # carries that pixel's exact channel values
        ui, vi = u[valid].astype(int), v[valid].astype(int)
        assert (ui % stride == 0).all() and (vi % stride == 0).all()
        assert np.array_equal(np.asarray(i1)[valid], inten[vi, ui])
        assert np.array_equal(np.asarray(d1)[valid], depth[vi, ui])
        assert np.isfinite(depth[vi, ui]).all()
        assert np.array_equal(np.asarray(gx)[valid], dIdxy[0, vi, ui])
        assert np.array_equal(np.asarray(gy)[valid], dIdxy[1, vi, ui])
        # the budget takes the k highest-gradient candidates: with k
        # less than the candidate count, the worst selected grad**2
        # must be >= the best unselected one
        g2 = dIdxy[0] ** 2 + dIdxy[1] ** 2
        cand = np.isfinite(depth)
        cand[np.arange(H) % stride != 0] = False
        cand[:, np.arange(W) % stride != 0] = False
        sel = np.zeros((H, W), bool)
        sel[vi, ui] = True
        assert valid.sum() == min(k, cand.sum())
        if valid.sum() == k:
            assert g2[sel].min() >= g2[cand & ~sel].max() - 1e-6
