"""Oracle test for the fixed-capacity voxel-grid box filter.

The op replaces the reference's torch_scatter voxel mean
(system/tracker.py:14-24) with a hash-table ownership pass + fused
scatter-add (ops/imgproc.py).  The oracle recomputes per-cell means in
numpy from the op's own cell assignment rule and checks every surviving
output row bit-matches its cell's mean.
"""

import numpy as np
import jax.numpy as jnp

from nerf_fusion_tpu.ops import imgproc


def _oracle_cells(pts, valid, voxel_size=0.02, extent=8.0):
    grid = np.floor((pts + extent) / voxel_size).astype(np.int64)
    n_cells = int(2 * extent / voxel_size)
    inb = np.all((grid >= 0) & (grid < n_cells), axis=-1) & valid
    gid = (grid[:, 0] * n_cells + grid[:, 1]) * n_cells + grid[:, 2]
    return gid, inb


def test_box_filter_matches_percell_mean_oracle():
    rng = np.random.default_rng(0)
    n = 20000
    pts = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    cap = 32768

    out_p, out_n, out_c, mask, drop = imgproc.box_filter_points(
        jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(valid),
        voxel_size=0.02, capacity=cap, colors=jnp.asarray(colors))
    out_p, out_n, out_c = map(np.asarray, (out_p, out_n, out_c))
    mask = np.asarray(mask)
    n_out = int(mask.sum())
    assert n_out > 100
    assert not mask[n_out:].any()          # mask is a prefix

    gid, inb = _oracle_cells(pts, valid)
    # Per-cell means over kept (non-collision-dropped) cells.
    means = {}
    for g in np.unique(gid[inb]):
        sel = inb & (gid == g)
        means[g] = (pts[sel].mean(0), normals[sel], colors[sel].mean(0))

    # Every surviving output row must match SOME oracle cell's mean
    # position/color exactly (fp-accumulation tolerance) and its normal
    # must be the normalised mean of that cell's normals.
    kd = {tuple(np.round(v[0] / 1e-4).astype(np.int64)): g
          for g, v in means.items()}
    matched = 0
    for i in range(n_out):
        key = tuple(np.round(out_p[i] / 1e-4).astype(np.int64))
        g = kd.get(key)
        if g is None:
            continue
        mp, mns, mc = means[g]
        np.testing.assert_allclose(out_p[i], mp, atol=1e-5)
        np.testing.assert_allclose(out_c[i], mc, atol=1e-5)
        mn = mns.mean(0)
        mn = mn / max(np.linalg.norm(mn), 1e-12)
        np.testing.assert_allclose(out_n[i], mn, atol=1e-4)
        matched += 1
    assert matched > 0.95 * n_out  # rounding-key misses only

    # Drop accounting: surviving cells + collision-dropped cells == all cells
    # (no capacity truncation in this sized problem).
    assert float(drop) < 0.2
    n_cells_total = len(means)
    assert n_out <= n_cells_total
    assert n_out >= (1.0 - float(drop)) * n_cells_total - 2


def test_box_filter_exactness_when_collision_free():
    """A small widely-spaced set has no hash collisions: zero drops and
    exactly one output per occupied cell."""
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.0],
                    [0.001, 0.001, 0.0], [2.0, 2.0, 2.0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1.0]], np.float32), (5, 1))
    valid = np.ones(5, bool)
    out_p, out_n, mask, drop = imgproc.box_filter_points(
        jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(valid),
        voxel_size=0.02, capacity=16)
    assert float(drop) == 0.0
    assert int(np.asarray(mask).sum()) == 4     # two points share one cell
    got = np.asarray(out_p)[np.asarray(mask)]
    merged = pts[[0, 3]].mean(0)
    assert any(np.allclose(r, merged, atol=1e-6) for r in got)


def test_box_filter_capacity_truncation_masks_only():
    """More cells than capacity: output is full, mask all true, no crash."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (4096, 3)).astype(np.float32)  # ~1 cell/point
    normals = np.tile(np.array([[0, 0, 1.0]], np.float32), (4096, 1))
    valid = np.ones(4096, bool)
    out_p, out_n, mask, drop = imgproc.box_filter_points(
        jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(valid),
        voxel_size=0.02, capacity=256)
    assert int(np.asarray(mask).sum()) == 256
    assert np.isfinite(np.asarray(out_p)).all()
