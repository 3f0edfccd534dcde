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


def test_box_filter_exact_zero_drop_and_full_cell_coverage():
    """The exact (sort-based) path keeps EVERY occupied cell: drop_frac is
    identically 0 and the output rows are the per-cell means (VERDICT r2
    item 7: `preprocess: {box_filter_exact: true}` evaluation path)."""
    rng = np.random.default_rng(2)
    n = 40000
    pts = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.05
    cap = 1 << 16

    out_p, out_n, mask, drop = imgproc.box_filter_points_exact(
        jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(valid),
        voxel_size=0.02, capacity=cap)
    assert float(drop) == 0.0
    mask = np.asarray(mask)
    n_out = int(mask.sum())

    gid, inb = _oracle_cells(pts, valid)
    uniq, inv = np.unique(gid[inb], return_inverse=True)
    assert n_out == len(uniq)              # every occupied cell survives

    # Each output row is its cell's mean, and the mean of a cell's points
    # lies inside that cell — recover the cell id from the row itself and
    # compare against the oracle mean for that exact cell.
    means = np.zeros((len(uniq), 3))
    cnts = np.zeros(len(uniq))
    np.add.at(means, inv, pts[inb])
    np.add.at(cnts, inv, 1.0)
    means /= cnts[:, None]
    by_gid = {g: m for g, m in zip(uniq, means)}
    got = np.asarray(out_p)[:n_out]
    got_gid, _ = _oracle_cells(got, np.ones(n_out, bool))
    assert set(got_gid) == set(uniq)       # cell sets identical
    for row, g in zip(got, got_gid):
        np.testing.assert_allclose(row, by_gid[g], atol=1e-4)

    # Output order must be a pseudo-random spatial shuffle, NOT a grid-id
    # slab: the GN stage consumes a prefix of these rows, so a sorted-gid
    # prefix would cover one corner of the frame.  A bijectively-mixed
    # order makes any prefix an unbiased spatial sample.
    frac_sorted = float(np.mean(np.diff(got_gid.astype(np.int64)) > 0))
    assert frac_sorted < 0.6               # ~0.5 for a shuffle, 1.0 for a slab


def test_box_filter_exact_in_preprocess_frame():
    """End-to-end: preprocess_frame(box_filter_exact=True) reports zero
    drop on a dense depth frame."""
    import jax
    from nerf_fusion_tpu.system.frontend import preprocess_frame

    rng = np.random.default_rng(3)
    H, W = 120, 160
    # smooth surface (gentle slope) so the outlier/normal gates pass
    # close plane: at 0.8 m the half-res pixel pitch (16 mm at fx=50) puts
    # >=16 neighbours inside the 5 cm outlier-gate radius
    v = np.arange(H, dtype=np.float32)[:, None]
    depth = np.broadcast_to(0.8 + 0.001 * v, (H, W)).astype(np.float32).copy()
    rgb = rng.uniform(size=(H, W, 3)).astype(np.float32)
    pre = preprocess_frame(jnp.asarray(rgb), jnp.asarray(depth),
                           100.0, 100.0, W / 2, H / 2, 0.5, 5.0, 8192,
                           subsample=0.5, box_filter_exact=True)
    assert float(jax.device_get(pre.drop_frac)) == 0.0
    assert int(np.asarray(pre.mask).sum()) > 100
