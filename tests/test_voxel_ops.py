"""Voxel-op tests against numpy oracles."""

import jax.numpy as jnp
import numpy as np

from nerf_fusion_tpu.ops import voxel as vox


def test_linearize_roundtrip():
    n_xyz = (7, 5, 9)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(np.stack([rng.randint(0, n, 100) for n in n_xyz], axis=1))
    flat = vox.linearize_id(xyz, n_xyz)
    assert np.all(np.asarray(vox.unlinearize_id(flat, n_xyz)) == np.asarray(xyz))
    assert int(jnp.max(flat)) < 7 * 5 * 9


def test_world_to_grid_convention():
    # Reference convention: voxel i owns (i, i+1] after normalisation.
    bound_min = jnp.asarray([0.0, 0.0, 0.0])
    xyz = jnp.asarray([[0.05, 0.15, 0.1], [0.1, 0.2, 0.05]])
    norm, grid = vox.world_to_grid(xyz, bound_min, 0.1)
    assert np.all(np.asarray(grid[0]) == [0, 1, 0])
    # exactly on a boundary: ceil(1.0)-1 = 0
    assert np.all(np.asarray(grid[1]) == [0, 1, 0])


def test_occurrence_count():
    ids = jnp.asarray([3, 1, 3, 3, 2, 1, 9])
    valid = jnp.asarray([True, True, True, True, True, True, False])
    c = np.asarray(vox.occurrence_count(ids, valid))
    assert list(c) == [3, 2, 3, 3, 1, 2, 0]


def test_masked_unique():
    ids = jnp.asarray([5, 3, 5, 7, 3, 11])
    valid = jnp.asarray([True, True, True, True, True, False])
    u, uvalid, n, ovf = vox.masked_unique(ids, valid, 8)
    assert int(n) == 3 and not bool(ovf)
    assert sorted(np.asarray(u)[np.asarray(uvalid)].tolist()) == [3, 5, 7]


def test_masked_unique_overflow():
    ids = jnp.arange(10)
    valid = jnp.ones(10, bool)
    u, uvalid, n, ovf = vox.masked_unique(ids, valid, 4)
    assert bool(ovf) and int(n) == 4


def test_compact_by_mask():
    vals = jnp.asarray([10.0, 20.0, 30.0, 40.0])
    mask = jnp.asarray([True, False, True, True])
    out, ovalid, n = vox.compact_by_mask(vals, mask, 8)
    assert int(n) == 3
    assert np.asarray(out)[:3].tolist() == [10.0, 30.0, 40.0]


def test_masked_segment_sum_matches_numpy():
    rng = np.random.RandomState(1)
    vals = rng.randn(100, 4).astype(np.float32)
    seg = rng.randint(0, 10, 100)
    valid = rng.rand(100) > 0.3
    out = np.asarray(vox.masked_segment_sum(
        jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(valid), 10))
    expect = np.zeros((10, 4), np.float32)
    for v, s, m in zip(vals, seg, valid):
        if m:
            expect[s] += v
    assert np.allclose(out, expect, atol=1e-5)


def test_masked_segment_max_matches_numpy():
    rng = np.random.RandomState(2)
    vals = rng.randn(100, 4).astype(np.float32)
    seg = rng.randint(0, 10, 100)
    valid = rng.rand(100) > 0.3
    out = np.asarray(vox.masked_segment_max(
        jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(valid), 10,
        fill_value=0.0))
    expect = np.zeros((10, 4), np.float32)
    hit = np.zeros(10, bool)
    for v, s, m in zip(vals, seg, valid):
        if m:
            expect[s] = np.maximum(expect[s], v) if hit[s] else v
            hit[s] = True
    assert np.allclose(out, expect, atol=1e-6)


def test_expand_neighbors6():
    n_xyz = (4, 4, 4)
    center = vox.linearize_id(jnp.asarray([[1, 1, 1]]), n_xyz)
    ids, valid = vox.expand_neighbors6(center, jnp.ones(1, bool), n_xyz)
    got = sorted(np.asarray(ids).tolist())
    xyz = np.asarray([[1, 1, 1], [0, 1, 1], [2, 1, 1], [1, 0, 1], [1, 2, 1],
                      [1, 1, 0], [1, 1, 2]])
    expect = sorted(((xyz[:, 0] * 4 + xyz[:, 1]) * 4 + xyz[:, 2]).tolist())
    assert got == expect


def test_expand_neighbors6_clamps_at_bounds():
    n_xyz = (4, 4, 4)
    corner = vox.linearize_id(jnp.asarray([[0, 0, 0]]), n_xyz)
    ids, valid = vox.expand_neighbors6(corner, jnp.ones(1, bool), n_xyz)
    assert np.all(np.asarray(ids) >= 0)


def test_occurrence_count_empty():
    import jax.numpy as jnp

    import numpy as np

    from nerf_fusion_tpu.ops import voxel as vox

    c = vox.occurrence_count(jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))
    assert np.asarray(c).shape == (0,)
