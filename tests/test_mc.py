"""Marching-cubes tests: table properties, watertightness, orientation, sphere metrics."""

import numpy as np

from nerf_fusion_tpu.ops.marching_cubes import dense_marching_cubes
from nerf_fusion_tpu.ops.mc_tables import (EDGE_TABLE, MAX_TRIS_PER_CELL,
                                           TRI_COUNT, TRI_TABLE)


def _edge_multiset(tris, decimals=6):
    """Count directed edges; watertight+consistent => each undirected edge
    appears exactly twice, once per direction."""
    directed = {}
    for tri in tris.round(decimals):
        for i in range(3):
            a, b = tuple(tri[i]), tuple(tri[(i + 1) % 3])
            directed[(a, b)] = directed.get((a, b), 0) + 1
    return directed


def test_table_basic_properties():
    assert EDGE_TABLE[0] == 0 and EDGE_TABLE[255] == 0
    assert TRI_COUNT[0] == 0 and TRI_COUNT[255] == 0
    assert MAX_TRIS_PER_CELL == 5
    # complement symmetry of the edge table (cut edges identical)
    for c in range(256):
        assert EDGE_TABLE[c] == EDGE_TABLE[255 - c]
    # every triangle uses cut edges only
    for c in range(256):
        row = TRI_TABLE[c]
        for e in row[row >= 0]:
            assert EDGE_TABLE[c] & (1 << int(e))


def test_sphere_mesh_watertight_and_oriented():
    n = 24
    g = np.linspace(-1.2, 1.2, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    field = np.sqrt(X**2 + Y**2 + Z**2) - 0.9
    spacing = g[1] - g[0]
    tris = dense_marching_cubes(field, origin=(-1.2, -1.2, -1.2), spacing=spacing)
    assert len(tris) > 100

    # watertight: every directed edge has its reverse exactly once
    directed = _edge_multiset(tris)
    for (a, b), cnt in directed.items():
        assert cnt == 1, "duplicate directed edge => inconsistent winding"
        assert directed.get((b, a), 0) == 1, "boundary edge => hole"

    # outward orientation: normals point away from the centre
    ctr = tris.mean(axis=1)
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    dots = np.einsum("ij,ij->i", nrm, ctr)
    assert (dots > 0).mean() > 0.999

    # geometry: area ~ 4*pi*r^2, volume ~ 4/3*pi*r^3 (within discretisation)
    area = 0.5 * np.linalg.norm(nrm, axis=1).sum()
    vol = np.einsum("ij,ij->i", ctr, nrm).sum() / 6.0
    assert abs(area / (4 * np.pi * 0.81) - 1) < 0.05
    assert abs(vol / (4 / 3 * np.pi * 0.9**3) - 1) < 0.05


def test_random_fields_watertight():
    rng = np.random.RandomState(0)
    for trial in range(3):
        # smooth random field via low-freq cosines
        n = 10
        g = np.linspace(0, 1, n)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        field = np.zeros_like(X)
        for _ in range(4):
            k = rng.randn(3) * 3
            field += rng.randn() * np.cos(k[0] * X + k[1] * Y + k[2] * Z + rng.rand())
        tris = dense_marching_cubes(field)
        if len(tris) == 0:
            continue
        directed = _edge_multiset(tris)
        # interior edges must pair; boundary-of-grid edges may not
        interior_unpaired = 0
        for (a, b), cnt in directed.items():
            assert cnt == 1
            if directed.get((b, a), 0) != 1:
                # allowed only on the outer boundary of the sampled grid
                on_bound = any(abs(c - lim) < 1e-9 for p in (a, b) for c, lim in
                               zip(p, [0, 0, 0])) or \
                           any(abs(c - (n - 1)) < 1e-9 for p in (a, b) for c in p)
                if not on_bound:
                    interior_unpaired += 1
        assert interior_unpaired == 0


def test_blend_operands_match_constants():
    """marching_cubes_sparse(blend=operands) is identical to the baked-
    constant path (large r passes the blend matrices as runtime operands
    because their serialized size grows as r^6 — mesher._get_blend)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_fusion_tpu.ops import marching_cubes as mc

    B, r = 8, 3
    n_xyz = (8, 8, 8)
    rng = np.random.default_rng(3)
    ids = rng.choice(np.prod(n_xyz), B, replace=False).astype(np.int32)
    indexer = np.full((int(np.prod(n_xyz)),), -1, np.int32)
    indexer[ids] = np.arange(B)
    batch_map = np.full((64,), -1, np.int32)
    batch_map[:B] = np.arange(B)
    S = 2 * r
    g = np.linspace(-0.5, 0.5, S, dtype=np.float32)
    sdf = jnp.asarray(g[None, :, None, None]
                      + rng.normal(0, 0.05, (B, S, S, S)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.02, 0.1, (B, S, S, S)).astype(np.float32))
    args = (jnp.asarray(indexer), jnp.asarray(batch_map), jnp.asarray(ids),
            jnp.ones((B,), bool), sdf, std, n_xyz, 0.1,
            jnp.zeros((3,), jnp.float32), r, 64, 0.2, 4096)
    a = mc.marching_cubes_sparse(*args)
    b = mc.marching_cubes_sparse(
        *args, blend=jax.device_put(mc.blend_operands(r)))
    assert int(a.n_triangles) == int(b.n_triangles) > 0
    np.testing.assert_array_equal(np.asarray(a.vertices), np.asarray(b.vertices))
    np.testing.assert_array_equal(np.asarray(a.vertex_std), np.asarray(b.vertex_std))
