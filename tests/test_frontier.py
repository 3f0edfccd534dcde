"""Marching-cubes frontier semantics (mc_interp_kernel.cu:101-185 parity).

Two behaviours are pinned:

1. The dominant-source (``zero_det``) NaN-kill.  Decoding the reference
   kernel's per-axis m/p selection shows the ``zero_det`` source is always
   the corner's OWN voxel, so the kill fires exactly when a meshed row's own
   voxel is missing from indexer/batch_map — unreachable for the consistent
   batches the mesher builds, but reproduced faithfully behind
   ``frontier_kill=True`` (the default).  The wiring test drives it with a
   deliberately inconsistent batch.

2. What actually stops meshes extruding into unobserved space (in both the
   reference and here): unobserved voxels are never allocated, so no cells
   exist there.  The half-observed-sphere test pins that end to end through
   the real map + mesher.
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.ops.marching_cubes import marching_cubes_sparse
from nerf_fusion_tpu.system.map import SparseVoxelMap
from nerf_fusion_tpu.system.mesher import Mesher
from nerf_fusion_tpu.utils.config import dict_to_args

REF_CKPT = Path("/root/reference/ckpt/default/hyper.json")


def _mc_inputs(own_in_indexer: bool):
    """A 3x3x3 grid with one meshed voxel at (1,1,1) whose sample cube
    carries a z-crossing plane => triangles unless the row is killed."""
    n_xyz = (3, 3, 3)
    r = 2
    cap = 8
    indexer = np.full((27,), -1, np.int32)
    pos = (1 * 3 + 1) * 3 + 1
    if own_in_indexer:
        indexer[pos] = 0
    batch_map = np.full((cap,), -1, np.int32)
    batch_map[0] = 0
    # plane z = voxel centre: sdf = (k - r + 0.5)/r over the (2r)^3 cube
    k = np.arange(2 * r)
    sdf = np.broadcast_to((k - r + 0.5) / r, (2 * r, 2 * r, 2 * r)).copy()
    cube_sdf = sdf[None].astype(np.float32)
    cube_std = np.full_like(cube_sdf, 0.05)
    return dict(
        indexer=jnp.asarray(indexer), batch_map=jnp.asarray(batch_map),
        positions_b=jnp.asarray([pos], jnp.int32),
        batch_valid=jnp.asarray([True]),
        cube_sdf=jnp.asarray(cube_sdf), cube_std=jnp.asarray(cube_std),
        n_xyz=n_xyz, voxel_size=0.1,
        bound_min=jnp.zeros(3, jnp.float32),
        r=r, latent_capacity=cap, max_std=10.0, budget=256)


def test_consistent_batch_unaffected_by_kill():
    inp = _mc_inputs(own_in_indexer=True)
    res_kill = marching_cubes_sparse(**inp, frontier_kill=True)
    res_soft = marching_cubes_sparse(**inp, frontier_kill=False)
    n1, n2 = int(res_kill.n_triangles), int(res_soft.n_triangles)
    assert n1 > 0
    assert n1 == n2
    np.testing.assert_allclose(np.asarray(res_kill.vertices[:n1]),
                               np.asarray(res_soft.vertices[:n2]))


def test_dominant_source_kill_fires_on_inconsistent_batch():
    """Own voxel absent from the indexer => every corner's zero_det source
    is missing => the row emits nothing under the reference rule, while
    renormalisation-only mode still meshes it from a neighbour's margin."""
    n_xyz = (3, 3, 3)
    r = 2
    cap = 8
    pos_a = (1 * 3 + 1) * 3 + 1          # (1,1,1): broken (not in indexer)
    pos_b = (1 * 3 + 1) * 3 + 2          # (1,1,2): valid z+1 neighbour
    indexer = np.full((27,), -1, np.int32)
    indexer[pos_b] = 1
    batch_map = np.full((cap,), -1, np.int32)
    batch_map[0] = 0                     # stale mapping for the broken row
    batch_map[1] = 1
    # Row A: sdf would cross z mid-plane on its own.  Row B: uniformly
    # inside (-0.2) => B itself emits nothing, but its margin samples give
    # A's shared-face corners a negative value => renormalisation meshes A.
    k = np.arange(2 * r)
    plane = np.broadcast_to((k - r + 0.5) / r, (2 * r, 2 * r, 2 * r))
    cube_sdf = np.stack([plane, np.full_like(plane, -0.2)]).astype(np.float32)
    cube_std = np.full_like(cube_sdf, 0.05)
    inp = dict(
        indexer=jnp.asarray(indexer), batch_map=jnp.asarray(batch_map),
        positions_b=jnp.asarray([pos_a, pos_b], jnp.int32),
        batch_valid=jnp.asarray([True, True]),
        cube_sdf=jnp.asarray(cube_sdf), cube_std=jnp.asarray(cube_std),
        n_xyz=n_xyz, voxel_size=0.1,
        bound_min=jnp.zeros(3, jnp.float32),
        r=r, latent_capacity=cap, max_std=10.0, budget=256)

    res_soft = marching_cubes_sparse(**inp, frontier_kill=False)
    n_soft = int(res_soft.n_triangles)
    fid_soft = np.asarray(res_soft.flatten_id[:n_soft])
    assert n_soft > 0 and (fid_soft == pos_a).any(), \
        "renormalisation should mesh the broken row from B's margin"

    res_kill = marching_cubes_sparse(**inp, frontier_kill=True)
    n_kill = int(res_kill.n_triangles)
    fid_kill = np.asarray(res_kill.flatten_id[:n_kill])
    assert not (fid_kill == pos_a).any(), \
        "dominant-source kill must suppress the broken row"


@pytest.mark.skipif(not REF_CKPT.exists(), reason="reference ckpt absent")
def test_half_observed_sphere_no_frontier_extrusion():
    """Only the x<=cx hemisphere is observed: the mesh must not extend
    into the unobserved half beyond the allocated-voxel margin."""
    model, margs = load_model(REF_CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.1,
        prune_min_vox_obs=4, ignore_count_th=16.0, encoder_count_th=600.0,
        latent_capacity=2048, alloc_capacity=512))
    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    rng = np.random.RandomState(1)
    n = 8000
    # uniform points on the x<=0 hemisphere of a r=0.25 sphere at (.5,.5,.5)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 0] = -np.abs(v[:, 0])
    pts = (np.array([0.5, 0.5, 0.5]) + 0.25 * v).astype(np.float32)
    nrm = v.astype(np.float32)
    vmap.integrate_keyframe(pts, nrm)
    mesher = Mesher(vmap, max_n_triangles=1 << 15)
    tris = mesher.extract(voxel_resolution=4, max_std=0.3, fast=False)
    assert len(tris) > 50
    verts = tris.reshape(-1, 3)
    # Observed extent ends at x = 0.5; allocation adds the containing voxel
    # plus one 6-neighbour dummy ring, and sample cubes carry a half-voxel
    # margin => worst-case legitimate geometry reaches ~2 voxels past.
    assert verts[:, 0].max() <= 0.5 + 2 * 0.1 + 1e-6, \
        f"mesh extruded to x={verts[:, 0].max():.3f}"
    # sanity: the observed hemisphere is actually reconstructed
    d = np.linalg.norm(verts - np.array([0.5, 0.5, 0.5]), axis=1)
    west = verts[verts[:, 0] < 0.45]
    assert len(west) > 30
    err = np.abs(np.linalg.norm(west - np.array([0.5, 0.5, 0.5]), axis=1) - 0.25)
    assert np.median(err) < 0.05
