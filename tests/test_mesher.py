"""End-to-end map->mesh slice test with the shipped reference weights:
integrate a synthetic plane point cloud, extract the mesh, check geometry."""

from pathlib import Path

import numpy as np
import pytest

from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.map import SparseVoxelMap
from nerf_fusion_tpu.system.mesher import Mesher
from nerf_fusion_tpu.utils.config import dict_to_args

REF_CKPT = Path("/root/reference/ckpt/default/hyper.json")


@pytest.fixture(scope="module")
def plane_mesher():
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not present")
    model, margs = load_model(REF_CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.1,
        prune_min_vox_obs=4, ignore_count_th=16.0, encoder_count_th=600.0,
        latent_capacity=2048, alloc_capacity=512))
    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    rng = np.random.RandomState(0)
    n = 6000
    pts = np.stack([rng.uniform(0.3, 0.7, n), rng.uniform(0.3, 0.7, n),
                    np.full(n, 0.55) + rng.randn(n) * 0.002], axis=1).astype(np.float32)
    nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    vmap.integrate_keyframe(pts, nrm)
    mesher = Mesher(vmap, max_n_triangles=1 << 15)
    return vmap, mesher


def test_mesh_reconstructs_plane(plane_mesher):
    vmap, mesher = plane_mesher
    tris = mesher.extract(voxel_resolution=4, max_std=0.3, fast=False)
    assert len(tris) > 50
    verts = tris.reshape(-1, 3)
    # vertices concentrate near the plane z=0.55
    core = verts[(verts[:, 0] > 0.35) & (verts[:, 0] < 0.65)
                 & (verts[:, 1] > 0.35) & (verts[:, 1] < 0.65)]
    assert len(core) > 30
    err = np.abs(core[:, 2] - 0.55)
    assert np.median(err) < 0.03, f"median plane error {np.median(err):.4f}"


def test_fast_mode_close_to_full(plane_mesher):
    vmap, mesher = plane_mesher
    m_full = Mesher(vmap, max_n_triangles=1 << 15)
    vmap.updated_slots[:] = True
    full = m_full.extract(4, max_std=0.3, fast=False, no_cache=True).copy()
    m_fast = Mesher(vmap, max_n_triangles=1 << 15)
    fast = m_fast.extract(4, max_std=0.3, fast=True, no_cache=True)
    assert len(fast) > 0
    # fast mode re-evaluates near-surface cells: triangle counts comparable
    assert abs(len(fast) - len(full)) / len(full) < 0.2
    zf = np.median(fast.reshape(-1, 3)[:, 2])
    zF = np.median(full.reshape(-1, 3)[:, 2])
    assert abs(zf - zF) < 0.01


def test_incremental_remesh_replaces_stale(plane_mesher):
    vmap, mesher = plane_mesher
    m = Mesher(vmap, max_n_triangles=1 << 15)
    vmap.updated_slots[:] = True
    t1 = m.extract(4, max_std=0.3, fast=False, no_cache=True).copy()
    # no updates -> cache returned unchanged
    t2 = m.extract(4, max_std=0.3, fast=False)
    assert np.allclose(t1, t2)
    # mark everything updated again -> same geometry, not duplicated
    vmap.updated_slots[:np.asarray(vmap.state.n_occupied)] = True
    t3 = m.extract(4, max_std=0.3, fast=False)
    assert len(t3) == len(t1)


def test_ply_export(tmp_path, plane_mesher):
    vmap, _ = plane_mesher
    m = Mesher(vmap, max_n_triangles=1 << 15)
    vmap.updated_slots[:] = True
    m.extract(4, max_std=0.3, fast=False, no_cache=True)
    out = tmp_path / "mesh.ply"
    m.save_ply(out)
    raw = out.read_bytes()
    header = raw.split(b"end_header\n")[0].decode().splitlines()
    assert header[0] == "ply"
    nv = int([l for l in header
              if l.startswith("element vertex")][0].split()[-1])
    assert nv == len(m.vertices) * 3
    # binary body: 3 f4 + 3 u1 per vertex, (u1 + 3 i4) per face
    body = raw.split(b"end_header\n", 1)[1]
    assert len(body) == nv * 15 + (nv // 3) * 13
    verts = np.frombuffer(body[:nv * 15], dtype=[("x", "<f4"), ("y", "<f4"),
                                                 ("z", "<f4"), ("r", "u1"),
                                                 ("g", "u1"), ("b", "u1")])
    np.testing.assert_allclose(
        np.stack([verts["x"], verts["y"], verts["z"]], -1),
        m.vertices.reshape(-1, 3), rtol=1e-6)


def test_budget_overflow_defers_and_converges():
    """A mesh batch bigger than mesh_batch_budget must NOT fall back to the
    chunked full re-mesh: the overflow defers through the leftover mask and
    a materialising extract drains it to the exact same triangle set a
    large-budget extraction produces."""
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not present")
    model, margs = load_model(REF_CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.02,
        prune_min_vox_obs=1, ignore_count_th=0.0, encoder_count_th=600.0,
        latent_capacity=8192, alloc_capacity=4096))

    def build():
        vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
        rng = np.random.RandomState(0)
        n = 20000
        pts = np.stack([rng.uniform(0.3, 0.7, n), rng.uniform(0.3, 0.7, n),
                        np.full(n, 0.55) + rng.randn(n) * 0.002],
                       axis=1).astype(np.float32)
        nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        vmap.integrate_keyframe(pts, nrm)
        return vmap

    vmap_small = build()
    small = Mesher(vmap_small, max_n_triangles=1 << 17, mesh_batch_budget=512)
    tris_small = small.extract(2, max_std=0.6, fast=False).copy()
    assert not small._need_full_remesh      # deferral, not full re-mesh
    # the leftover path must actually have fired and drained
    assert vmap_small._updated_dev is None or \
        not bool(np.asarray(vmap_small._updated_dev).any())

    vmap_big = build()
    big = Mesher(vmap_big, max_n_triangles=1 << 17, mesh_batch_budget=8192)
    tris_big = big.extract(2, max_std=0.6, fast=False).copy()

    # Batch-boundary interpolation seams make incremental batches differ
    # from a single global batch by a handful of triangles (the reference's
    # incremental path shares this: it too only decodes updated+neighbour
    # cubes per extraction, map.py:628-632) — counts agree to <1% and the
    # surface sits on the same plane.
    assert len(tris_big) > 1000              # budget 512 really overflowed
    assert abs(len(tris_small) - len(tris_big)) / len(tris_big) < 0.01
    for tris in (tris_small, tris_big):
        z = tris.reshape(-1, 3)[:, 2]
        sel = np.abs(z - 0.55) < 0.05
        assert sel.mean() > 0.95
    # Every big-run triangle centroid has a matching small-run centroid.
    ca = np.sort(tris_small.mean(axis=1), axis=0)
    cb = np.sort(tris_big.mean(axis=1), axis=0)
    n = min(len(ca), len(cb))
    assert np.median(np.abs(ca[:n] - cb[:n])) < 5e-3


def test_cadence_deferral_over_multiple_integrations():
    """Pipeline-shaped stress (VERDICT r2 item 8): several integrate ->
    dispatch-only extract rounds with mesh_batch_budget far below the
    updated-voxel count; leftovers must roll forward through the cadence
    and the final materialising extract must drain to the same triangle
    set a no-budget mesher produces."""
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not present")
    model, margs = load_model(REF_CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.02,
        prune_min_vox_obs=1, ignore_count_th=0.0, encoder_count_th=600.0,
        latent_capacity=8192, alloc_capacity=4096))
    rng = np.random.RandomState(1)

    def clouds():
        for zc in (0.45, 0.55, 0.65):      # three keyframes, moving plane
            n = 12000
            pts = np.stack([rng.uniform(0.3, 0.7, n),
                            rng.uniform(0.3, 0.7, n),
                            np.full(n, zc) + rng.randn(n) * 0.002],
                           axis=1).astype(np.float32)
            nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
            yield pts, nrm

    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    tight = Mesher(vmap, max_n_triangles=1 << 17, mesh_batch_budget=512)
    for pts, nrm in clouds():
        vmap.integrate_keyframe(pts, nrm)
        # cadence-style: dispatch without materialising (sync frame loop)
        tight.extract(2, max_std=0.6, fast=False, materialize=False)
    tris_tight = tight.extract(2, max_std=0.6, fast=False).copy()
    assert not tight._need_full_remesh

    rng = np.random.RandomState(1)
    vmap2 = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    wide = Mesher(vmap2, max_n_triangles=1 << 17, mesh_batch_budget=8192)
    for pts, nrm in clouds():
        vmap2.integrate_keyframe(pts, nrm)
        wide.extract(2, max_std=0.6, fast=False, materialize=False)
    tris_wide = wide.extract(2, max_std=0.6, fast=False).copy()

    assert len(tris_wide) > 1000
    assert abs(len(tris_tight) - len(tris_wide)) / len(tris_wide) < 0.01
    ca = np.sort(tris_tight.mean(axis=1), axis=0)
    cb = np.sort(tris_wide.mean(axis=1), axis=0)
    n = min(len(ca), len(cb))
    assert np.median(np.abs(ca[:n] - cb[:n])) < 5e-3


def test_full_remesh_repair_route(plane_mesher):
    """The stall/overflow repair flag must route the next materialising
    extract through the unbounded chunked path and produce the full mesh
    (mesher.py:343-348)."""
    vmap, _ = plane_mesher
    m = Mesher(vmap, max_n_triangles=1 << 15)
    vmap.updated_slots[:] = True
    ref = m.extract(4, max_std=0.3, fast=False, no_cache=True).copy()

    m2 = Mesher(vmap, max_n_triangles=1 << 15)
    vmap.updated_slots[:] = True
    m2._need_full_remesh = True            # as set by a truncated batch
    repaired = m2.extract(4, max_std=0.3, fast=False)
    assert len(repaired) == len(ref)
    ca = np.sort(ref.mean(axis=1), axis=0)
    cb = np.sort(repaired.mean(axis=1), axis=0)
    assert np.abs(ca - cb).max() < 1e-5


def test_pipeline_mesh_knobs_threaded(tmp_path):
    """`mesh_fast` / `mesh_decode_precision` config keys reach the mesher;
    the TPU-first default is the exact full decode (fast=False)."""
    from pathlib import Path

    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils.config import dict_to_args, parse_config_yaml

    cfg = Path(__file__).resolve().parent.parent / "configs" / "fusion-synth.yaml"
    args = parse_config_yaml(cfg)
    model, margs = load_model(cfg.parent.parent / args.training_hypers, 300)
    args.model = margs
    args.mapping = dict_to_args(args.mapping)
    args.mapping.latent_capacity = 1024
    args.mapping.alloc_capacity = 512
    args.tracking = dict_to_args(args.tracking)
    pipe = FusionPipeline(model, args, point_budget=1024)
    assert pipe.mesh_fast is False                       # TPU-first default
    assert pipe.mesher.decode_precision == "default"     # from the config
    args.mesh_fast = True
    args.mesh_decode_precision = "high"
    pipe2 = FusionPipeline(model, args, point_budget=1024)
    assert pipe2.mesh_fast is True
    assert pipe2.mesher.decode_precision == "high"


def test_mesh_reuse_latent_eps_skips_and_matches():
    """Latent-reuse re-mesh gating (Mesher(reuse_latent_eps>0), VERDICT r4
    #4): an updated voxel whose latent did not move since its last meshing
    is skipped (white-box: the dispatched batch keeps zero rows), the
    cached mesh is bitwise unchanged, and the result equals a from-scratch
    eps=0 mesher's output over the identical integrations."""
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not present")
    model, margs = load_model(REF_CKPT, 300)
    # The thresholds are pushed out of reach so re-integrating the SAME
    # cloud is exactly idempotent and the gate must skip everything:
    #  * ignore_count_th=0 — voxels that newly cross a confidence
    #    threshold on the second pass legitimately re-mesh (their cache
    #    entries are invalid);
    #  * encoder_count_th=1e9 — voxels crossing the encoder cap drop out
    #    of the reference pre-prune focus set (map.py:390-398), which
    #    shifts the contribution mix of their still-eligible neighbours
    #    and legitimately moves those latents (> eps).
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.1,
        prune_min_vox_obs=4, ignore_count_th=0.0, encoder_count_th=1e9,
        latent_capacity=2048, alloc_capacity=512))

    def build():
        vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
        rng = np.random.RandomState(0)
        n = 6000
        pts = np.stack([rng.uniform(0.3, 0.7, n), rng.uniform(0.3, 0.7, n),
                        np.full(n, 0.55) + rng.randn(n) * 0.002],
                       axis=1).astype(np.float32)
        nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        return vmap, pts, nrm

    vmap, pts, nrm = build()
    mesher = Mesher(vmap, max_n_triangles=1 << 15, reuse_latent_eps=1e-4)
    vmap.integrate_keyframe(pts, nrm)
    mesh1 = mesher.extract(4, max_std=0.3, fast=False).copy()
    assert len(mesh1) > 50

    # Same-data re-integration: the count-weighted Bayesian mean is exactly
    # unchanged (sum doubles, count doubles), so with the gate every
    # re-marked voxel is skipped and the cached mesh survives untouched.
    vmap.integrate_keyframe(pts, nrm)
    mesher._dispatch_fused(4, 0.3, False)
    assert mesher._pending, "expected a dispatched batch"
    assert int(np.asarray(mesher._pending[-1].keep).sum()) == 0
    assert np.array_equal(mesher.current_mesh(), mesh1)

    # An eps=0 mesher over the identical data produces the same triangles
    # (sorted comparison: batch composition may reorder them).
    vmap2, pts2, nrm2 = build()
    mesher2 = Mesher(vmap2, max_n_triangles=1 << 15)    # reuse disabled
    vmap2.integrate_keyframe(pts2, nrm2)
    vmap2.integrate_keyframe(pts2, nrm2)
    mesh2 = mesher2.extract(4, max_std=0.3, fast=False)

    def canon(m):
        flat = np.asarray(m).reshape(len(m), -1)
        return flat[np.lexsort(flat.T[::-1])]

    assert np.allclose(canon(mesh1), canon(mesh2), atol=1e-5)
