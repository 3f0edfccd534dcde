"""Map debug visuals + large-scale (ScanNet-size) map smoke test."""

import numpy as np
import pytest

from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.map import SparseVoxelMap
from nerf_fusion_tpu.utils import vis
from nerf_fusion_tpu.utils.config import dict_to_args

from pathlib import Path

CKPT = Path(__file__).resolve().parent.parent / "ckpt/default/hyper.json"


def test_vis_builders():
    bbox = vis.wireframe_bbox([0, 0, 0], [1, 1, 1], color_id=4)
    assert bbox["points"].shape == (8, 3) and bbox["lines"].shape == (12, 2)
    traj = vis.trajectory(np.random.randn(5, 3))
    assert traj["lines"].shape == (4, 2)
    cam = vis.camera(__import__("nerf_fusion_tpu.utils.se3",
                                fromlist=["Isometry"]).Isometry())
    assert cam["points"].shape == (5, 3)
    merged = vis.merged_linesets([bbox, traj])
    assert len(merged["points"]) == 13
    jet = vis.jet(np.linspace(0, 1, 5))
    assert jet.shape == (5, 3) and jet.min() >= 0 and jet.max() <= 1


@pytest.mark.slow
def test_map_visuals(tmp_path):
    model, margs = load_model(CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.1,
        prune_min_vox_obs=4, ignore_count_th=8.0, encoder_count_th=600.0,
        latent_capacity=2048, alloc_capacity=512))
    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    rng = np.random.RandomState(0)
    d = rng.randn(4000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    vmap.integrate_keyframe((0.5 + 0.2 * d).astype(np.float32),
                            d.astype(np.float32))
    preview = vmap.get_fast_preview_visuals()
    assert preview[0]["points"].shape[0] > 8

    out = vmap.get_map_visuals(return_blocks=True, return_samples=True,
                               return_uncertainty=True, voxel_resolution=4)
    assert out["blocks"] and out["samples"] and out["uncertainty"]
    assert out["samples"][0]["points"].shape[1] == 3
    vis.save_lineset_ply(tmp_path / "blocks.ply", out["blocks"][0])
    assert (tmp_path / "blocks.ply").stat().st_size > 100


@pytest.mark.slow
def test_scannet_scale_map():
    """Config-#5-scale geometry: 8M-voxel indexer, 100k-slot capacity."""
    model, margs = load_model(CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[-10.0, -2.0, -10.0], bound_max=[10.0, 3.0, 10.0],
        voxel_size=0.05,                      # 400 x 100 x 400 = 16M voxels
        prune_min_vox_obs=2, ignore_count_th=4.0, encoder_count_th=600.0,
        latent_capacity=131072, alloc_capacity=16384))
    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    assert vmap.cfg.n_voxels == 400 * 100 * 400
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(-8, 8, 20000), rng.uniform(-1, 2, 20000),
                    rng.uniform(-8, 8, 20000)], 1).astype(np.float32)
    # cluster points so they survive pruning: snap to a coarse lattice
    pts = np.round(pts * 2) / 2 + rng.randn(20000, 3).astype(np.float32) * 0.01
    nrm = np.tile([[0.0, 1.0, 0.0]], (20000, 1)).astype(np.float32)
    vmap.integrate_keyframe(pts, nrm)
    vmap.sync_updated()
    assert int(vmap.state.n_occupied) > 1000
    vmap.check_overflow()
    sdf, std, valid = vmap.get_sdf(pts[:256])
    assert np.asarray(valid).any()
