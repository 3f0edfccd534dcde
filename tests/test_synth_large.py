"""ScanNet-scale synthetic scene (data/synth.py scene="large"):
depth/SDF consistency, trajectory sanity, config wiring.

The scene backs configs/fusion-scannet-scale.yaml — BASELINE.json
config #5's "large voxel count" workload.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nerf_fusion_tpu.data.synth import (SCENES, SyntheticSequence,
                                        scene_sdf_large)
from nerf_fusion_tpu.utils import config as exp_util


def _backproject(frame):
    depth = np.asarray(frame.depth)
    H, W = depth.shape
    c = frame.calib
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    z = depth
    pts_cam = np.stack([(u - c.cx) / c.fx * z, (v - c.cy) / c.fy * z, z], -1)
    ok = np.isfinite(z)
    iso = frame.gt_pose
    R = np.asarray(iso.q.rotation_matrix)
    return pts_cam[ok] @ R.T + np.asarray(iso.t), ok


def test_large_scene_depth_matches_sdf():
    seq = SyntheticSequence(n_frames=9, width=96, height=72, scene="large")
    hit_fracs = []
    for idx in (0, 4, 8):
        f = seq.render_frame(idx)
        pts, ok = _backproject(f)
        assert ok.mean() > 0.4, "large scene frame mostly empty"
        hit_fracs.append(ok.mean())
        # rendered depth points lie on the analytic surface
        sdf = np.asarray(scene_sdf_large(jnp.asarray(pts)))
        assert np.median(np.abs(sdf)) < 5e-3
        assert np.mean(np.abs(sdf)) < 2e-2
        # and inside the scannet-scale map bounds
        assert pts.min() > -4.75 and pts.max() < 4.75


def test_large_trajectory_spans_both_rooms():
    seq = SyntheticSequence(n_frames=120, scene="large")
    t = np.stack([p.t for p in seq._poses])
    assert t[:, 2].min() < -2.0 and t[:, 2].max() > 2.0  # both rooms
    assert np.all(np.abs(t[:, [0, 2]]) < 4.0)            # inside the walls
    assert np.all((t[:, 1] > 1.1) & (t[:, 1] < 1.4))
    # hand-held-scale motion between consecutive frames
    steps = np.linalg.norm(np.diff(t, axis=0), axis=1)
    assert steps.max() < 0.25


def test_scene_registry_and_config():
    from pathlib import Path

    assert set(SCENES) >= {"room", "large"}
    args = exp_util.parse_config_yaml(
        Path(__file__).resolve().parent.parent
        / "configs" / "fusion-scannet-scale.yaml")
    assert args.sequence_kwargs["scene"] == "large"
    assert args.mapping["latent_capacity"] == 65536
    seq = SyntheticSequence(**{**args.sequence_kwargs,
                               "n_frames": 3, "width": 32, "height": 24})
    assert seq.scene_sdf is scene_sdf_large
    f = seq.render_frame(0)
    assert np.asarray(f.rgb).shape == (24, 32, 3)
