"""Tracker tests on the synthetic sequence with the shipped decoder weights."""

from pathlib import Path

import numpy as np
import pytest

from nerf_fusion_tpu.data.synth import SyntheticSequence
from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.pipeline import FusionPipeline
from nerf_fusion_tpu.utils.config import dict_to_args, parse_config_yaml

CFG = Path(__file__).resolve().parent.parent / "configs" / "fusion-synth.yaml"


def _pipeline(width=160, height=120, n_frames=8):
    args = parse_config_yaml(CFG)
    model, margs = load_model(CFG.parent.parent / args.training_hypers, 300)
    args.model = margs
    args.mapping = dict_to_args(args.mapping)
    # shrink capacities for CPU test speed
    args.mapping.latent_capacity = 4096
    args.mapping.alloc_capacity = 2048
    args.tracking = dict_to_args(args.tracking)
    args.tracking.iter_config = [
        {"n": 4, "type": [["rgb", 2]]},
        {"n": 4, "type": [["sdf"], ["rgb", 1]]},
        {"n": 8, "type": [["sdf"], ["rgb", 0]]},
    ]
    seq = SyntheticSequence(n_frames=n_frames, width=width, height=height)
    pipe = FusionPipeline(model, args, point_budget=4096)
    return args, seq, pipe


@pytest.mark.slow
def test_tracking_follows_gt():
    args, seq, pipe = _pipeline()
    gts = []
    for i in range(len(seq)):
        fr = next(seq)
        pipe.process_frame(fr, i)
        gts.append(fr.gt_pose)
    traj = pipe.trajectory()
    errs_t, errs_r = [], []
    for pose, gt in zip(traj[1:], gts[1:]):
        errs_t.append(np.linalg.norm(pose.t - gt.t))
        dR = pose.q.rotation_matrix.T @ gt.q.rotation_matrix
        errs_r.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
    errs_t, errs_r = np.asarray(errs_t), np.asarray(errs_r)
    # interframe motion is ~2.6 cm; tracking should stay well under that
    assert errs_t.max() < 0.05, f"translation errors {errs_t}"
    assert errs_r.max() < 3.0, f"rotation errors {errs_r}"


@pytest.mark.slow
def test_tracking_beats_constant_pose():
    """Tracked trajectory must be better than assuming no motion."""
    args, seq, pipe = _pipeline(n_frames=6)
    gts = []
    for i in range(len(seq)):
        fr = next(seq)
        pipe.process_frame(fr, i)
        gts.append(fr.gt_pose)
    traj = pipe.trajectory()
    err_tracked = [np.linalg.norm(p.t - g.t) for p, g in zip(traj[1:], gts[1:])]
    drift_static = [np.linalg.norm(gts[0].t - g.t) for g in gts[1:]]
    assert np.mean(err_tracked) < 0.5 * np.mean(drift_static)
