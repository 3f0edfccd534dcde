"""frames_per_call: K tracking-only frames scanned per device dispatch.

Pins the equivalence contract of ``fused_frame_block`` /
``FusionPipeline.flush_frames`` (system/tracker.py, system/pipeline.py):
blocking up non-cadence frames into one scanned program must reproduce the
per-frame trajectory.  K=8 against the 20-frame cadence exercises every
host path in one run: full 8-blocks, the partial flush a cadence frame
forces, and the end-of-run tail flush.
"""

from pathlib import Path

import numpy as np
import pytest

from nerf_fusion_tpu.data.synth import SyntheticSequence
from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.pipeline import FusionPipeline
from nerf_fusion_tpu.utils import config as exp_util

REPO = Path(__file__).resolve().parent.parent


def _run(frames_per_call, n=25):
    args = exp_util.parse_config_yaml(REPO / "configs" / "fusion-synth.yaml")
    model, margs = load_model(REPO / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    args.frames_per_call = frames_per_call
    seq = SyntheticSequence(n_frames=n, width=160, height=120)
    pipe = FusionPipeline(model, args)
    res = pipe.run(seq, max_frames=n)
    return pipe, res


@pytest.mark.slow
def test_block_tracking_matches_per_frame():
    n = 25
    p1, r1 = _run(1, n)
    p8, r8 = _run(8, n)

    # every frame tracked exactly once, poses materialise for all of them
    assert p1.tracker.n_tracked == n
    assert p8.tracker.n_tracked == n
    t1, t8 = p1.trajectory(), p8.trajectory()
    assert len(t1) == len(t8) == n

    # the scanned body is the same _frame_step computation over the same
    # inputs; only program structure differs, so trajectories agree to
    # XLA-fusion noise (bit-identical on CPU when this was written)
    for a, b in zip(t1, t8):
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t),
                                   atol=1e-5)
        np.testing.assert_allclose(a.q.rotation_matrix, b.q.rotation_matrix,
                                   atol=1e-5)
    assert abs(r1["ate_rmse"] - r8["ate_rmse"]) < 1e-4

    # drop stats flatten () and (K,) entries to one per-frame series
    d8 = r8["box_filter_drop_frac"]
    assert np.isfinite(d8["mean"]) and np.isfinite(d8["max"])

    # block mode really blocked: fewer tracker call entries than frames
    assert len(p8.tracker.all_pd_pose) < n
