"""PrefetchSequence: read-ahead frames must match direct iteration exactly."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
from nerf_fusion_tpu.data.prefetch import PrefetchSequence
from nerf_fusion_tpu.data.synth import SyntheticSequence


def _export(tmp_path, n=6):
    from export_icl_format import export_sequence
    seq = SyntheticSequence(n_frames=n, width=160, height=120)
    return export_sequence(seq, tmp_path), n


def test_prefetch_matches_direct(tmp_path):
    first_tq, n = _export(tmp_path)
    direct = ICLNUIMSequence(str(tmp_path), first_tq=first_tq, load_gt=True)
    pre = PrefetchSequence(
        ICLNUIMSequence(str(tmp_path), first_tq=first_tq, load_gt=True),
        depth=3, workers=2)
    assert len(pre) == n
    assert pre.gt_trajectory is not None
    for i in range(n):
        a, b = next(direct), next(pre)
        np.testing.assert_array_equal(a.rgb, b.rgb)
        m = np.isfinite(a.depth)
        np.testing.assert_array_equal(m, np.isfinite(b.depth))
        np.testing.assert_array_equal(a.depth[m], b.depth[m])
        assert np.allclose(a.gt_pose.matrix, b.gt_pose.matrix)
    try:
        next(pre)
        assert False, "expected StopIteration"
    except StopIteration:
        pass


def test_prefetch_sequential_fallback():
    """Sequences without load_frame go through the 1-worker ordered path."""
    base = SyntheticSequence(n_frames=4, width=64, height=48)
    ref = SyntheticSequence(n_frames=4, width=64, height=48)
    pre = PrefetchSequence(base, depth=2)
    for i in range(4):
        a, b = ref.render_frame(i), next(pre)
        np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb))
