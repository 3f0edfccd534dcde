"""ScanNet-export reader roundtrip on synthetic frames."""

import numpy as np
import pytest

from nerf_fusion_tpu.data.scannet import ScanNetSequence
from nerf_fusion_tpu.data.synth import SyntheticSequence


@pytest.fixture(scope="module")
def scannet_dir(tmp_path_factory):
    import cv2

    out = tmp_path_factory.mktemp("scannet")
    (out / "color").mkdir()
    (out / "depth").mkdir()
    (out / "pose").mkdir()
    (out / "intrinsic").mkdir()
    seq = SyntheticSequence(n_frames=5, width=160, height=120)
    poses = []
    for i in range(5):
        fr = seq.render_frame(i)
        rgb = (np.clip(np.asarray(fr.rgb), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(out / "color" / f"{i}.jpg"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        d16 = np.nan_to_num(np.asarray(fr.depth)) * 1000.0
        cv2.imwrite(str(out / "depth" / f"{i}.png"),
                    np.clip(d16, 0, 65535).astype(np.uint16))
        np.savetxt(out / "pose" / f"{i}.txt", fr.gt_pose.matrix)
        poses.append(fr.gt_pose)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = fr.calib.fx
    K[0, 2], K[1, 2] = fr.calib.cx, fr.calib.cy
    np.savetxt(out / "intrinsic" / "intrinsic_depth.txt", K)
    return out, poses, fr.calib


def test_scannet_reader(scannet_dir):
    out, poses, calib = scannet_dir
    rd = ScanNetSequence(str(out))
    assert len(rd) == 5
    assert abs(rd.calib.fx - calib.fx) < 1e-6
    for i in range(5):
        fr = next(rd)
        assert np.allclose(fr.gt_pose.matrix, poses[i].matrix, atol=1e-6)
        assert fr.rgb.shape == (120, 160, 3)
        assert fr.depth.shape == (120, 160)
    src = SyntheticSequence(n_frames=5, width=160, height=120).render_frame(4)
    m = np.isfinite(np.asarray(src.depth))
    # sensor-width frames: decode as the jitted frontend does on device
    assert fr.depth.dtype == np.uint16 and fr.rgb.dtype == np.uint8
    depth = fr.depth.astype(np.float32) / rd.depth_scale
    assert np.abs(depth[m] - np.asarray(src.depth)[m]).max() < 1e-3


def test_scannet_frame_skip_and_untracked(scannet_dir):
    out, poses, _ = scannet_dir
    # corrupt one pose to -inf (ScanNet untracked-frame convention)
    bad = np.full((4, 4), -np.inf)
    np.savetxt(out / "pose" / "3.txt", bad)
    rd = ScanNetSequence(str(out), frame_skip=1)
    # untracked frame falls back to the previous pose
    assert np.allclose(rd.gt_trajectory[3].matrix, rd.gt_trajectory[2].matrix)
    rd2 = ScanNetSequence(str(out), frame_skip=2)
    assert len(rd2) == 3
    np.savetxt(out / "pose" / "3.txt", poses[3].matrix)  # restore
