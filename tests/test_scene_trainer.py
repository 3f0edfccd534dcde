"""Per-scene trainer (yc_trainer capability, working here): harvest LIFs
from a posed RGB-D scene and train on the in-memory dataset.

Regression guard: MemoryLifDataset must support the packed batch-sampling
fast path without a backing directory (caught live by a CLI run)."""

import numpy as np
import pytest

from nerf_fusion_tpu.data.scannet import ScanNetSequence
from nerf_fusion_tpu.data.synth import SyntheticSequence
from nerf_fusion_tpu.utils.config import dict_to_args


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    import cv2

    out = tmp_path_factory.mktemp("scene")
    for d in ("color", "depth", "pose", "intrinsic"):
        (out / d).mkdir()
    seq = SyntheticSequence(n_frames=5, width=160, height=120)
    for i in range(5):
        f = seq.render_frame(i)
        rgb = (np.clip(np.asarray(f.rgb), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(out / "color" / f"{i}.jpg"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        d16 = np.nan_to_num(np.asarray(f.depth), nan=0.0) * 1000
        cv2.imwrite(str(out / "depth" / f"{i}.png"), d16.astype(np.uint16))
        np.savetxt(out / "pose" / f"{i}.txt", f.gt_pose.matrix)
    K = np.eye(4)
    K[0, 0], K[1, 1] = f.calib.fx, f.calib.fy
    K[0, 2], K[1, 2] = f.calib.cx, f.calib.cy
    np.savetxt(out / "intrinsic" / "intrinsic_depth.txt", K)
    return out


@pytest.mark.slow
def test_harvest_and_train_scene(scene_dir, tmp_path):
    from nerf_fusion_tpu.trainer.scene import (MemoryLifDataset,
                                               harvest_scene_lifs, train_scene)
    from nerf_fusion_tpu.utils.config import parse_config_yaml
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    args = parse_config_yaml(repo / "configs" / "train_scannet.yaml")
    args.num_epochs = 1
    args.snapshot_frequency = 1
    args.additional_snapshots = []
    args.save_dir = str(tmp_path / "ckpt")
    args.run_name = "t"
    args.preprocess = {"outlier_min_nb": 8}   # exercises the threshold plumb
    seq = ScanNetSequence(str(scene_dir))
    payloads = harvest_scene_lifs(seq, args, max_frames=5, frame_stride=1)
    assert len(payloads) > 5
    for p in payloads[:3]:
        assert p["data"].shape[1] == 4 and p["surface"].shape[1] == 6

    ds = MemoryLifDataset(payloads, num_sample=128, num_surface_sample=32)
    sdf, surf = ds.sample_batch(np.arange(min(4, len(ds))))  # in-memory pack
    assert np.isfinite(sdf).all() and np.isfinite(surf).all()

    seq2 = ScanNetSequence(str(scene_dir))
    model, save_dir = train_scene(args, seq2, max_frames=5)
    assert (Path(save_dir) / "model_1.npz").exists()
