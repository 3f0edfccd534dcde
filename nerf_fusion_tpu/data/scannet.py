"""ScanNet-export RGB-D sequence reader (large-scene capability, config #5).

The reference fork's ``ScannetSequence`` (dataset/production/icl_nuim.py:125-269)
entangles sequence reading with training-data plumbing for an abandoned
trainer; this is the clean sequence-role equivalent for the standard
ScanNet sensor export layout:

    scene/
      color/{i}.jpg      depth/{i}.png (millimetres)
      pose/{i}.txt       (4x4 camera-to-world; -inf rows = untracked frame)
      intrinsic/intrinsic_depth.txt (4x4)

Depth and color resolutions may differ; color is resampled to the depth
grid so the pipeline sees one aligned (H, W) frame.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..utils.se3 import Isometry
from .base import FrameData, FrameIntrinsic, RGBDSequence


class ScanNetSequence(RGBDSequence):
    def __init__(self, path: str, start_frame: int = 0, end_frame: int = -1,
                 frame_skip: int = 1, load_gt: bool = True, depth_scale: float = 1000.0):
        super().__init__()
        self.path = Path(path)
        self.depth_scale = depth_scale
        n = len(list((self.path / "depth").glob("*.png")))
        if end_frame == -1:
            end_frame = n
        self.ids = list(range(start_frame, min(end_frame, n), frame_skip))

        K = np.loadtxt(self.path / "intrinsic" / "intrinsic_depth.txt")
        self.calib = FrameIntrinsic(K[0, 0], K[1, 1], K[0, 2], K[1, 2], depth_scale)

        self.gt_trajectory = None
        if load_gt and (self.path / "pose").exists():
            poses = []
            for i in self.ids:
                mat = np.loadtxt(self.path / "pose" / f"{i}.txt")
                if not np.all(np.isfinite(mat)):
                    poses.append(poses[-1] if poses else Isometry())
                else:
                    poses.append(Isometry.from_matrix(mat, ortho=True))
            self.gt_trajectory = poses
        self.first_iso = (self.gt_trajectory[0] if self.gt_trajectory
                          else Isometry())

    def __len__(self):
        return len(self.ids)

    def load_frame(self, idx: int) -> FrameData:
        """Random-access decode (thread-safe) for PrefetchSequence."""
        import cv2

        i = self.ids[idx]
        # sensor-width frames (uint16 counts / uint8 rgb): converted on
        # device by the jitted frontend (0 depth = invalid)
        depth = cv2.imread(str(self.path / "depth" / f"{i}.png"),
                           cv2.IMREAD_UNCHANGED).astype(np.uint16)
        rgb = cv2.imread(str(self.path / "color" / f"{i}.jpg"))
        if rgb is None:
            rgb = cv2.imread(str(self.path / "color" / f"{i}.png"))
        rgb = cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB)
        if rgb.shape[:2] != depth.shape:
            rgb = cv2.resize(rgb, (depth.shape[1], depth.shape[0]),
                             interpolation=cv2.INTER_AREA)

        frame = FrameData()
        frame.gt_pose = (self.gt_trajectory[idx]
                         if self.gt_trajectory is not None else None)
        frame.calib = self.calib
        frame.depth = depth
        frame.rgb = rgb
        return frame

    def __next__(self) -> FrameData:
        if self.frame_id >= len(self):
            raise StopIteration
        frame = self.load_frame(self.frame_id)
        self.frame_id += 1
        return frame
