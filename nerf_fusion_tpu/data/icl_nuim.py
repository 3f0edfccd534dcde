"""ICL-NUIM RGB-D sequence reader.

Parity with dataset/production/icl_nuim.py:54-123: ``rgb/%d.png`` +
``depth/%d.png`` layout, hardcoded intrinsics (481.2, 480, 319.5, 239.5,
depth scale 5000), TUM-freiburg ground-truth parsing with the Y-flip and
180-degree-Z canonicalisation, and the ``first_tq`` starting-pose override.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..utils.se3 import Isometry, Quaternion
from .base import FrameData, FrameIntrinsic, RGBDSequence


class ICLNUIMSequence(RGBDSequence):
    CALIB = [481.20, 480.0, 319.50, 239.50, 5000.0]

    def __init__(self, path: str, start_frame: int = 0, end_frame: int = -1,
                 first_tq: list = None, load_gt: bool = False, mesh_gt: str = None):
        super().__init__()
        self.path = Path(path)
        self.color_names = sorted(
            [f"rgb/{t}" for t in os.listdir(self.path / "rgb")],
            key=lambda t: int(t[4:].split(".")[0]))
        self.depth_names = [f"depth/{t}.png" for t in range(len(self.color_names))]

        if first_tq is not None:
            self.first_iso = Isometry(q=Quaternion(array=first_tq[3:]),
                                      t=np.array(first_tq[:3]))
        else:
            self.first_iso = Isometry(q=Quaternion(array=[0.0, -1.0, 0.0, 0.0]))

        if end_frame == -1:
            end_frame = len(self.color_names)
        self.color_names = self.color_names[start_frame:end_frame]
        self.depth_names = self.depth_names[start_frame:end_frame]

        if load_gt:
            cands = list(self.path.glob("*.freiburg")) + \
                list(self.path.glob("groundtruth.txt"))
            self.gt_trajectory = self._parse_traj_file(cands[0])
            self.gt_trajectory = self.gt_trajectory[start_frame:end_frame]
            change = self.first_iso.dot(self.gt_trajectory[0].inv())
            self.gt_trajectory = [change.dot(t) for t in self.gt_trajectory]
        else:
            self.gt_trajectory = None

    @staticmethod
    def _parse_traj_file(traj_path):
        """TUM trajectory rows -> canonicalised Isometry list.

        The raw ICL-NUIM convention is left-handed; rows are (id, t, qxyzw).
        The second axis is mirrored and a 180-degree Z rotation applied
        (icl_nuim.py:84-97 semantics).
        """
        camera_ext = {}
        data = np.genfromtxt(traj_path)
        cano = Isometry(q=Quaternion(axis=[0.0, 0.0, 1.0], degrees=180.0))
        for row in data:
            R = Quaternion(imaginary=row[4:7], real=row[7]).rotation_matrix
            t = row[1:4].copy()
            R[1] = -R[1]
            R[:, 1] = -R[:, 1]
            t[1] = -t[1]
            iso = Isometry(q=Quaternion(matrix=R), t=t)
            camera_ext[row[0]] = cano.dot(iso)
        camera_ext[0] = camera_ext.get(1, next(iter(camera_ext.values())))
        return [camera_ext[t] for t in range(len(camera_ext))]

    def __len__(self):
        return len(self.color_names)

    def load_frame(self, idx: int) -> FrameData:
        """Random-access decode (thread-safe: no reader state touched), so
        a PrefetchSequence can parallelise PNG decoding across threads.

        Frames stay at sensor width (uint8 rgb, uint16 depth counts with
        ``calib.dscale`` counts/metre, 0 = invalid); the jitted frontend
        converts on device — 1.8 MB instead of 4.9 MB host->device per
        640x480 frame, with bit-identical results."""
        import cv2

        depth = cv2.imread(str(self.path / self.depth_names[idx]),
                           cv2.IMREAD_UNCHANGED)
        depth = np.ascontiguousarray(depth.astype(np.uint16))
        rgb = cv2.imread(str(self.path / self.color_names[idx]))
        rgb = np.ascontiguousarray(cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB))

        frame = FrameData()
        frame.gt_pose = (self.gt_trajectory[idx]
                         if self.gt_trajectory is not None else None)
        frame.calib = FrameIntrinsic(*self.CALIB)
        frame.depth = depth
        frame.rgb = rgb
        return frame

    def __next__(self) -> FrameData:
        if self.frame_id >= len(self):
            raise StopIteration
        frame = self.load_frame(self.frame_id)
        self.frame_id += 1
        return frame
