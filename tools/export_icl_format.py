#!/usr/bin/env python3
"""Export a sequence to the ICL-NUIM on-disk layout.

Writes ``rgb/%d.png`` (uint8), ``depth/%d.png`` (uint16, 1/5000 m) and a
TUM-format ``groundtruth.freiburg`` encoded so that
``data.icl_nuim.ICLNUIMSequence`` (with the matching ``first_tq``) recovers
the ORIGINAL poses exactly — i.e. it inverts the reader's Y-flip +
180-degree-Z canonicalisation (icl_nuim.py parsing semantics).

Used to validate the real-data path hermetically (synthetic frames round-
tripped through the exact disk format + reader the lr-kt demo uses), and to
convert any supported sequence into ICL-NUIM layout.

    python tools/export_icl_format.py <out_dir> [--n_frames 30] [--width 320]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion


def encode_tum_pose(iso: Isometry) -> np.ndarray:
    """Pose -> TUM row fields (tx ty tz qx qy qz qw) the reader will invert."""
    cano_inv = Isometry(q=Quaternion(axis=[0.0, 0.0, 1.0], degrees=180.0)).inv()
    pre = cano_inv.dot(iso)
    F = np.diag([1.0, -1.0, 1.0])
    R_tum = F @ pre.q.rotation_matrix @ F
    t_tum = F @ pre.t
    q = Quaternion(matrix=R_tum).q  # (w, x, y, z)
    return np.concatenate([t_tum, [q[1], q[2], q[3], q[0]]])


def export_sequence(sequence, out_dir, depth_scale=5000.0):
    import cv2

    out = Path(out_dir)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(parents=True, exist_ok=True)
    rows = []
    first_tq = None
    for i in range(len(sequence)):
        frame = next(sequence)
        rgb = np.asarray(frame.rgb)
        depth = np.asarray(frame.depth)
        if rgb.dtype != np.uint8:           # float [0,1] frames
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(out / "rgb" / f"{i}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        if depth.dtype == np.uint16:
            # raw counts at the SOURCE sequence's scale: re-quantise to the
            # ICL layout's depth_scale (counts/metre) when they differ
            src_scale = float(getattr(frame.calib, "dscale", depth_scale))
            if src_scale != depth_scale:
                depth = np.where(depth == 0, np.nan,
                                 depth.astype(np.float32) / src_scale)
        if depth.dtype != np.uint16:        # float metres (NaN invalid)
            depth = np.clip(np.nan_to_num(depth, nan=0.0) * depth_scale,
                            0, 65535).astype(np.uint16)
        cv2.imwrite(str(out / "depth" / f"{i}.png"), depth)
        pose = frame.gt_pose
        # Row id i maps to frame i in the reader; row 0 is ignored (the
        # reader overwrites frame 0's pose with row 1's — reference parser
        # quirk), so the anchor pose (first_tq) is frame 1's.
        rows.append(np.concatenate([[i], encode_tum_pose(pose)]))
        if i == 1:
            first_tq = list(pose.t) + list(pose.q.q)  # t + (w,x,y,z)
    np.savetxt(out / "groundtruth.freiburg", np.stack(rows),
               fmt="%.0f " + " ".join(["%.9f"] * 7))
    return first_tq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()
    from nerf_fusion_tpu.data.synth import SyntheticSequence

    seq = SyntheticSequence(n_frames=args.n_frames, width=args.width,
                            height=args.height)
    first_tq = export_sequence(seq, args.out_dir)
    print("first_tq:", [round(float(x), 6) for x in first_tq])


if __name__ == "__main__":
    main()
