#!/usr/bin/env python3
"""End-to-end demo / smoke script (debug.ipynb capability parity, headless).

Runs a short synthetic fusion, then exports every visual the reference's
GUI shows (main.py:75-100) as PLY artifacts:

    python tools/demo.py [out_dir]

  out/mesh.ply            uncertainty-colored reconstruction
  out/blocks.ply          allocated voxel-block wireframe (edges)
  out/trajectory.ply      camera trajectory polyline
  out/camera.ply          last-frame frustum
  out/samples.ply         dense SDF sample cloud (debug visuals)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(out_dir="output/demo"):
    from nerf_fusion_tpu.data.synth import SyntheticSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils import vis

    root = Path(__file__).resolve().parent.parent
    args = exp_util.parse_config_yaml(root / "configs" / "fusion-synth.yaml")
    model, margs = load_model(root / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)

    seq = SyntheticSequence(n_frames=40, width=320, height=240)
    pipe = FusionPipeline(model, args, point_budget=16384)
    for i in range(len(seq)):
        pipe.process_frame(next(seq), i)
    traj = pipe.trajectory()

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pipe.mesher.extract(args.resolution, max_std=0.15)
    pipe.mesher.save_ply(out / "mesh.ply")
    vis.save_lineset_ply(out / "blocks.ply",
                         pipe.map.get_fast_preview_visuals()[0])
    vis.save_lineset_ply(out / "trajectory.ply",
                         vis.trajectory([p.t for p in traj]))
    vis.save_lineset_ply(out / "camera.ply", vis.camera(traj[-1]))

    visuals = pipe.map.get_map_visuals(return_samples=True, voxel_resolution=4)
    if visuals["samples"]:
        pc = visuals["samples"][0]
        with (out / "samples.ply").open("w") as f:
            pts, cols = pc["points"], (pc["colors"] * 255).astype(np.uint8)
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
            f.write("end_header\n")
            for p, c in zip(pts, cols):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
    print("demo artifacts in", out)
    if getattr(seq, "gt_trajectory", None):
        from nerf_fusion_tpu.utils.evaluate import ate_rmse
        print("ATE-RMSE:", round(ate_rmse(traj, seq.gt_trajectory), 5), "m")


if __name__ == "__main__":
    main(*sys.argv[1:2])
