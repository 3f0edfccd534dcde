"""--vis periodic preview artifacts (VERDICT r2 item 10): pipeline.run
with vis=true writes inspectable mesh/trajectory/voxel-block snapshots
under <output>/preview every vis_interval frames."""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

from nerf_fusion_tpu.data.synth import SyntheticSequence
from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.pipeline import FusionPipeline
from nerf_fusion_tpu.utils.config import dict_to_args, parse_config_yaml


@pytest.mark.slow
def test_vis_preview_artifacts(tmp_path):
    args = parse_config_yaml(REPO / "configs" / "fusion-synth.yaml")
    model, margs = load_model(REPO / args.training_hypers, 300)
    args.model = margs
    args.mapping = dict_to_args(args.mapping)
    args.mapping.latent_capacity = 8192
    args.tracking = dict_to_args(args.tracking)
    args.integrate_interval = 4
    args.meshing_interval = 4
    args.max_n_triangles = 1 << 15
    args.vis = True
    args.vis_interval = 4

    seq = SyntheticSequence(n_frames=9, width=320, height=240)
    pipe = FusionPipeline(model, args, point_budget=8192)
    out = tmp_path / "out"
    pipe.run(seq, output_dir=out)

    prev = out / "preview"
    meshes = sorted(prev.glob("mesh_*.ply"))
    trajs = sorted(prev.glob("trajectory_*.txt"))
    blocks = sorted(prev.glob("blocks_*.ply"))
    assert len(meshes) == 2 and len(trajs) == 2 and len(blocks) == 2  # f4, f8
    # trajectory snapshot at frame 4 holds 5 poses
    t4 = np.loadtxt(trajs[0])
    assert t4.shape == (5, 8)
    # block wireframe PLY is non-trivial ascii with edges
    txt = blocks[0].read_text()
    assert "element edge" in txt and len(txt) > 500
    # mesh snapshots are valid binary PLY
    hdr = meshes[1].read_bytes().split(b"end_header")[0].decode()
    assert "element vertex" in hdr
