#!/usr/bin/env python3
"""Online RGB-D implicit fusion entry point (parity: reference main.py).

    python main.py configs/fusion-lr-kt.yaml [--vis 1] [--gt_pose 1]

Consumes the same YAML schema as the reference; runs headless (no Open3D in
this environment) and writes trajectory + mesh + stats into ``--output``.
"""

import importlib
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.pipeline import FusionPipeline
from nerf_fusion_tpu.utils import config as exp_util
from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion


def build_sequence(args):
    seq_package, seq_class = args.sequence_type.split(".")
    module = importlib.import_module("nerf_fusion_tpu.data." + seq_package)
    cls = getattr(module, seq_class)
    seq = cls(load_gt=True, **args.sequence_kwargs)
    # Disk-backed readers get a decode read-ahead thread pool (the hot loop
    # otherwise blocks ~5-15 ms/frame on serial PNG decode); in-memory /
    # device-resident sequences don't need one.
    if getattr(args, "prefetch", True) and hasattr(seq, "load_frame"):
        from nerf_fusion_tpu.data.prefetch import PrefetchSequence
        seq = PrefetchSequence(seq, depth=4, workers=2,
                               upload=bool(getattr(args, "prefetch_upload",
                                                   True)))
    return seq


def main(argv=None):
    parser = exp_util.ArgumentParserX()
    parser.add_argument("--gt_pose", type=int, default=0,
                        help="fuse with ground-truth poses (mapping-only mode)")
    parser.add_argument("--output", type=str, default="output/fusion",
                        help="output directory for trajectory/mesh/stats")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax profiler trace to this directory")
    parser.add_argument("--load_map", type=str, default=None,
                        help="resume fusion from a saved map.npz (the "
                             "reference README's save+reload workflow)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if getattr(args, "vis", False):
        logging.info("Headless visualization: periodic mesh/trajectory/"
                     "voxel-block previews every %s frames under %s/preview",
                     getattr(args, "vis_interval", args.meshing_interval),
                     args.output)

    model, model_args = load_model(args.training_hypers, args.using_epoch)
    args.model = model_args
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    if getattr(args, "sequence_kwargs", {}).get("first_tq") is not None:
        tq = args.sequence_kwargs["first_tq"]
        args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    sequence = build_sequence(args)
    pipeline = FusionPipeline(model, args)
    if args.load_map:
        pipeline.map.load(args.load_map)
        pipeline.map.updated_slots[:] = True  # re-mesh everything once
        logging.info("resumed map from %s (%d voxels occupied)",
                     args.load_map, int(pipeline.map.state.n_occupied))
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
    results = pipeline.run(sequence, use_gt_pose=bool(args.gt_pose),
                           max_frames=args.max_frames, output_dir=args.output)
    if args.profile:
        import jax
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", args.profile)
    logging.info("results: %s", results)
    return results


if __name__ == "__main__":
    main()
