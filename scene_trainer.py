#!/usr/bin/env python3
"""Per-scene trainer entry point: fit the prior from an RGB-D sequence.

    python scene_trainer.py configs/train_scannet.yaml

Working equivalent of the capability the reference's yc_trainer.py gestures
at but cannot run (it references undefined variables; SURVEY.md §2.4).
"""

import importlib
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from nerf_fusion_tpu.trainer.scene import train_scene
from nerf_fusion_tpu.utils import config as exp_util


def build_sequence(args):
    seq_package, seq_class = args.sequence_type.split(".")
    module = importlib.import_module("nerf_fusion_tpu.data." + seq_package)
    return getattr(module, seq_class)(load_gt=True, **args.sequence_kwargs)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = exp_util.ArgumentParserX(add_hyper_arg=True)
    parser.add_argument("--max_frames", type=int, default=None)
    args = parser.parse_args(argv)
    sequence = build_sequence(args)
    model, save_dir = train_scene(args, sequence, max_frames=args.max_frames)
    logging.info("scene training complete; checkpoints in %s", save_dir)
    return save_dir


if __name__ == "__main__":
    main()
