#!/usr/bin/env python3
"""LIF dataset generation entry point (parity: reference data_generator.py).

    python data_generator.py configs/data-simple.yaml [--nproc 4]
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from nerf_fusion_tpu.data.generator import run_generator
from nerf_fusion_tpu.utils import config as exp_util


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    exp_util.init_seed(4)
    parser = exp_util.ArgumentParserX(add_hyper_arg=True,
                                      description="TPU-native LIF data generator")
    args = parser.parse_args(argv)
    return run_generator(args)


if __name__ == "__main__":
    main()
