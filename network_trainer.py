#!/usr/bin/env python3
"""Encoder-decoder training entry point (parity: reference network_trainer.py).

    python network_trainer.py configs/train-cnp.yaml

Data parallelism: pass --dp N to shard batches over the first N devices
(multi-chip ICI all-reduce via jit's partitioner).
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from nerf_fusion_tpu.trainer.train import train
from nerf_fusion_tpu.utils import config as exp_util


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = exp_util.ArgumentParserX(add_hyper_arg=True)
    parser.add_argument("--dp", type=int, default=0,
                        help="data-parallel degree (0 = single device)")
    parser.add_argument("--resume", type=int, default=None,
                        help="resume from this snapshot epoch in the run dir")
    args = parser.parse_args(argv)

    mesh = None
    if args.dp and args.dp > 1:
        from nerf_fusion_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_devices=args.dp, tp=1)
    model, save_dir = train(args, mesh=mesh, resume_epoch=args.resume)
    logging.info("training complete; checkpoints in %s", save_dir)
    return save_dir


if __name__ == "__main__":
    main()
