#!/usr/bin/env python3
"""True device time of the training step + the HBM-resident batch sampler
(device-loop protocol).  Earlier per-step walls (60 ms "steady") were
measured through a loaded tunnel; this separates device time from
dispatch/link effects.

    python tools/train_prof.py [--data ../di-datasets/simple_plivoxs]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def device_ms(name, fn, K=8, repeats=4):
    import jax
    import jax.numpy as jnp

    def leaf_contrib(leaf):
        x = jnp.asarray(leaf)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.where(jnp.isfinite(x), x, 0.0)
            return jnp.sum(x).astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
            return jnp.sum(x).astype(jnp.float32)
        return jnp.asarray(0.0)

    @jax.jit
    def run(k, eps0):
        def body(_, acc):
            out = fn(acc)
            c = sum(leaf_contrib(l) for l in jax.tree_util.tree_leaves(out))
            return acc + jnp.clip(c * 1e-20, -1e-8, 1e-8)
        return jax.lax.fori_loop(0, k, body, eps0)

    np.asarray(run(1, np.float32(0.0)))

    def timed(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(k, np.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (timed(2 * K) - timed(K)) / K * 1e3
    print(f"{name:48s} {ms:8.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="../di-datasets/simple_plivoxs")
    ap.add_argument("--batch", type=int, default=64)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.device_lif import DeviceLifDataset
    from nerf_fusion_tpu.data.lif_dataset import LifDataset
    from nerf_fusion_tpu.models.encoder import EncoderConfig
    from nerf_fusion_tpu.models.io import build_model
    from nerf_fusion_tpu.trainer.train import make_optimizers, make_train_step
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.config import dict_to_args

    repo = Path(__file__).resolve().parent.parent
    args = exp_util.parse_config_yaml(repo / "configs" / "train-cnp.yaml")
    base = LifDataset(data_path=cli.data, num_sample=args.samples_per_lif,
                      **{k: v for k, v in args.train_set[0].items()
                         if k != "data_path"})
    ds = DeviceLifDataset(base)
    print(f"dataset: {len(ds)} LIFs, pools {ds.hbm_bytes / 1e9:.2f} GB in HBM")

    model = build_model(args, seed=0)
    enc_cfg_train = EncoderConfig(args.code_length,
                                  model.encoder_config.dims[:-1],
                                  bn=args.encoder_specs.get("bn"),
                                  mode="train")
    loss_args = dict_to_args(args.training_loss)
    dec_opt, enc_opt = make_optimizers()
    dec_os = dec_opt.init(model.decoder_params)
    enc_os = enc_opt.init(model.encoder_params)
    step = make_train_step(model.decoder_config, enc_cfg_train,
                           loss_args.types, loss_args,
                           args.samples_per_lif, args.batch_split,
                           dec_opt, enc_opt)

    B = cli.batch
    rng = jax.random.PRNGKey(0)
    idx = jnp.arange(B, dtype=jnp.int32) % len(ds)

    def sample_only(eps):
        key = jax.random.fold_in(rng, 1)
        return ds.sample(key, idx + (eps * 0).astype(jnp.int32))

    device_ms(f"device sample_batch (B={B})", sample_only)

    sdf_data, surface_data = ds.sample(rng, idx)
    dp0, ep0, bn0 = model.decoder_params, model.encoder_params, model.encoder_bn

    def full_step(eps):
        out = step(jax.tree_util.tree_map(lambda x: x + 0, dp0),
                   jax.tree_util.tree_map(lambda x: x + 0, ep0),
                   jax.tree_util.tree_map(lambda x: x + 0, bn0),
                   jax.tree_util.tree_map(lambda x: x, dec_os),
                   jax.tree_util.tree_map(lambda x: x, enc_os),
                   sdf_data + eps, surface_data, rng,
                   jnp.asarray(100), jnp.asarray(1e-3), jnp.asarray(1e-3))
        return out[5]  # logs only (small loop carry)

    device_ms(f"train_step (B={B}, {args.samples_per_lif} sdf/LIF)",
              full_step, K=4, repeats=3)


if __name__ == "__main__":
    main()
