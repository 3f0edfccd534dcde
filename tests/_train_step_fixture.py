"""Shared tiny-train-step builder for the multi-process distributed test.

Both the single-process reference and every jax.distributed worker build
the SAME deterministic step (real make_train_step path, fixed seeds, no
dropout so the rng stream is layout-independent) so parameter agreement
across process topologies is a pure sharding-correctness check.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, S, M = 8, 32, 16


def build_tiny_step():
    import jax

    from nerf_fusion_tpu.models.encoder import EncoderConfig
    from nerf_fusion_tpu.models.io import build_model
    from nerf_fusion_tpu.trainer.train import make_optimizers, make_train_step
    from nerf_fusion_tpu.utils.config import dict_to_args

    args = dict_to_args(dict(
        code_length=8, code_bound=None,
        network_name="di_decoder",
        network_specs={"dims": [16, 16], "dropout": [], "dropout_prob": 0.0,
                       "norm_layers": [], "latent_in": [1],
                       "weight_norm": True},
        encoder_name="di_encoder",
        encoder_specs={"per_point_feat": [6, 8, 16],
                       "bn": {"class": "BatchNorm"}},
        training_loss={"types": ["neg_log_likelihood", "reg_loss"],
                       "enforce_minmax": True, "clamping_distance": 0.2,
                       "code_reg_lambda": 1e-2}))
    model = build_model(args, seed=0)
    enc_cfg_train = EncoderConfig(args.code_length,
                                  model.encoder_config.dims[:-1],
                                  bn=args.encoder_specs.get("bn"),
                                  mode="train")
    loss_args = dict_to_args(args.training_loss)
    dec_opt, enc_opt = make_optimizers()
    step_fn = make_train_step(model.decoder_config, enc_cfg_train,
                              loss_args.types, loss_args, S, 1,
                              dec_opt, enc_opt)
    params0 = dict(dec=model.decoder_params, enc=model.encoder_params,
                   bn=model.encoder_bn,
                   dec_opt=dec_opt.init(model.decoder_params),
                   enc_opt=enc_opt.init(model.encoder_params))

    def step(params, sdf, surf):
        import jax.numpy as jnp

        key = jax.random.PRNGKey(7)
        (dec, enc, bn, dopt, eopt, logs, _) = step_fn(
            params["dec"], params["enc"], params["bn"],
            params["dec_opt"], params["enc_opt"], sdf, surf, key,
            jnp.asarray(1), 1e-3, 1e-3)
        new = dict(dec=dec, enc=enc, bn=bn, dec_opt=dopt, enc_opt=eopt)
        return new, logs[sorted(logs)[0]]

    return step, params0


def make_batch():
    rng = np.random.RandomState(0)
    sdf = (rng.rand(B, S, 4).astype(np.float32) - 0.5) * 0.4
    surf = np.concatenate([
        (rng.rand(B, M, 3).astype(np.float32) - 0.5) * 0.6,
        rng.randn(B, M, 3).astype(np.float32)], axis=-1)
    surf[..., 3:6] /= np.linalg.norm(surf[..., 3:6], axis=-1, keepdims=True)
    return sdf, surf
