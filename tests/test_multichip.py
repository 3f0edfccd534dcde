"""Multi-device training equivalence + sharding layout tests (8 CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.models.encoder import EncoderConfig
from nerf_fusion_tpu.models.io import build_model
from nerf_fusion_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                           shard_decoder_params)
from nerf_fusion_tpu.trainer.train import make_optimizers, make_train_step
from nerf_fusion_tpu.utils.config import dict_to_args, parse_config_json

from pathlib import Path

CKPT = Path(__file__).resolve().parent.parent / "ckpt/default/hyper.json"


def _setup():
    args = parse_config_json(CKPT)
    model = build_model(args, seed=0)
    enc_cfg = EncoderConfig(args.code_length, model.encoder_config.dims[:-1],
                            bn=args.encoder_specs.get("bn"), mode="train")
    loss_args = dict_to_args(args.training_loss)
    dec_opt, enc_opt = make_optimizers()
    S = 64
    step = make_train_step(model.decoder_config, enc_cfg, loss_args.types,
                           loss_args, S, 1, dec_opt, enc_opt)
    key = jax.random.PRNGKey(0)
    B = 8
    sdf = jax.random.normal(key, (B, S, 4)) * 0.2
    surf = jax.random.normal(jax.random.fold_in(key, 1), (B, 32, 6)) * 0.3
    return args, model, dec_opt, enc_opt, step, sdf, surf


@pytest.mark.slow
def test_dp_training_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    args, model, dec_opt, enc_opt, step, sdf, surf = _setup()
    rng = jax.random.PRNGKey(7)

    def run(mesh):
        # deep-copy buffers: the train step donates its arguments
        cp = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)
        dp = cp(model.decoder_params)
        ep = cp(model.encoder_params)
        bn = cp(model.encoder_bn)
        dos, eos = dec_opt.init(dp), enc_opt.init(ep)
        s, u = sdf, surf
        if mesh is not None:
            dp, ep, bn = replicate(mesh, dp), replicate(mesh, ep), replicate(mesh, bn)
            dos = jax.tree_util.tree_map(
                lambda x: replicate(mesh, {"x": x})["x"], dos)
            eos = jax.tree_util.tree_map(
                lambda x: replicate(mesh, {"x": x})["x"], eos)
            s, u = shard_batch(mesh, (sdf, surf))
        for it in range(2):
            dp, ep, bn, dos, eos, logs, _ = step(dp, ep, bn, dos, eos, s, u,
                                                 rng, 1, 1e-3, 1e-3)
        return jax.device_get(dp), {k: float(v) for k, v in logs.items()}

    p1, l1 = run(None)
    mesh = make_mesh(n_devices=8, tp=1)
    p8, l8 = run(mesh)
    for k in l1:
        assert abs(l1[k] - l8[k]) < 5e-3 * max(1.0, abs(l1[k])), (k, l1, l8)
    d = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(), p1, p8)
    assert max(jax.tree_util.tree_leaves(d)) < 5e-4


def test_tp_sharding_layout():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    args, model, *_ = _setup()
    mesh = make_mesh(n_devices=8, tp=2)
    sharded = shard_decoder_params(mesh, model.decoder_params)
    # square hidden layers got tensor-sharded; input layer stays replicated
    spec1 = sharded["lin1"]["v"].sharding.spec
    assert tuple(spec1) == ("tp", None)
    spec0 = sharded["lin0"]["v"].sharding.spec  # (128, 32): rows shardable
    assert tuple(spec0) == ("tp", None)
    # forward still correct under sharding
    from nerf_fusion_tpu.models.decoder import apply_decoder
    x = jnp.ones((64, 32)) * 0.1
    a, _ = apply_decoder(model.decoder_params, model.decoder_config, x)
    b, _ = apply_decoder(sharded, model.decoder_config, x)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
