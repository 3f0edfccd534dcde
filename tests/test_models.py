"""Model tests: shapes/invariants + golden parity against the reference torch nets."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.models.decoder import DecoderConfig, apply_decoder, init_decoder
from nerf_fusion_tpu.models.encoder import EncoderConfig, apply_encoder, init_encoder
from nerf_fusion_tpu.models.io import Networks, build_model, import_torch_checkpoint
from nerf_fusion_tpu.utils.config import dict_to_args, parse_config_json

REF_CKPT = Path("/root/reference/ckpt/default")

DEC_SPECS = dict(dims=[128, 128, 128, 128], dropout=[0, 1, 2, 3, 4, 5],
                 dropout_prob=0.2, norm_layers=[0, 1, 2, 3, 4, 5],
                 latent_in=[3], weight_norm=True)


def _decoder():
    cfg = DecoderConfig(29, **DEC_SPECS)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_decoder_shapes_and_range():
    cfg, params = _decoder()
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 32))
    sdf, std = apply_decoder(params, cfg, x)
    assert sdf.shape == (17, 1) and std.shape == (17, 1)
    assert np.all(np.abs(np.asarray(sdf)) <= 1.0)       # tanh output
    assert np.all(np.asarray(std) > 0.05)               # 0.05 + softplus/2


def test_decoder_param_count_matches_reference():
    # Same parameterisation as the reference torch net (weight-norm v/g/b per
    # layer + uncertainty head): 50,371 scalars.
    cfg, params = _decoder()
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n == 50371


def test_decoder_grad_wrt_xyz():
    cfg, params = _decoder()
    latent = jnp.zeros((1, 29))

    def f(xyz):
        sdf, _ = apply_decoder(params, cfg, jnp.concatenate([latent, xyz[None]], axis=1))
        return sdf[0, 0]

    g = jax.grad(f)(jnp.asarray([0.1, 0.2, 0.3]))
    assert g.shape == (3,) and not np.any(np.isnan(np.asarray(g)))


def test_encoder_modes():
    cfg_t = EncoderConfig(29, [6, 32, 64, 256], bn={"class": "BatchNorm"}, mode="train")
    params, bn = init_encoder(jax.random.PRNGKey(0), cfg_t)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128, 6))
    lat, new_bn = apply_encoder(params, bn, cfg_t, x, train=True)
    assert lat.shape == (4, 29)
    assert not np.allclose(np.asarray(new_bn["layer0"]["mean"]), 0.0)

    cfg_c = EncoderConfig(29, [6, 32, 64, 256], bn={"class": "BatchNorm"}, mode="cnp")
    pts = jax.random.normal(jax.random.PRNGKey(2), (100, 6))
    lat_c, _ = apply_encoder(params, bn, cfg_c, pts, train=False)
    assert lat_c.shape == (100, 29)


def test_encoder_masked_pool():
    cfg = EncoderConfig(29, [6, 32, 64, 256], bn={"class": "BatchNorm"}, mode="train")
    params, bn = init_encoder(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 6))
    mask = jnp.ones((2, 16)).at[:, 8:].set(0.0)
    lat_m, _ = apply_encoder(params, bn, cfg, x, train=False, point_mask=mask)
    lat_h, _ = apply_encoder(params, bn, cfg, x[:, :8], train=False)
    assert np.allclose(np.asarray(lat_m), np.asarray(lat_h), atol=1e-5)


# ---------------------------------------------------------------------------
# Golden parity vs the shipped reference checkpoint (torch cpu available).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_model():
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not present")
    args = parse_config_json(REF_CKPT / "hyper.json")
    model = build_model(args)
    import_torch_checkpoint(model, REF_CKPT / "model_300.pth.tar",
                            REF_CKPT / "encoder_300.pth.tar")
    return model


def test_decoder_parity_with_torch(ref_model):
    import torch

    state = torch.load(REF_CKPT / "model_300.pth.tar", map_location="cpu",
                       weights_only=False)["model_state"]

    state = {k: v.double() for k, v in state.items()}
    rng = np.random.RandomState(0)
    x = rng.randn(64, 32).astype(np.float64) * 0.5

    # torch forward re-implemented from the loaded tensors (eval mode, no dropout)
    def torch_linear(name, inp):
        if f"{name}.weight_v" in state:
            v, g = state[f"{name}.weight_v"], state[f"{name}.weight_g"]
            w = g * v / v.norm(dim=1, keepdim=True)
        else:
            w = state[f"{name}.weight"]
        return inp @ w.T + state[f"{name}.bias"]

    xt = torch.from_numpy(x)
    h = xt
    for layer in range(5):
        if layer == 3:
            h = torch.cat([h, xt], dim=1)
        if layer == 4:
            std_t = 0.05 + 0.5 * torch.nn.functional.softplus(torch_linear("uncertainty_layer", h))
        h = torch_linear(f"lin{layer}", h)
        if layer < 4:
            h = torch.relu(h)
    sdf_t = torch.tanh(h)

    # The f32 net is ill-conditioned across 5 layers (tiny weight diffs amplify
    # ~1e3x), so the strict comparison runs in f64.
    with jax.enable_x64():
        params64 = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                                          ref_model.decoder_params)
        sdf_j, std_j = apply_decoder(params64, ref_model.decoder_config, jnp.asarray(x))
        assert np.allclose(np.asarray(sdf_j), sdf_t.numpy(), atol=1e-9)
        assert np.allclose(np.asarray(std_j), std_t.numpy(), atol=1e-9)


def test_encoder_parity_with_torch(ref_model):
    import torch

    state = torch.load(REF_CKPT / "encoder_300.pth.tar", map_location="cpu",
                       weights_only=False)["model_state"]
    rng = np.random.RandomState(1)
    x = rng.randn(50, 6).astype(np.float32)

    h = torch.from_numpy(x)
    for i in range(4):
        w = state[f"mlp.layer{i}.conv.weight"][:, :, 0]
        h = h @ w.T
        if f"mlp.layer{i}.conv.bias" in state:
            h = h + state[f"mlp.layer{i}.conv.bias"]
        if f"mlp.layer{i}.normlayer.bn.weight" in state:
            mean = state[f"mlp.layer{i}.normlayer.bn.running_mean"]
            var = state[f"mlp.layer{i}.normlayer.bn.running_var"]
            h = (h - mean) / torch.sqrt(var + 1e-5)
            h = h * state[f"mlp.layer{i}.normlayer.bn.weight"] + state[f"mlp.layer{i}.normlayer.bn.bias"]
        if i < 3:
            h = torch.relu(h)

    cfg = EncoderConfig(29, [6, 32, 64, 256], bn={"class": "BatchNorm"}, mode="cnp")
    # f64 on the JAX side (like the decoder parity test): the remaining diff
    # is torch's own f32 rounding, so the tolerance is platform-independent
    # (f32 HIGH on TPU is bf16x3 and misses 3e-5).
    with jax.enable_x64():
        params64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64),
            (ref_model.encoder_params, ref_model.encoder_bn))
        lat_j, _ = apply_encoder(params64[0], params64[1], cfg,
                                 jnp.asarray(x, jnp.float64), train=False)
        assert np.allclose(np.asarray(lat_j), h.numpy(), atol=3e-5)
