"""Fused Pallas MLP kernels vs the reference JAX implementations (interpret mode)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# On CPU the interpret-mode kernel and the XLA reference are both exact
# f32 -> tight tolerance.  On TPU both are independent bf16x3 pipelines and
# the deep tanh net amplifies their rounding differences.
_ON_CPU = jax.devices()[0].platform == "cpu"
_ATOL = 4e-3 if _ON_CPU else 1.2e-1
_MED = 1e-4 if _ON_CPU else 5e-3

from nerf_fusion_tpu.models.decoder import apply_decoder
from nerf_fusion_tpu.models.encoder import apply_encoder
from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.ops.pallas_mlp import (decoder_forward_pallas,
                                            decoder_is_fusable,
                                            encoder_forward_pallas)

CKPT = Path(__file__).resolve().parent.parent / "ckpt/default/hyper.json"


@pytest.fixture(scope="module")
def model():
    m, _ = load_model(CKPT, 300)
    return m


def test_decoder_fusable(model):
    assert decoder_is_fusable(model.decoder_config)


def test_decoder_pallas_matches_xla(model):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1500, 32).astype(np.float32) * 0.4)
    sdf_ref, std_ref = apply_decoder(model.decoder_params, model.decoder_config, x)
    sdf_p, std_p = decoder_forward_pallas(model.decoder_params,
                                          model.decoder_config, x, interpret=True)
    assert sdf_p.shape == (1500, 1)
    err = np.abs(np.asarray(sdf_p) - np.asarray(sdf_ref))
    assert err.max() < _ATOL and np.median(err) < _MED, (err.max(), np.median(err))
    serr = np.abs(np.asarray(std_p) - np.asarray(std_ref))
    assert serr.max() < _ATOL


def test_encoder_pallas_matches_xla(model):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2100, 6).astype(np.float32))
    lat_ref, _ = apply_encoder(model.encoder_params, model.encoder_bn,
                               model.encoder_config, x, train=False)
    lat_p = encoder_forward_pallas(model.encoder_params, model.encoder_bn,
                                   model.encoder_config, x, interpret=True)
    assert lat_p.shape == (2100, 29)
    err = np.abs(np.asarray(lat_p) - np.asarray(lat_ref))
    assert err.max() < _ATOL and np.median(err) < _MED, (err.max(), np.median(err))
