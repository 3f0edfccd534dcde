"""Checkpoint torch export/import roundtrip."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.models.decoder import apply_decoder
from nerf_fusion_tpu.models.encoder import apply_encoder
from nerf_fusion_tpu.models.io import (build_model, export_torch_checkpoint,
                                       import_torch_checkpoint, load_model)

CKPT = Path(__file__).resolve().parent.parent / "ckpt/default/hyper.json"


@pytest.mark.slow
def test_torch_export_import_roundtrip(tmp_path):
    model, margs = load_model(CKPT, 300)
    export_torch_checkpoint(model, tmp_path / "model_1.pth.tar",
                            tmp_path / "encoder_1.pth.tar", epoch=1)
    model2 = build_model(margs)
    import_torch_checkpoint(model2, tmp_path / "model_1.pth.tar",
                            tmp_path / "encoder_1.pth.tar")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.4)
    a, sa = apply_decoder(model.decoder_params, model.decoder_config, x)
    b, sb = apply_decoder(model2.decoder_params, model2.decoder_config, x)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.allclose(np.asarray(sa), np.asarray(sb), atol=1e-6)

    pts = jnp.asarray(rng.randn(50, 6).astype(np.float32))
    la, _ = apply_encoder(model.encoder_params, model.encoder_bn,
                          model.encoder_config, pts)
    lb, _ = apply_encoder(model2.encoder_params, model2.encoder_bn,
                          model2.encoder_config, pts)
    assert np.allclose(np.asarray(la), np.asarray(lb), atol=1e-6)

    # key layout matches the reference state dicts exactly
    import torch
    ref = torch.load("/root/reference/ckpt/default/model_300.pth.tar",
                     map_location="cpu", weights_only=False)["model_state"]
    ours = torch.load(tmp_path / "model_1.pth.tar", map_location="cpu",
                      weights_only=False)["model_state"]
    assert set(ref.keys()) == set(ours.keys())
    for k in ref:
        assert tuple(ref[k].shape) == tuple(ours[k].shape), k
