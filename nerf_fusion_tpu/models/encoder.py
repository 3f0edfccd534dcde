"""PointNet-style point encoder (pure-JAX pytree module).

Capability parity with the reference encoder (network/di_encoder.py:6-32 +
utils/pt_util.py SharedMLP): a shared per-point MLP ``per_point_feat + [L]``
(1x1 Conv1d stack in torch == plain matmuls here) with BatchNorm+ReLU after
every layer except the last (``last_act=False``), then

  * ``train`` mode: mean-pool over the per-voxel point set -> (B, L)
  * ``cnp``   mode (online fusion): per-point latents (N, L); the mean-pool
    is done outside by a masked segment-sum over voxels
    (see nerf_fusion_tpu.system.map).

BatchNorm runs in the torch semantics: batch statistics during training
(biased variance for normalisation, unbiased for the running estimate,
momentum 0.1), running statistics at inference.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


class EncoderConfig:
    def __init__(self, latent_size: int, per_point_feat: Sequence[int], bn=None,
                 mode: str = "cnp"):
        assert mode in ("train", "cnp")
        self.latent_size = latent_size
        self.dims = list(per_point_feat) + [latent_size]
        self.use_bn = bn is not None
        self.mode = mode

    @property
    def n_layers(self):
        return len(self.dims) - 1

    def has_bn(self, layer: int) -> bool:
        # last_act=False in the reference: no BN/activation on the final layer.
        return self.use_bn and layer < self.n_layers - 1


def init_encoder(key, config: EncoderConfig):
    """Params: {'layer{i}': {w,(b)}, ...}; BN state: {'layer{i}': {scale,bias,mean,var}}."""
    params, bn_state = {}, {}
    keys = jax.random.split(key, config.n_layers)
    for i in range(config.n_layers):
        fan_in, fan_out = config.dims[i], config.dims[i + 1]
        bound = 1.0 / math.sqrt(fan_in)
        wkey, bkey = jax.random.split(keys[i])
        w = jax.random.uniform(wkey, (fan_out, fan_in), minval=-bound, maxval=bound)
        layer_p = {"w": w}
        if config.has_bn(i):
            # Conv carries no bias when followed by BN (pt_util.py Conv1d).
            params[f"layer{i}"] = layer_p
            bn_state[f"layer{i}"] = {
                "scale": jnp.ones(fan_out), "bias": jnp.zeros(fan_out),
                "mean": jnp.zeros(fan_out), "var": jnp.ones(fan_out),
            }
        else:
            layer_p["b"] = jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound)
            params[f"layer{i}"] = layer_p
    return params, bn_state


def apply_encoder(params: dict, bn_state: dict, config: EncoderConfig,
                  x: jnp.ndarray, train: bool = False, point_mask=None):
    """Forward the shared MLP.

    :param x: ``train`` mode: (B, N, F) voxel point sets; ``cnp`` mode: (N, F).
    :param point_mask: optional (N,) / (B, N) validity mask. Masked points are
        zeroed before BN statistics and excluded from the train-mode mean-pool
        (needed because TPU batches are padded to static shapes).
    :return: (latents, new_bn_state). latents: (B, L) in train mode, (N, L)
        in cnp mode.
    """
    squeeze_back = x.ndim == 2
    if squeeze_back:
        x = x[None]  # (1, N, F)
        if point_mask is not None:
            point_mask = point_mask[None]
    new_bn = {}
    h = x
    for i in range(config.n_layers):
        p = params[f"layer{i}"]
        # HIGH (bf16x3) keeps f32-equivalent accuracy; DEFAULT (1 bf16 pass)
        # is too lossy for the fusion path feeding the tracker.
        h = jnp.einsum("bnf,gf->bng", h, p["w"], precision=jax.lax.Precision.HIGH)
        if "b" in p:
            h = h + p["b"]
        if config.has_bn(i):
            s = bn_state[f"layer{i}"]
            if train:
                if point_mask is not None:
                    w = point_mask[..., None].astype(h.dtype)
                    cnt = jnp.maximum(jnp.sum(w), 1.0)
                    mean = jnp.sum(h * w, axis=(0, 1)) / cnt
                    var = jnp.sum(w * (h - mean) ** 2, axis=(0, 1)) / cnt
                    unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                else:
                    mean = jnp.mean(h, axis=(0, 1))
                    var = jnp.var(h, axis=(0, 1))
                    cnt = h.shape[0] * h.shape[1]
                    unbiased = var * cnt / max(cnt - 1, 1)
                new_bn[f"layer{i}"] = {
                    "scale": s["scale"], "bias": s["bias"],
                    "mean": (1 - _BN_MOMENTUM) * s["mean"] + _BN_MOMENTUM * mean,
                    "var": (1 - _BN_MOMENTUM) * s["var"] + _BN_MOMENTUM * unbiased,
                }
            else:
                mean, var = s["mean"], s["var"]
                new_bn[f"layer{i}"] = s
            h = (h - mean) * jax.lax.rsqrt(var + _BN_EPS) * s["scale"] + s["bias"]
        if i < config.n_layers - 1:
            h = jax.nn.relu(h)

    if config.mode == "train":
        if point_mask is not None:
            w = point_mask[..., None].astype(h.dtype)
            out = jnp.sum(h * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
        else:
            out = jnp.mean(h, axis=1)
    else:
        out = h
    if squeeze_back:
        out = out[0]
    return out, new_bn
