"""Conditional SDF decoder with an uncertainty head (pure-JAX pytree module).

Architecture parity with the reference DeepSDF-style decoder
(reference: network/di_decoder.py:9-86):
  * input  = concat(latent (L,), xyz (3,)) of width ``L+3``
  * hidden dims from config (default [128,128,128,128]); the layer feeding a
    ``latent_in`` layer shrinks its output by ``L+3`` so the re-injected
    input keeps the width constant (di_decoder.py:32-35)
  * weight-normalised Linear layers (g * v / ||v||_row)
  * the last hidden activation branches to ``std = 0.05 + 0.5*softplus(u)``
    (di_decoder.py:66-68); the SDF output passes through tanh
  * dropout p on the listed layers during training only.

Implemented as explicit param/``apply`` functions (no flax) so the whole
decoder can be inlined into the tracker's Gauss-Newton jit and
differentiated w.r.t. query positions with ``jax.grad``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, fan_in: int, fan_out: int):
    """Match torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(wkey, (fan_out, fan_in), minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound)
    return w, b


class DecoderConfig:
    def __init__(self, latent_size: int, dims: Sequence[int], dropout=None,
                 dropout_prob: float = 0.0, norm_layers=(), latent_in=(),
                 weight_norm: bool = False):
        self.latent_size = latent_size
        self.dims = [latent_size + 3] + list(dims) + [1]
        self.num_layers = len(self.dims)
        self.dropout = list(dropout) if dropout is not None else None
        self.dropout_prob = dropout_prob
        self.norm_layers = list(norm_layers)
        self.latent_in = list(latent_in)
        self.weight_norm = weight_norm

    def layer_shapes(self):
        """Yield (layer_idx, in_dim, out_dim) for each Linear."""
        for layer in range(self.num_layers - 1):
            # in_dim is always dims[layer]: the layer *before* a latent_in
            # layer already shrank its output by dims[0] (di_decoder.py:32-35),
            # so after re-concatenation the width is back to dims[layer].
            in_dim = self.dims[layer]
            out_dim = self.dims[layer + 1]
            if layer + 1 in self.latent_in:
                out_dim -= self.dims[0]
            yield layer, in_dim, out_dim


def init_decoder(key, config: DecoderConfig):
    """Create the parameter pytree: {'lin{i}': {v,g,b} | {w,b}, 'unc': {w,b}}."""
    params = {}
    keys = jax.random.split(key, config.num_layers)
    for layer, in_dim, out_dim in config.layer_shapes():
        w, b = _linear_init(keys[layer], in_dim, out_dim)
        if config.weight_norm and layer in config.norm_layers:
            g = jnp.linalg.norm(w, axis=1)
            params[f"lin{layer}"] = {"v": w, "g": g, "b": b}
        else:
            params[f"lin{layer}"] = {"w": w, "b": b}
    uw, ub = _linear_init(keys[-1], config.dims[-2], 1)
    params["unc"] = {"w": uw, "b": ub}
    return params


# Named matmul precisions for the decoder's Linear layers.  HIGH (bf16x3
# passes) is the default: f32-equivalent accuracy at half the cost of
# HIGHEST (6 passes); jax's DEFAULT (1 bf16 pass) loses ~3 decimal digits,
# which measurably hurts the tracker's Jacobians — but is fine for bulk
# consumers that only threshold the SDF (e.g. the mesher's sample grids).
PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _apply_linear(p: dict, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    if "v" in p:  # weight-normalised
        v = p["v"]
        w = p["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = p["w"]
    if precision is None:
        precision = jax.lax.Precision.HIGH
    return jnp.matmul(x, w.T, precision=precision) + p["b"]


def apply_decoder(params: dict, config: DecoderConfig, net_input: jnp.ndarray,
                  train: bool = False, rng=None, precision=None):
    """Forward (N, L+3) -> (sdf (N,1), std (N,1)).

    Mirrors the reference forward exactly (di_decoder.py:55-86): latent_in
    concatenation happens *before* the listed layer; the uncertainty branch
    reads the activation entering the final Linear.
    """
    x = net_input
    std = None
    n_lin = config.num_layers - 1
    for layer in range(n_lin):
        if layer in config.latent_in:
            x = jnp.concatenate([x, net_input], axis=1)
        if layer == n_lin - 1:
            std = 0.05 + 0.5 * jax.nn.softplus(
                _apply_linear(params["unc"], x, precision))
        x = _apply_linear(params[f"lin{layer}"], x, precision)
        if layer < n_lin - 1:
            x = jax.nn.relu(x)
            if train and config.dropout is not None and layer in config.dropout \
                    and config.dropout_prob > 0.0:
                rng, sub = jax.random.split(rng)
                keep = 1.0 - config.dropout_prob
                mask = jax.random.bernoulli(sub, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
    return jnp.tanh(x), std


def decoder_param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
