"""Layer-factory zoo: generic MLP / SharedMLP builders (pt_util parity).

The reference's utils/pt_util.py provides a configurable stack of
FC/Conv1d/SharedMLP factories used to assemble point networks.  These are
the pure-JAX equivalents: a spec list of widths builds a parameter pytree
and an apply function; ``shared_mlp`` is the PointNet-style per-point MLP
(the reference realises it as 1x1 Conv1d stacks).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGH


def _init_linear(key, fan_in, fan_out, bias=True):
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    p = {"w": jax.random.uniform(wk, (fan_out, fan_in), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (fan_out,), minval=-bound, maxval=bound)
    return p


def init_mlp(key, dims: Sequence[int], bn: bool = False):
    """Param pytree for an MLP ``dims[0] -> ... -> dims[-1]``.

    With ``bn``, hidden layers carry affine-norm state (folded LayerNorm
    semantics at apply time).
    """
    params = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        params[f"layer{i}"] = _init_linear(keys[i], dims[i], dims[i + 1],
                                           bias=not (bn and i < len(dims) - 2))
        if bn and i < len(dims) - 2:
            params[f"norm{i}"] = {"scale": jnp.ones(dims[i + 1]),
                                  "bias": jnp.zeros(dims[i + 1])}
    return params


def apply_mlp(params, dims: Sequence[int], x, last_act: bool = False,
              activation=jax.nn.relu):
    """Apply an init_mlp stack to (..., dims[0]) inputs."""
    n = len(dims) - 1
    for i in range(n):
        p = params[f"layer{i}"]
        x = jnp.matmul(x, p["w"].T, precision=_HI)
        if "b" in p:
            x = x + p["b"]
        if f"norm{i}" in params:
            mu = x.mean(axis=-1, keepdims=True)
            var = x.var(axis=-1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            x = x * params[f"norm{i}"]["scale"] + params[f"norm{i}"]["bias"]
        if i < n - 1 or last_act:
            x = activation(x)
    return x


def init_shared_mlp(key, dims: Sequence[int], bn: bool = False):
    """PointNet-style shared per-point MLP (pt_util SharedMLP parity)."""
    return init_mlp(key, dims, bn=bn)


def apply_shared_mlp(params, dims: Sequence[int], points, pool: str = None,
                     point_mask=None, last_act: bool = False):
    """Apply to (B, N, F) point sets; optional masked 'mean'/'max' pooling."""
    h = apply_mlp(params, dims, points, last_act=last_act)
    if pool is None:
        return h
    if point_mask is None:
        point_mask = jnp.ones(h.shape[:-1], bool)
    m = point_mask[..., None].astype(h.dtype)
    if pool == "mean":
        return jnp.sum(h * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    if pool == "max":
        neg = jnp.where(point_mask[..., None], h, -jnp.inf)
        return jnp.max(neg, axis=-2)
    raise NotImplementedError(pool)
