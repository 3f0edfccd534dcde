"""Fused Pallas TPU kernels for the tiny hot MLPs.

The decoder/encoder are 4-5 layer, <=256-wide MLPs evaluated on 1e5-1e6
points per call (meshing sweeps, the x8-corner encoder pass, latent
refinement).  Under plain XLA every layer's activation round-trips HBM
(~1.3 GB of traffic for a 262k-point decoder sweep); these kernels keep
ALL weights (~100-400 KB) and the activations of one point-tile resident
in VMEM, so each point is read once and written once.

Precision: Mosaic dots support only DEFAULT (1 bf16 pass — loses ~3
decimal digits, which the deep tanh net amplifies to O(0.1) SDF error) and
HIGHEST (6 passes — accurate but erases the fusion win).  We therefore
implement the bf16x3 "HIGH" algorithm manually: operands are split into
bf16 hi/lo halves (weights pre-split on host) and each matmul runs as
``hi*hi + hi*lo + lo*hi`` with f32 accumulation — f32-equivalent digits at
3 MXU passes.

  * ``decoder_forward_pallas`` — the exact di_decoder architecture
    (latent_in re-injection at layer 3, uncertainty head, tanh), eval mode;
    weight-norm folded into plain (in, out) matrices on the host side.
  * ``encoder_forward_pallas`` — the cnp-mode SharedMLP with eval-BatchNorm
    folded into the weights.

Both fall back to the XLA path automatically off-TPU; correctness is
asserted against the reference JAX implementations in tests (interpret
mode) and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024


def _split_bf16(w):
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, w_hi_ref, w_lo_ref):
    """bf16x3 matmul: f32-equivalent accuracy, 3 single-pass MXU dots."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_hi = w_hi_ref[:]
    w_lo = w_lo_ref[:]
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(a_hi, w_hi) + d(a_hi, w_lo) + d(a_lo, w_hi)


def _fold_decoder_weights(params):
    """Weight-norm (g, v, b) -> dense (in, out) mats + biases, f32."""
    mats = []
    for name in ["lin0", "lin1", "lin2", "lin3", "lin4"]:
        p = params[name]
        if "v" in p:
            w = p["g"][:, None] * p["v"] / jnp.linalg.norm(p["v"], axis=1,
                                                           keepdims=True)
        else:
            w = p["w"]
        mats.append((w.T.astype(jnp.float32), p["b"].astype(jnp.float32)))
    pu = params["unc"]
    mats.append((pu["w"].T.astype(jnp.float32), pu["b"].astype(jnp.float32)))
    return mats


def _flatten_split(mats):
    """[(w, b), ...] -> [w0_hi, w0_lo, b0[None], w1_hi, ...]."""
    flat = []
    for w, b in mats:
        hi, lo = _split_bf16(w)
        flat += [hi, lo, b[None, :]]
    return tuple(flat)


def _decoder_kernel(x_ref,
                    w0h, w0l, b0, w1h, w1l, b1, w2h, w2l, b2,
                    w3h, w3l, b3, w4h, w4l, b4, wuh, wul, bu,
                    out_ref):
    x = x_ref[:]                                                # (T, 32)
    h = jnp.maximum(_dot3(x, w0h, w0l) + b0[:], 0.0)            # (T, 128)
    h = jnp.maximum(_dot3(h, w1h, w1l) + b1[:], 0.0)            # (T, 128)
    h = jnp.maximum(_dot3(h, w2h, w2l) + b2[:], 0.0)            # (T, 96)
    h = jnp.concatenate([h, x], axis=1)                         # latent_in
    h = jnp.maximum(_dot3(h, w3h, w3l) + b3[:], 0.0)            # (T, 128)
    std = 0.05 + 0.5 * jax.nn.softplus(_dot3(h, wuh, wul) + bu[:])
    sdf = jnp.tanh(_dot3(h, w4h, w4l) + b4[:])
    out_ref[:] = jnp.concatenate([sdf, std], axis=1)            # (T, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decoder_pallas_call(net_in, mats_flat, interpret=False):
    N = net_in.shape[0]
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats_flat]
    return pl.pallas_call(
        _decoder_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 2), jnp.float32),
        grid=(N // _TILE,),
        in_specs=[pl.BlockSpec((_TILE, net_in.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((_TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(net_in, *mats_flat)


def decoder_forward_pallas(params, config, net_in, interpret: bool = False):
    """Fused eval-mode decoder forward. (N, L+3) -> (sdf (N,1), std (N,1)).

    Requires the shipped architecture (dims [128]*4, latent_in=[3]); callers
    check ``decoder_is_fusable`` and fall back to apply_decoder otherwise.
    """
    mats_flat = _flatten_split(_fold_decoder_weights(params))
    N = net_in.shape[0]
    pad = (-N) % _TILE
    if pad:
        net_in = jnp.concatenate(
            [net_in, jnp.zeros((pad, net_in.shape[1]), net_in.dtype)])
    out = _decoder_pallas_call(net_in.astype(jnp.float32), mats_flat,
                               interpret=interpret)
    return out[:N, 0:1], out[:N, 1:2]


def decoder_is_fusable(config) -> bool:
    return (list(config.dims) == [config.latent_size + 3, 128, 128, 128, 128, 1]
            and list(config.latent_in) == [3])


# ---------------------------------------------------------------------------
# Encoder (cnp mode, eval BatchNorm folded).
# ---------------------------------------------------------------------------


def _fold_encoder_weights(params, bn_state, config, eps=1e-5):
    mats = []
    for i in range(config.n_layers):
        p = params[f"layer{i}"]
        w = p["w"].T.astype(jnp.float32)          # (in, out)
        b = p.get("b", jnp.zeros(w.shape[1])).astype(jnp.float32)
        if config.has_bn(i):
            s = bn_state[f"layer{i}"]
            scale = s["scale"] * jax.lax.rsqrt(s["var"] + eps)
            w = w * scale[None, :]
            b = (b - s["mean"]) * scale + s["bias"]
        mats.append((w, b))
    return mats


def _encoder_kernel(x_ref, w0h, w0l, b0, w1h, w1l, b1, w2h, w2l, b2,
                    w3h, w3l, b3, out_ref):
    x = x_ref[:]
    h = jnp.maximum(_dot3(x, w0h, w0l) + b0[:], 0.0)
    h = jnp.maximum(_dot3(h, w1h, w1l) + b1[:], 0.0)
    h = jnp.maximum(_dot3(h, w2h, w2l) + b2[:], 0.0)
    out_ref[:] = _dot3(h, w3h, w3l) + b3[:]       # last layer: no act/BN


@functools.partial(jax.jit, static_argnames=("latent", "interpret"))
def _encoder_pallas_call(x, mats_flat, latent, interpret=False):
    N = x.shape[0]
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats_flat]
    return pl.pallas_call(
        _encoder_kernel,
        out_shape=jax.ShapeDtypeStruct((N, latent), jnp.float32),
        grid=(N // _TILE,),
        in_specs=[pl.BlockSpec((_TILE, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((_TILE, latent), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *mats_flat)


def encoder_forward_pallas(params, bn_state, config, x, interpret: bool = False):
    """Fused cnp-mode encoder forward. (N, F) -> (N, L)."""
    assert config.n_layers == 4, "fused kernel targets the 4-layer encoder"
    mats_flat = _flatten_split(_fold_encoder_weights(params, bn_state, config))
    N = x.shape[0]
    pad = (-N) % _TILE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    out = _encoder_pallas_call(x.astype(jnp.float32), mats_flat,
                               config.latent_size, interpret=interpret)
    return out[:N]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False
