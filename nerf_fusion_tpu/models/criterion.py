"""Training losses, looked up by name from config (parity: network/criterion.py).

Each loss takes keyword args and returns a dict of named scalar terms;
the trainer sums all terms (reference: trainer/main.py:73-75,155-160).
All math is jnp so losses compose under jit/grad.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def l1_loss(args, info, pd_sdf, gt_sdf, **kwargs):
    """Clamped L1 (network/criterion.py:10-26)."""
    if args.enforce_minmax:
        gt_sdf = jnp.clip(gt_sdf, -args.clamping_distance, args.clamping_distance)
        pd_sdf = jnp.clip(pd_sdf, -args.clamping_distance, args.clamping_distance)
    return {"sdf": jnp.sum(jnp.abs(gt_sdf - pd_sdf)) / info["num_sdf_samples"]}


def neg_log_likelihood(args, info, pd_sdf, pd_sdf_std, gt_sdf, **kwargs):
    """Gaussian NLL of the clamped gt under (mu, sigma) (network/criterion.py:29-43)."""
    if args.enforce_minmax:
        gt_sdf = jnp.clip(gt_sdf, -args.clamping_distance, args.clamping_distance)
        pd_sdf = jnp.clip(pd_sdf, -args.clamping_distance, args.clamping_distance)
    mu = pd_sdf.reshape(-1)
    sigma = pd_sdf_std.reshape(-1)
    gt = gt_sdf.reshape(-1)
    nll = 0.5 * ((gt - mu) / sigma) ** 2 + jnp.log(sigma) + 0.5 * math.log(2 * math.pi)
    return {"ll": jnp.sum(nll) / info["num_sdf_samples"]}


def reg_loss(args, info, latent_vecs, **kwargs):
    """Latent L2 with a 100-epoch warm-up ramp (network/criterion.py:87-92)."""
    l2 = jnp.sum(jnp.linalg.norm(latent_vecs, axis=1))
    warm = jnp.minimum(1.0, info["epoch"] / 100.0)  # traced under jit
    return {"reg": warm * l2 / info["num_sdf_samples"] * args.code_reg_lambda}


def siren_loss(args, info, pd_sdf, coords, gt_sdf, **kwargs):
    """SIREN-style boundary/eikonal loss (network/criterion.py:46-80).

    ``gt_sdf`` carries normals; rows whose normal is ~0 are off-surface.
    Requires ``pd_sdf`` to be differentiable w.r.t. ``coords`` — pass a
    closure via kwargs['sdf_fn'] (JAX needs the function, not a graph).
    """
    sdf_fn = kwargs["sdf_fn"]          # coords (N,3) -> sdf (N,1)
    grad = jax.vmap(jax.grad(lambda c: sdf_fn(c[None])[0, 0]))(coords)  # (N,3)
    gt_normals = gt_sdf
    on_surface = jnp.sum(jnp.abs(gt_sdf), axis=-1, keepdims=True) > 1e-6

    zero = jnp.zeros_like(pd_sdf)
    sdf_in = jnp.where(on_surface, pd_sdf, zero)
    sdf_out = jnp.where(on_surface, zero, jnp.exp(-1e2 * jnp.abs(pd_sdf)))
    cos = jnp.sum(grad * gt_normals, axis=-1, keepdims=True) / (
        jnp.linalg.norm(grad, axis=-1, keepdims=True)
        * jnp.maximum(jnp.linalg.norm(gt_normals, axis=-1, keepdims=True), 1e-9)
        + 1e-9)
    normal = jnp.where(on_surface, 1.0 - cos, zero)
    eikonal = jnp.abs(jnp.linalg.norm(grad, axis=-1) - 1.0)
    n = info["num_sdf_samples"]
    return {
        "sdf_in": jnp.sum(jnp.abs(sdf_in)) / n * args.siren_sdf_in,
        "sdf_out": jnp.sum(sdf_out) / n * args.siren_sdf_out,
        "normal": jnp.sum(normal) / n * args.siren_normal,
        "eikonal": jnp.sum(eikonal) / n * args.siren_eikonal,
    }


def get_losses(names):
    registry = {"l1_loss": l1_loss, "neg_log_likelihood": neg_log_likelihood,
                "reg_loss": reg_loss, "siren_loss": siren_loss}
    return [registry[n] for n in names]
