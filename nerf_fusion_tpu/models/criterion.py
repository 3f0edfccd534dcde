"""Training losses, looked up by name from config (parity: network/criterion.py).

Each loss takes keyword args and returns a dict of named scalar terms;
the trainer sums all terms (reference: trainer/main.py:73-75,155-160).
All math is jnp so losses compose under jit/grad.
"""

from __future__ import annotations

import math

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


def get_losses(names):
    registry = {"l1_loss": l1_loss, "neg_log_likelihood": neg_log_likelihood,
                "reg_loss": reg_loss}
    return [registry[n] for n in names]
