"""Device-side (jit/grad-safe) SO(3)/SE(3) maps for the on-device tracker.

The tracker composes its pose update entirely on device — including the 6x6
normal-equation solve and the SE(3) exponential — killing the per-iteration
device->host sync the reference pays at every Gauss-Newton step
(reference: system/tracker.py:277 solves on CPU via numpy; see SURVEY.md §5.8).

Conventions match ``nerf_fusion_tpu.utils.se3``: a twist is
``xi = [rho(3), phi(3)]``; ``exp(xi) = (R=exp(phi^), t=J_l(phi) rho)``.
All functions are branch-free (Taylor fallbacks via ``jnp.where``) so they
are safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-8


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """(…,3) -> (…,3,3) skew-symmetric wedge."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """(…,3) -> (…,3,3) Rodrigues' rotation, with Taylor fallback near 0."""
    angle2 = jnp.sum(phi * phi, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS * _EPS))
    small = angle2 < _EPS
    # sin(a)/a and (1-cos(a))/a^2 with second-order Taylor at 0.
    sin_by_a = jnp.where(small, 1.0 - angle2 / 6.0, jnp.sin(angle) / angle)
    omc_by_a2 = jnp.where(small, 0.5 - angle2 / 24.0, (1.0 - jnp.cos(angle)) / angle2)
    K = hat(phi)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + sin_by_a[..., None, None] * K + omc_by_a2[..., None, None] * K2


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """(…,3) -> (…,3,3) left Jacobian of SO(3)."""
    angle2 = jnp.sum(phi * phi, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS * _EPS))
    small = angle2 < _EPS
    # (1-cos a)/a^2 and (a - sin a)/a^3 with Taylor at 0.
    c1 = jnp.where(small, 0.5 - angle2 / 24.0, (1.0 - jnp.cos(angle)) / angle2)
    c2 = jnp.where(small, 1.0 / 6.0 - angle2 / 120.0,
                   (angle - jnp.sin(angle)) / (angle2 * angle))
    K = hat(phi)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + c1[..., None, None] * K + c2[..., None, None] * K2


def se3_exp(xi: jnp.ndarray):
    """Twist (…,6) -> (R (…,3,3), t (…,3))."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho, precision=_HI)
    return R, t


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) -> (…,3); safe for angles well below pi (tracking increments)."""
    cos_angle = jnp.clip(0.5 * (jnp.trace(R, axis1=-2, axis2=-1) - 1.0), -1.0, 1.0)
    angle = jnp.arccos(cos_angle)
    vee = 0.5 * jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    small = angle < 1e-5
    scale = jnp.where(small, 1.0 + angle * angle / 6.0, angle / jnp.sin(angle))
    return vee * scale[..., None]


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): apply b first, then a."""
    return (jnp.matmul(Ra, Rb, precision=_HI),
            jnp.einsum("...ij,...j->...i", Ra, tb, precision=_HI) + ta)


def inverse(R, t):
    """(R,t)^-1 = (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HI)


def se3_log(R, t):
    """(R (3,3), t (3,)) -> twist (6,) with se3_exp(se3_log(T)) == T.

    rho solves J_l(phi) rho = t (the left Jacobian is well-conditioned for
    the small tracking increments this is used on).
    """
    phi = so3_log(R)
    rho = jnp.linalg.solve(so3_left_jacobian(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def transform_points(R: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (R,t) to (N,3) points."""
    return jnp.matmul(pts, R.T, precision=_HI) + t[None, :]
