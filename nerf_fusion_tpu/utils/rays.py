"""Camera-ray utilities (encoder_util capability parity, SURVEY.md §2.4).

The fork's ``trainer/encoder_util.py`` carries pixelNeRF ray/camera
helpers; these are the jit-friendly equivalents used with the image
encoders and any NeRF-style sampling built on top of the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def gen_rays(pose_R, pose_t, width: int, height: int, fx, fy, cx, cy,
             z_near: float = 0.0, z_far: float = 0.0):
    """Per-pixel world rays for a pinhole camera (y-down image convention).

    :param pose_R/pose_t: camera-to-world.
    :return: (H, W, 8): origin(3), dir(3, unit), near, far.
    """
    u = jnp.arange(width, dtype=jnp.float32)[None, :].repeat(height, 0)
    v = jnp.arange(height, dtype=jnp.float32)[:, None].repeat(width, 1)
    d_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], -1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_world = jnp.einsum("ij,hwj->hwi", pose_R, d_cam, precision=_HI)
    origin = jnp.broadcast_to(pose_t[None, None, :], d_world.shape)
    nf = jnp.broadcast_to(jnp.asarray([z_near, z_far], jnp.float32),
                          d_world.shape[:2] + (2,))
    return jnp.concatenate([origin, d_world, nf], axis=-1)


def project_points(pts, pose_R, pose_t, fx, fy, cx, cy):
    """World points -> (uv (N,2), z (N,), in_front (N,)) for a pinhole camera."""
    p_cam = jnp.matmul(pts - pose_t[None, :], pose_R,
                       precision=_HI)  # R^T (p - t) in row form
    z = p_cam[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = p_cam[:, 0] / zs * fx + cx
    v = p_cam[:, 1] / zs * fy + cy
    return jnp.stack([u, v], -1), z, z > 0


def sample_along_rays(rays, n_samples: int, lindisp: bool = False):
    """Stratified-free uniform depth samples along (…, 8) rays.

    :return: (…, n_samples, 3) points, (…, n_samples) depths.
    """
    origin, dirs = rays[..., 0:3], rays[..., 3:6]
    near, far = rays[..., 6:7], rays[..., 7:8]
    t = jnp.linspace(0.0, 1.0, n_samples)
    if lindisp:
        z = 1.0 / (1.0 / jnp.maximum(near, 1e-6) * (1 - t)
                   + 1.0 / jnp.maximum(far, 1e-6) * t)
    else:
        z = near * (1 - t) + far * t
    pts = origin[..., None, :] + dirs[..., None, :] * z[..., :, None]
    return pts, z
