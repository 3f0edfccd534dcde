"""SE(3) property tests: numpy Isometry semantics + JAX parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.utils import se3_jax
from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion, so3_exp, so3_log


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


def test_quaternion_matrix_roundtrip():
    for _ in range(50):
        q = Quaternion.random()
        q2 = Quaternion(matrix=q.rotation_matrix)
        # q and -q are the same rotation
        assert np.allclose(q2.rotation_matrix, q.rotation_matrix, atol=1e-9)


def test_so3_exp_log_roundtrip():
    for _ in range(20):
        phi = np.random.randn(3) * 0.8
        assert np.allclose(so3_log(so3_exp(phi)), phi, atol=1e-8)


def test_isometry_twist_roundtrip():
    for _ in range(20):
        xi = np.random.randn(6) * 0.5
        iso = Isometry.from_twist(xi)
        assert np.allclose(iso.log(), xi, atol=1e-7)


def test_isometry_compose_inverse():
    a, b = Isometry.random(), Isometry.random()
    ab = a.dot(b)
    assert np.allclose(ab.matrix, a.matrix @ b.matrix, atol=1e-9)
    ident = a.dot(a.inv())
    assert np.allclose(ident.matrix, np.eye(4), atol=1e-9)


def test_isometry_point_transform():
    iso = Isometry.random()
    pts = np.random.randn(10, 3)
    out = iso @ pts
    expect = pts @ iso.q.rotation_matrix.T + iso.t
    assert np.allclose(out, expect, atol=1e-9)


def test_jax_se3_exp_matches_numpy():
    for _ in range(10):
        xi = np.random.randn(6) * 0.4
        R, t = se3_jax.se3_exp(jnp.asarray(xi))
        iso = Isometry.from_twist(xi)
        assert np.allclose(np.asarray(R), iso.q.rotation_matrix, atol=1e-5)
        assert np.allclose(np.asarray(t), iso.t, atol=1e-5)


def test_jax_se3_exp_small_angle():
    xi = jnp.asarray([1e-9, -1e-9, 2e-9, 1e-10, -1e-10, 1e-10])
    R, t = se3_jax.se3_exp(xi)
    assert np.allclose(np.asarray(R), np.eye(3), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(R)))


def test_jax_so3_log_roundtrip():
    phi = np.random.randn(3) * 0.5
    R = se3_jax.so3_exp(jnp.asarray(phi))
    assert np.allclose(np.asarray(se3_jax.so3_log(R)), phi, atol=1e-5)


def test_look_at_and_gl_camera():
    iso = Isometry.look_at(np.array([1.0, 2.0, 3.0]), np.zeros(3))
    # z axis of the camera frame points at the target
    z = iso.q.rotation_matrix[:, 2]
    d = -iso.t / np.linalg.norm(iso.t)
    assert np.allclose(z, d, atol=1e-9)
    gl = iso.to_gl_camera()
    assert np.allclose(gl.q.rotation_matrix[:, 2], -z, atol=1e-9)
