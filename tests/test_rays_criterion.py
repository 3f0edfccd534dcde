"""Ray utils + siren loss + SE(3) repr extras."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_fusion_tpu.models.criterion import siren_loss
from nerf_fusion_tpu.utils.config import dict_to_args
from nerf_fusion_tpu.utils.rays import gen_rays, project_points, sample_along_rays
from nerf_fusion_tpu.utils.se3 import Isometry


def test_gen_rays_and_project_roundtrip():
    iso = Isometry.random()
    R = jnp.asarray(iso.q.rotation_matrix, jnp.float32)
    t = jnp.asarray(iso.t, jnp.float32)
    rays = gen_rays(R, t, 16, 12, 10.0, 10.0, 7.5, 5.5, 0.5, 4.0)
    assert rays.shape == (12, 16, 8)
    pts, z = sample_along_rays(rays, 4)
    # points along a pixel's ray project back to that pixel
    uv, depth, front = project_points(pts[5, 7].reshape(-1, 3), R, t,
                                      10.0, 10.0, 7.5, 5.5)
    assert np.allclose(np.asarray(uv), [[7.0, 5.0]], atol=1e-3)
    assert np.all(np.asarray(front))


def test_siren_loss_terms():
    args = dict_to_args(dict(siren_sdf_in=1.0, siren_sdf_out=1.0,
                             siren_normal=1.0, siren_eikonal=1.0))
    # a perfect SDF: plane z=0, normal +z
    sdf_fn = lambda c: c[:, 2:3]
    coords = jnp.asarray(np.random.RandomState(0).randn(32, 3), jnp.float32)
    on = coords.at[:16, 2].set(0.0)
    gt = jnp.zeros((32, 3)).at[:16, 2].set(1.0)  # first half on-surface
    pd = sdf_fn(on)
    out = siren_loss(args, {"num_sdf_samples": 32}, pd_sdf=pd, coords=on,
                     gt_sdf=gt, sdf_fn=sdf_fn)
    assert float(out["sdf_in"]) < 1e-6      # on-surface sdf = 0
    assert float(out["normal"]) < 1e-6      # gradient matches normals
    assert float(out["eikonal"]) < 1e-6     # |grad| = 1
    assert float(out["sdf_out"]) > 0        # off-surface term active


def test_se3_adjoint_and_reprs():
    iso = Isometry.random()
    adj = iso.adjoint_matrix()
    # adjoint maps twists: exp(Adj_T xi) = T exp(xi) T^-1
    xi = np.random.RandomState(0).randn(6) * 0.1
    lhs = Isometry.from_twist(adj @ xi).matrix
    rhs = (iso.dot(Isometry.from_twist(xi)).dot(iso.inv())).matrix
    assert np.allclose(lhs, rhs, atol=1e-6)
    rec = Isometry.from_continuous_repr(iso.continuous_repr)
    assert np.allclose(rec.matrix, iso.matrix, atol=1e-9)
    rec2 = Isometry.from_full_repr(iso.full_repr)
    assert np.allclose(rec2.matrix, iso.matrix, atol=1e-9)
