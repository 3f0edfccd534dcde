"""LM point tracker: recovers a perturbed pose on a fused map."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.map import SparseVoxelMap
from nerf_fusion_tpu.system.tracker import track_points_lm
from nerf_fusion_tpu.utils.config import dict_to_args
from nerf_fusion_tpu.utils.se3 import Isometry

CKPT = Path(__file__).resolve().parent.parent / "ckpt/default/hyper.json"


@pytest.mark.slow
def test_lm_recovers_perturbed_pose():
    model, margs = load_model(CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.2, 1.2, 1.2], voxel_size=0.1,
        prune_min_vox_obs=4, ignore_count_th=8.0, encoder_count_th=600.0,
        latent_capacity=4096, alloc_capacity=1024))
    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    rng = np.random.RandomState(0)
    # fuse an ASYMMETRIC scene (two spheres + a plane patch): a single
    # sphere leaves rotation about its centre unobservable
    d = rng.randn(8000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s1 = 0.45 + 0.18 * d
    s2 = np.array([0.85, 0.55, 0.75]) + 0.12 * d
    gx = rng.uniform(0.2, 1.0, (8000, 1))
    gy = rng.uniform(0.2, 1.0, (8000, 1))
    plane = np.concatenate([gx, gy, np.full((8000, 1), 0.25)], axis=1)
    pts_world = np.concatenate([s1, s2, plane]).astype(np.float32)
    nrm = np.concatenate([d, d, np.tile([[0.0, 0.0, 1.0]], (8000, 1))]
                         ).astype(np.float32)
    vmap.integrate_keyframe(pts_world, nrm)

    # observation = world points seen under a slightly wrong pose
    true_iso = Isometry()  # identity: obs already in world frame
    xi = np.asarray([0.02, -0.015, 0.02, 0.015, -0.02, 0.01])
    wrong = Isometry.from_twist(xi)  # pose error to recover
    obs = (pts_world - wrong.t) @ wrong.q.rotation_matrix  # wrong^-1 @ world

    sub = obs[::5][:4096].astype(np.float32)  # strided: all three structures
    R, t, energy = track_points_lm(
        vmap.state, vmap.cfg, model.decoder_params, model.decoder_config,
        jnp.asarray(sub), jnp.ones((len(sub),), bool),
        jnp.eye(3), jnp.zeros(3), n_iters=25)
    rec = Isometry.from_matrix(np.asarray(R, np.float64),
                               np.asarray(t, np.float64), ortho=True)
    # recovered pose should be close to `wrong` (maps obs back to world)
    err_t = np.linalg.norm(rec.t - wrong.t)
    dR = rec.q.rotation_matrix.T @ wrong.q.rotation_matrix
    err_r = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert err_t < 0.01, f"translation err {err_t}"
    assert err_r < 1.0, f"rotation err {err_r}"
