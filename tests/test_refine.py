"""Latent-refinement tests: NLL improves; async merge is consistent."""

import jax
import numpy as np
import pytest

from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.map import SparseVoxelMap
from nerf_fusion_tpu.system.refine import merge_refined, refine_latents
from nerf_fusion_tpu.utils.config import dict_to_args

from pathlib import Path

REF_CKPT = Path(__file__).resolve().parent.parent / "ckpt/default/hyper.json"


@pytest.fixture(scope="module")
def fused():
    model, margs = load_model(REF_CKPT, 300)
    args = dict_to_args(dict(
        bound_min=[0.0, 0.0, 0.0], bound_max=[1.0, 1.0, 1.0], voxel_size=0.1,
        prune_min_vox_obs=4, ignore_count_th=16.0, encoder_count_th=100.0,
        latent_capacity=1024, alloc_capacity=256, optim_n_iters=5))
    vmap = SparseVoxelMap(model, args, latent_dim=margs.code_length)
    rng = np.random.RandomState(0)
    n = 4000
    pts = np.stack([rng.uniform(0.35, 0.65, n), rng.uniform(0.35, 0.65, n),
                    np.full(n, 0.52)], axis=1).astype(np.float32)
    nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    vmap.integrate_keyframe(pts, nrm)
    return vmap, pts, nrm


def test_refine_improves_surface_fit(fused):
    vmap, pts, nrm = fused
    import jax.numpy as jnp
    q = jnp.asarray(pts[:512])
    sdf0, _, valid0 = vmap.get_sdf(q)
    before = float(np.abs(np.asarray(sdf0))[np.asarray(valid0)].mean())

    res = refine_latents(vmap.state, vmap.cfg, vmap.model.decoder_params,
                         vmap.model.decoder_config,
                         jnp.asarray(pts), jnp.asarray(nrm),
                         jnp.ones(len(pts), bool), jax.random.PRNGKey(0),
                         n_iters=5)
    assert int(np.asarray(res.refined).sum()) > 0
    st = merge_refined(vmap.state, res, deintegrate=False)
    from nerf_fusion_tpu.system.map import get_sdf
    sdf1, _, valid1 = get_sdf(st, vmap.cfg, vmap.model.decoder_params,
                              vmap.model.decoder_config, q)
    after = float(np.abs(np.asarray(sdf1))[np.asarray(valid1)].mean())
    assert after <= before * 1.05  # refinement must not degrade the fit
    assert bool(np.asarray(st.optimized).any())


def test_deintegration_merge_identity(fused):
    """With unchanged counts, deintegrate merge == plain replace."""
    vmap, pts, nrm = fused
    import jax.numpy as jnp
    res = refine_latents(vmap.state, vmap.cfg, vmap.model.decoder_params,
                         vmap.model.decoder_config,
                         jnp.asarray(pts), jnp.asarray(nrm),
                         jnp.ones(len(pts), bool), jax.random.PRNGKey(1),
                         n_iters=2)
    a = merge_refined(vmap.state, res, deintegrate=False)
    b = merge_refined(vmap.state, res, deintegrate=True)
    m = np.asarray(res.refined)
    assert np.allclose(np.asarray(a.latents)[m], np.asarray(b.latents)[m],
                       atol=1e-5)


def test_async_refiner_roundtrip(fused):
    vmap, pts, nrm = fused
    import jax.numpy as jnp
    from nerf_fusion_tpu.system.refine import AsyncRefiner
    r = AsyncRefiner()
    r.dispatch(vmap.state, vmap.cfg, vmap.model.decoder_params,
               vmap.model.decoder_config, jnp.asarray(pts), jnp.asarray(nrm),
               jnp.ones(len(pts), bool), jax.random.PRNGKey(2), n_iters=2)
    import time
    for _ in range(600):
        res = r.collect()
        if res is not None:
            break
        time.sleep(0.1)
    assert res is not None
    assert not r.busy()
