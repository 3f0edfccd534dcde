"""Tests for chunked/grouped apply helpers and the image-encoder family."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_fusion_tpu.models import img_encoder as ie
from nerf_fusion_tpu.models.apply import (chunked_apply, get_samples,
                                          groupby_reduce, pack_samples)


def test_chunked_apply_matches_direct():
    fn = lambda x: (x * 2, x.sum(axis=1))
    x = jnp.arange(24.0).reshape(12, 2)
    a = chunked_apply(fn, x, max_chunk=5)
    b = fn(x)
    assert np.allclose(np.asarray(a[0]), np.asarray(b[0]))
    assert np.allclose(np.asarray(a[1]), np.asarray(b[1]))


def test_get_samples_lattice():
    s = np.asarray(get_samples(3, a=0.0, b=1.0))
    assert s.shape == (27, 3)
    assert np.allclose(s[0], [0, 0, 0]) and np.allclose(s[-1], [1, 1, 1])
    # x-major ordering: z varies fastest
    assert np.allclose(s[1], [0, 0, 0.5])


def test_groupby_reduce_mean():
    idx = jnp.asarray([0, 1, 0, 2, 1])
    vals = jnp.asarray([[1.0], [2.0], [3.0], [4.0], [6.0]])
    out = np.asarray(groupby_reduce(idx, vals, op="mean", num_segments=3))
    assert np.allclose(out[:, 0], [2.0, 4.0, 4.0])


def test_pack_samples_membership():
    rng = jax.random.PRNGKey(0)
    idx = jnp.asarray([0, 0, 1, 1, 1, 3])
    vals = jnp.asarray([[0.0], [1.0], [10.0], [11.0], [12.0], [30.0]])
    packed, gvalid = pack_samples(idx, 4, vals, num_segments=4, rng=rng)
    assert packed.shape == (4, 4, 1)
    assert list(np.asarray(gvalid)) == [True, True, False, True]
    # every packed row of group g comes from group g's members
    assert set(np.asarray(packed[0]).ravel()) <= {0.0, 1.0}
    assert set(np.asarray(packed[1]).ravel()) <= {10.0, 11.0, 12.0}
    assert set(np.asarray(packed[3]).ravel()) == {30.0}


def test_spatial_encoder_and_index():
    cfg = ie.SpatialEncoderConfig(channels=(8, 16), latent_size=24)
    params = ie.init_spatial_encoder(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 40))
    lat = ie.apply_spatial_encoder(params, cfg, img)
    assert lat.shape == (2, 24, 16, 20)
    uv = jnp.asarray([[[0.0, 0.0], [39.0, 31.0], [20.0, 16.0]]] * 2)
    feats = ie.index_features(lat, uv, (32, 40))
    assert feats.shape == (2, 24, 3)
    assert not np.any(np.isnan(np.asarray(feats)))


def test_image_and_conv_encoders():
    cfgg = ie.ImageEncoderConfig(channels=(8, 16), latent_size=12)
    pg = ie.init_image_encoder(jax.random.PRNGKey(0), cfgg)
    g = ie.apply_image_encoder(pg, cfgg, jnp.ones((2, 3, 32, 32)))
    assert g.shape == (2, 12)

    cfgc = ie.ConvEncoderConfig(channels=(8, 16), out_channels=6)
    pc = ie.init_conv_encoder(jax.random.PRNGKey(0), cfgc)
    c = ie.apply_conv_encoder(pc, cfgc, jnp.ones((1, 3, 32, 32)))
    assert c.shape[0] == 1 and c.shape[1] == 6
    assert c.shape[2] == 32 and c.shape[3] == 32


def test_make_encoder_factory():
    cfg, params, apply_fn = ie.make_encoder("spatial", channels=(8, 16),
                                            latent_size=24)
    out = apply_fn(params, cfg, jnp.ones((1, 3, 16, 16)))
    assert out.shape[1] == 24
