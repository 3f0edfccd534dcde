"""Parity extras: sensor-noise weight, exact-vs-windowed outlier agreement,
layer zoo."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_fusion_tpu.models.zoo import (apply_mlp, apply_shared_mlp, init_mlp,
                                        init_shared_mlp)
from nerf_fusion_tpu.ops import imgproc


def test_sensor_noise_weight_monotone():
    H, W = 8, 8
    n = jnp.zeros((3, H, W)).at[2].set(1.0)
    v = jnp.ones((H, W), bool)
    w1 = imgproc.sensor_noise_weight(jnp.full((H, W), 1.0), n, v)
    w3 = imgproc.sensor_noise_weight(jnp.full((H, W), 3.0), n, v)
    assert float(w1[0, 0]) > float(w3[0, 0])          # farther = less confident
    n_graze = jnp.zeros((3, H, W)).at[2].set(0.1)
    wg = imgproc.sensor_noise_weight(jnp.full((H, W), 1.0), n_graze, v)
    assert float(w1[0, 0]) > float(wg[0, 0])          # grazing = less confident


def test_windowed_outlier_agrees_with_exact():
    """SURVEY hard-part #4: image-space outlier filter vs the exact KD-tree
    semantics on a realistic depth frame."""
    from nerf_fusion_tpu.data.synth import SyntheticSequence

    seq = SyntheticSequence(n_frames=1, width=160, height=120)
    fr = seq.render_frame(0)
    depth = jnp.asarray(fr.depth)
    pts = imgproc.unproject_depth(depth, fr.calib.fx * 0.25, fr.calib.fy * 0.25,
                                  fr.calib.cx * 0.25, fr.calib.cy * 0.25)
    valid = jnp.isfinite(depth)
    pts0 = jnp.where(valid[None], pts, 0.0)
    cnt = imgproc.radius_neighbor_count(pts0, valid, radius=0.05, radius_px=3)
    approx = np.asarray(valid & (cnt >= 16))

    flat = np.asarray(pts0).reshape(3, -1).T
    vm = np.asarray(valid).reshape(-1)
    exact = np.zeros_like(vm)
    exact[vm] = imgproc.radius_outlier_mask_exact(flat[vm], 16, 0.05)
    approx_f = approx.reshape(-1)
    agree = (approx_f[vm] == exact[vm]).mean()
    assert agree > 0.9, f"agreement {agree}"


def test_zoo_mlp_and_shared_mlp():
    dims = [6, 16, 8]
    params = init_mlp(jax.random.PRNGKey(0), dims, bn=True)
    y = apply_mlp(params, dims, jnp.ones((5, 6)))
    assert y.shape == (5, 8)

    sp = init_shared_mlp(jax.random.PRNGKey(1), dims)
    pooled = apply_shared_mlp(sp, dims, jnp.ones((2, 10, 6)), pool="mean")
    assert pooled.shape == (2, 8)
    mx = apply_shared_mlp(sp, dims, jnp.ones((2, 10, 6)), pool="max",
                          point_mask=jnp.ones((2, 10), bool).at[:, 5:].set(False))
    assert mx.shape == (2, 8) and np.isfinite(np.asarray(mx)).all()
