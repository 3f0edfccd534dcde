#!/usr/bin/env python3
"""Experiments for the two hottest preprocess/GN ops (true device times).

1. resize_half_bilinear: map_coordinates gather vs separable constant
   blend-matrix MXU matmuls (same align_corners weights).
2. k-element warp gather: random vs sorted index order (the sparse
   photometric term may sort its pixel budget once per frame for free).

    python tools/gather_exp.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import os  # noqa: E402

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np  # noqa: E402

from microbench import device_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.ops import imgproc

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    H, W = 480, 640
    img = jnp.asarray(rng.random((H, W)), jnp.float32)

    def resize_matrix(n_out, n_in):
        x = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(x).astype(int)
        hi = np.minimum(lo + 1, n_in - 1)
        f = (x - lo).astype(np.float32)
        M = np.zeros((n_out, n_in), np.float32)
        M[np.arange(n_out), lo] += 1 - f
        M[np.arange(n_out), hi] += f
        return jnp.asarray(M)

    Wy = resize_matrix(H // 2, H)
    Wx = resize_matrix(W // 2, W)
    HI = jax.lax.Precision.HIGHEST

    def mm_resize(x):
        return jnp.matmul(jnp.matmul(Wy, x, precision=HI), Wx.T, precision=HI)

    device_time("resize 640->320 map_coordinates",
                lambda eps: imgproc.resize_half_bilinear(img + eps), K=32)
    device_time("resize 640->320 blend-matmul",
                lambda eps: mm_resize(img + eps), K=32)
    # parity
    a = np.asarray(imgproc.resize_half_bilinear(img))
    b = np.asarray(mm_resize(img))
    print(f"   max |diff| = {np.abs(a - b).max():.2e}")

    # ---- gather order ---------------------------------------------------
    k = 24576
    # complex64 H2D/D2H is UNIMPLEMENTED through the axon tunnel — keep
    # two f32 planes and build the complex image INSIDE the traced fn
    # (exactly what rgb_odometry does).
    prev_re = jnp.asarray(rng.random(H * W), jnp.float32)
    prev_im = jnp.asarray(rng.random(H * W), jnp.float32)
    idx_rand = jnp.asarray(rng.integers(0, H * W, k).astype(np.int32))
    idx_sorted = jnp.sort(idx_rand)
    # near-sorted: sorted base + small warp jitter (the real case: raster
    # pixels warped by a near-identity transform)
    idx_near = jnp.clip(
        idx_sorted + jnp.asarray(rng.integers(-W, W, k).astype(np.int32)),
        0, H * W - 1)

    def g(idx):
        def fn(eps):
            c = jax.lax.complex(prev_re + eps, prev_im)
            got = jnp.take(c, idx, mode="clip")
            return jnp.real(got) + jnp.imag(got)   # f32 leaves only
        return fn

    device_time("gather 24576 c64 random order", g(idx_rand), K=32)
    device_time("gather 24576 c64 sorted order", g(idx_sorted), K=32)
    device_time("gather 24576 c64 near-sorted", g(idx_near), K=32)

    f32 = jnp.asarray(rng.random(H * W), jnp.float32)
    device_time("gather 24576 f32 random order",
                lambda eps: jnp.take(f32 + eps, idx_rand, mode="clip"), K=32)
    device_time("gather 24576 f32 sorted order",
                lambda eps: jnp.take(f32 + eps, idx_sorted, mode="clip"),
                K=32)
    # 2x f32 gathers vs 1x c64 gather (is complex packing actually a win?)
    device_time("gather 2x24576 f32 sorted",
                lambda eps: (jnp.take(f32 + eps, idx_sorted, mode="clip"),
                             jnp.take(f32 + eps * 2, idx_sorted,
                                      mode="clip")), K=32)


if __name__ == "__main__":
    main()
