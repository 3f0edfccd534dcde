#!/usr/bin/env python3
"""top_k vs approx_max_k for the per-frame photometric pixel selection.

select_photometric_pixels runs lax.top_k(score, 24576) over the 76.8k
strided level-0 scores once per frame — sort-based on TPU.  approx_max_k
is a single-pass PartialReduce designed for exactly this shape of
problem, and approximate selection is acceptable here (any high-gradient
pixel subset carries the photometric information; exactness of the k-th
boundary is irrelevant).

    python tools/topk_exp.py
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

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    n, k = 320 * 240, 24576
    score = jnp.asarray(rng.random(n).astype(np.float32))

    device_time("top_k 76.8k -> 24576",
                lambda eps: jax.lax.top_k(score + eps, k), K=32)
    for rt in (0.95, 0.8):
        device_time(f"approx_max_k recall={rt}",
                    lambda eps: jax.lax.approx_max_k(
                        score + eps, k, recall_target=rt), K=32)
    # exactness of the selected mass (not membership): sum of selected
    # scores vs exact top-k sum
    exact_v, _ = jax.lax.top_k(score, k)
    for rt in (0.95, 0.8):
        v, _ = jax.lax.approx_max_k(score, k, recall_target=rt)
        frac = float(jnp.sum(v) / jnp.sum(exact_v))
        print(f"   recall={rt}: selected-mass fraction {frac:.4f}")

    # the full selection (scores + 7 gathers at k) as a unit
    from nerf_fusion_tpu.ops import imgproc
    H, W = 480, 640
    inten = jnp.asarray(rng.random((H, W)).astype(np.float32))
    depth = jnp.asarray(
        np.where(rng.random((H, W)) > 0.1, rng.random((H, W)) + 0.5,
                 np.nan).astype(np.float32))
    dIdxy = jnp.asarray(rng.normal(size=(2, H, W)).astype(np.float32))
    device_time("select_photometric_pixels (current)",
                lambda eps: imgproc.select_photometric_pixels(
                    inten + eps, depth, dIdxy, k, 0.0, stride=2), K=16)

    # ---- sub-stage decomposition ---------------------------------------
    import jax.numpy as jnp

    def stride_only(eps):
        return ((inten + eps)[::2, ::2], depth[::2, ::2],
                dIdxy[:, ::2, ::2])

    device_time("  stride-2 slice of 4 planes", stride_only, K=32)

    ist, dst, gst = stride_only(0.0)
    gx, gy = gst[0], gst[1]

    def score_only(eps):
        g2 = (gx + eps) * gx + gy * gy
        ok = jnp.isfinite(g2) & (g2 >= 0.0) & jnp.isfinite(dst)
        return jnp.where(ok, g2, -1.0).reshape(-1)

    device_time("  score compute", score_only, K=32)
    score2 = score_only(0.0)
    device_time("  top_k on strided score",
                lambda eps: jax.lax.top_k(score2 + eps, k), K=32)
    _, idx0 = jax.lax.top_k(score2, k)
    device_time("  2x c64 pack+gather",
                lambda eps: (jnp.take(jax.lax.complex(ist + eps, dst)
                                      .reshape(-1), idx0, mode="clip"),
                             jnp.take(jax.lax.complex(gx, gy + eps)
                                      .reshape(-1), idx0, mode="clip")),
                K=32)


if __name__ == "__main__":
    main()
