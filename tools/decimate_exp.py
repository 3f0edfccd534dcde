#!/usr/bin/env python3
"""Stride-2 plane decimation variants for the dense photometric path.

rgb_odometry(stride=2) slices 4 full-res planes `[::2, ::2]` per GN
group — measured ~2.9 ms at 640x480 on a v5e (lane-dimension relayout).
Candidates to beat it:

  a) plain [::2, ::2] slice               (baseline — lane relayout)
  b) one-hot selection matmuls both dims  (rides the MXU, like
     resize_half_bilinear's blend matrices; needs NaN-sanitised inputs)
  c) sublane slice [::2] + lane matmul    (row slice may be cheap)
  d) reshape (h/2,2,w/2,2) + take [0,0]   (same relayout, different spell)
  e) 2x c64 pack, then (b) on 2 planes    (halves matmul volume; complex
     matmul may lower poorly — measure)

    python tools/decimate_exp.py
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


def _sel(n_in: int) -> np.ndarray:
    """(n_in//2, n_in) one-hot stride-2 row-selection matrix."""
    n_out = n_in // 2
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), np.arange(n_out) * 2] = 1.0
    return M


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    H, W = 480, 640
    planes = jnp.asarray(rng.random((4, H, W)).astype(np.float32))
    Sy = jnp.asarray(_sel(H))
    Sx = jnp.asarray(_sel(W))
    HI = jax.lax.Precision.HIGHEST

    def a(eps):
        p = planes + eps
        return p[:, ::2, ::2]

    def b(eps):
        p = planes + eps
        return jnp.matmul(jnp.matmul(Sy, p, precision=HI), Sx.T,
                          precision=HI)

    def c(eps):
        p = (planes + eps)[:, ::2, :]
        return jnp.matmul(p, Sx.T, precision=HI)

    def d(eps):
        p = (planes + eps).reshape(4, H // 2, 2, W // 2, 2)
        return p[:, :, 0, :, 0]

    def e(eps):
        p = planes + eps
        pk = jax.lax.complex(p[:2], p[2:])
        out = jnp.matmul(jnp.matmul(Sy.astype(pk.dtype), pk),
                         Sx.T.astype(pk.dtype))
        return jnp.real(out), jnp.imag(out)

    device_time("a) [::2,::2] slice x4", a, K=32)
    device_time("b) one-hot matmul both dims", b, K=32)
    device_time("c) row slice + lane matmul", c, K=32)
    device_time("d) reshape-take", d, K=32)
    device_time("e) c64 pack + matmul", e, K=32)

    # exactness check for b/c vs a
    ra = np.asarray(a(0.0))
    for name, f in (("b", b), ("c", c), ("d", d)):
        r = np.asarray(f(0.0))
        print(f"   {name} max|diff| vs a: {np.max(np.abs(r - ra)):.3e}")

    # ---- depth plane with NaNs (resize_half_nearest) --------------------
    dnp = rng.random((H, W)).astype(np.float32) + 0.5
    dnp[rng.random((H, W)) < 0.15] = np.nan
    dep = jnp.asarray(dnp)

    def dn_slice(eps):
        return (dep + eps)[::2, ::2]

    def dn_matmul(eps):
        d = dep + eps
        z = jnp.where(jnp.isfinite(d), d, 0.0)[::2]
        out = jnp.matmul(z, Sx.T, precision=HI)
        return jnp.where(out > 0.0, out, jnp.nan)

    device_time("depth [::2,::2] slice", dn_slice, K=32)
    device_time("depth sanitize+rowslice+matmul", dn_matmul, K=32)
    r1, r2 = np.asarray(dn_slice(0.0)), np.asarray(dn_matmul(0.0))
    same = np.array_equal(np.nan_to_num(r1, nan=-1), np.nan_to_num(r2, nan=-1))
    print(f"   depth matmul == slice (NaN-aware): {same}")

    # ---- (H,W,3) rgb decimation ------------------------------------------
    rgbv = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    def rgb_slice(eps):
        return (rgbv + eps)[::2, ::2].reshape(-1, 3)

    def rgb_einsum(eps):
        return jnp.einsum("hwc,wk->hkc", (rgbv + eps)[::2], Sx.T,
                          precision=HI).reshape(-1, 3)

    device_time("rgb (H,W,3) [::2,::2]+reshape", rgb_slice, K=32)
    device_time("rgb rowslice+einsum+reshape", rgb_einsum, K=32)
    r1, r2 = np.asarray(rgb_slice(0.0)), np.asarray(rgb_einsum(0.0))
    print(f"   rgb einsum max|diff|: {np.max(np.abs(r1 - r2)):.3e}")


if __name__ == "__main__":
    main()
