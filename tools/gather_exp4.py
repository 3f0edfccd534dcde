#!/usr/bin/env python3
"""Probe Mosaic's tpu.dynamic_gather throughput for a windowed warp.

The dense photometric warp gather (1.39 ms at 307k pixels, XLA 64-bit
row gather) could instead be: (1) build a (H, B) operand whose row i
holds a B-lane window of the previous frame around image row i (pure
shifted copies, no gather), (2) one take_along_axis(axis=1) — the ONE
gather pattern Mosaic lowers natively (input/indices/output shapes all
equal).  This tool measures step (2) alone at candidate window widths,
plus the shifted-copy build of step (1).

RESULT (round 5, tunneled v5e): every tpu.dynamic_gather lowering —
take_along_axis along lanes at widths 1280-5120 AND the axis-0 sublane
variant — crashes the axon remote compile helper (HTTP 500 from
tpu_compile_helper; other Pallas kernels, e.g. ops/pallas_stencil.py,
compile fine).  The hardware-shuffle gather path is unusable in this
environment, so the dense warp keeps the XLA 64-bit (N,2) row gather
(~4.5 ns/row, tools/gather_exp3.py) as its floor.

    python tools/gather_exp4.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 480, 640


def device_ms(name, fn, ops=(), K=32, repeats=4):
    def leaf_contrib(leaf):
        x = jnp.asarray(leaf)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.where(jnp.isfinite(x), x, 0.0)
        return jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def run(k, eps0, *ops):
        def body(_, acc):
            out = fn(acc, *ops)
            c = sum(leaf_contrib(l) for l in jax.tree_util.tree_leaves(out))
            return acc + jnp.clip(c * 1e-20, -1e-8, 1e-8)
        return jax.lax.fori_loop(0, k, body, eps0)

    np.asarray(run(1, np.float32(0.0), *ops))

    def timed(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(k, np.float32(0.0), *ops))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (timed(2 * K) - timed(K)) / K * 1e3
    print(f"{name:58s} {ms:8.3f} ms")
    return ms


def lane_gather(B, rows_per_block=32):
    """pallas take_along_axis(axis=1) on (H, B) operand/idx/out."""
    def kern(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...],
                                           axis=1)

    def f(eps, src, idx):
        i = idx + (eps > 1e30).astype(jnp.int32)
        return pl.pallas_call(
            kern,
            grid=(H // rows_per_block,),
            in_specs=[pl.BlockSpec((rows_per_block, B), lambda g: (g, 0)),
                      pl.BlockSpec((rows_per_block, B), lambda g: (g, 0))],
            out_specs=pl.BlockSpec((rows_per_block, B), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((H, B), jnp.float32),
        )(src, i)

    return f


def main():
    rng = np.random.default_rng(0)
    for B in (1280, 1920, 3200, 5120):
        src = jnp.asarray(rng.normal(size=(H, B)).astype(np.float32))
        idx_np = rng.integers(0, B, (H, B)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        f = lane_gather(B)
        try:
            got = jax.jit(f)(np.float32(0.0), src, idx)
            ok = np.allclose(np.asarray(got),
                             np.take_along_axis(np.asarray(src), idx_np, 1))
            print(f"B={B}: correct {ok}")
            device_ms(f"pallas take_along_axis lanes (480,{B})", f,
                      (src, idx))
        except Exception as e:  # noqa: BLE001
            print(f"B={B} failed: {type(e).__name__}: {str(e)[:200]}")

    # XLA take_along_axis for comparison (same pattern, no pallas)
    B = 3200
    src = jnp.asarray(rng.normal(size=(H, B)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, B, (H, B)).astype(np.int32))

    def xla_tala(eps, src, idx):
        i = idx + (eps > 1e30).astype(jnp.int32)
        return jnp.take_along_axis(src, i, axis=1)

    device_ms("XLA take_along_axis lanes (480,3200)", xla_tala, (src, idx))

    # window build: 5 shifted copies of a (H, W) image into (H, 5*W),
    # with a dynamic global row shift dv.
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    def build(eps, img):
        dv = (eps > 1e30).astype(jnp.int32)           # dynamic, 0 at runtime
        rows = []
        for k in range(-2, 3):
            start = jnp.clip(dv + k, -H + 1, H - 1)
            shifted = jnp.roll(img, -start, axis=0)
            rows.append(shifted)
        return jnp.concatenate(rows, axis=1)

    device_ms("window build: 5 dyn-shifted copies -> (480,3200)", build,
              (img,))

    # production-context comparison: the (N,2) row gather this would replace
    S = H * W
    rows2 = jnp.asarray(rng.normal(size=(S, 2)).astype(np.float32))
    lin = jnp.asarray(rng.integers(0, S, (S,)).astype(np.int32))

    def xla_row(eps, rows2, lin):
        return jnp.take(rows2, lin + (eps > 1e30).astype(jnp.int32),
                        axis=0, mode="clip")

    device_ms("XLA (N,2) row gather [current prod]", xla_row, (rows2, lin))


if __name__ == "__main__":
    main()
