#!/usr/bin/env python3
"""Round-5 warp-gather shootout: XLA row gather vs Pallas VMEM gather.

The dense stride-1 photometric term (parity config fusion-lr-kt.yaml)
re-gathers the previous frame's (intensity, depth) at warped pixel
locations every GN iteration; round 4 settled on a (N,2) minor-dim row
gather (1.30 ms at 307k rows).  The gather source is only 2.4 MB — it
fits in VMEM — so a Pallas kernel that pins the source on-chip and
gathers per index chunk may beat XLA's HBM gather lowering.

    python tools/gather_exp3.py
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

H, W = 480, 640
S = H * W
N = S


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
    print(f"{name:55s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(S, 2)).astype(np.float32))
    # warp-like indices: near-identity with small smooth displacement
    base = np.arange(S, dtype=np.int64)
    disp = (rng.normal(size=S) * 3).astype(np.int64)
    idx_np = np.clip(base + disp + 640 * (rng.integers(-2, 3, S)), 0, S - 1)
    idx = jnp.asarray(idx_np.astype(np.int32))

    def xla_row(eps, rows, idx):
        got = jnp.take(rows, idx + (eps > 1e30).astype(jnp.int32), axis=0,
                       mode="clip")
        return got

    device_ms("XLA (N,2) row gather [prod]", xla_row, (rows, idx))

    from jax.experimental import pallas as pl

    CH = 32768  # index chunk per grid step

    def pl_kern(idx_ref, src_ref, out_ref):
        out_ref[...] = jnp.take(src_ref[...], idx_ref[...], axis=0,
                                mode="clip")

    def pallas_gather(eps, rows, idx):
        i = idx + (eps > 1e30).astype(jnp.int32)
        return pl.pallas_call(
            pl_kern,
            grid=(N // CH,),
            in_specs=[pl.BlockSpec((CH,), lambda g: (g,)),
                      pl.BlockSpec((S, 2), lambda g: (0, 0))],
            out_specs=pl.BlockSpec((CH, 2), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 2), jnp.float32),
        )(i, rows)

    try:
        got = jax.jit(pallas_gather)(np.float32(0.0), rows, idx)
        ok = np.allclose(np.asarray(got), np.asarray(rows)[idx_np])
        print(f"pallas VMEM gather correct: {ok}")
        device_ms("pallas VMEM (N,2) gather, chunk 32k", pallas_gather,
                  (rows, idx))
    except Exception as e:  # noqa: BLE001
        print(f"pallas (N,2) gather failed to lower: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # single-plane variant
    plane = rows[:, 0]

    def pl_kern1(idx_ref, src_ref, out_ref):
        out_ref[...] = jnp.take(src_ref[...], idx_ref[...], mode="clip")

    def pallas_gather1(eps, plane, idx):
        i = idx + (eps > 1e30).astype(jnp.int32)
        return pl.pallas_call(
            pl_kern1,
            grid=(N // CH,),
            in_specs=[pl.BlockSpec((CH,), lambda g: (g,)),
                      pl.BlockSpec((S,), lambda g: (0,))],
            out_specs=pl.BlockSpec((CH,), lambda g: (g,)),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        )(i, plane)

    try:
        got = jax.jit(pallas_gather1)(np.float32(0.0), plane, idx)
        ok = np.allclose(np.asarray(got), np.asarray(plane)[idx_np])
        print(f"pallas 1-plane gather correct: {ok}")
        device_ms("pallas VMEM (N,) gather, chunk 32k", pallas_gather1,
                  (plane, idx))
    except Exception as e:  # noqa: BLE001
        print(f"pallas (N,) gather failed to lower: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # 2D-source variant: gather rows of the (H, W) image by v0, then pick
    # columns — XLA comparison points
    def xla_single(eps, plane, idx):
        return jnp.take(plane, idx + (eps > 1e30).astype(jnp.int32),
                        mode="clip")

    device_ms("XLA (N,) single-plane gather", xla_single, (plane, idx))

    rows4 = jnp.concatenate([rows, rows], axis=1)

    def xla_row4(eps, rows4, idx):
        return jnp.take(rows4, idx + (eps > 1e30).astype(jnp.int32), axis=0,
                        mode="clip")

    device_ms("XLA (N,4) row gather", xla_row4, (rows4, idx))


if __name__ == "__main__":
    main()
