#!/usr/bin/env python3
"""Per-iteration SERIAL cost of the GN loop's non-term ops.

parity_framestep measured the staged schedule at ~1.23x the sum of its
isolated term costs; the suspects are the per-iteration serial chain
(6x6 solve -> se3_exp -> compose, all tiny tensors on the scalar/vector
units with no parallelism) and while_loop step overhead.  Times, in a
device fori loop: the solve chain alone, a while_loop of N trivial
iterations, and the two combined.

    python tools/gn_serial_prof.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def device_ms(name, fn, ops=(), K=64, repeats=4):
    import jax
    import jax.numpy as jnp

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
    print(f"{name:55s} {ms:8.4f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.utils import se3_jax as sj

    rng = np.random.default_rng(0)
    Hm = jnp.asarray((lambda a: a @ a.T + 10 * np.eye(6))(
        rng.normal(size=(6, 6))).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)

    def chain(eps, Hm, g, R, t):
        xi = jnp.linalg.solve(Hm + (1e-9 + eps * 0) * jnp.eye(6), -g)
        xi = jnp.where(jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))
        eR, et = sj.se3_exp(xi + eps * 1e-20)
        nR, nt = sj.compose(eR, et, R, t)
        return nR, nt

    device_ms("solve+exp+compose chain (x1)", chain, (Hm, g, R0, t0))

    def chain10(eps, Hm, g, R, t):
        def body(_, c):
            R, t = c
            return chain(eps, Hm, g, R, t)
        return jax.lax.fori_loop(0, 10, body, (R, t))

    device_ms("solve+exp+compose chain (x10 serial)", chain10,
              (Hm, g, R0, t0))

    # while_loop of 10 near-trivial iterations carrying the GN state tuple
    def wl(eps, Hm, g, R, t):
        def cond(st):
            return st[0] < 10

        def body(st):
            i, R, t, bR, bt, e, done, used = st
            nR = R + eps * 1e-20
            return (i + 1, nR, t, bR, bt, e + 1.0, done, used)

        st = (jnp.asarray(0), R, t, R, t, jnp.asarray(0.0),
              jnp.asarray(False), jnp.asarray(0))
        out = jax.lax.while_loop(cond, body, st)
        return out[1], out[5]

    device_ms("while_loop x10, trivial body, GN-shaped carry", wl,
              (Hm, g, R0, t0))

    # the 6x6 solve alone, and a hand-rolled Cholesky for comparison
    def solve_only(eps, Hm, g):
        return jnp.linalg.solve(Hm + eps * 0 * jnp.eye(6), -g)

    device_ms("jnp.linalg.solve 6x6 (x1)", solve_only, (Hm, g))

    def chol_solve(eps, Hm, g):
        A = Hm + eps * 0 * jnp.eye(6)
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, -g, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    device_ms("cholesky+2 triangular solves 6x6 (x1)", chol_solve, (Hm, g))


if __name__ == "__main__":
    main()
