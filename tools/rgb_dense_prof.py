#!/usr/bin/env python3
"""Decompose the dense stride-1 level-0 photometric iteration (the
parity-config fusion-lr-kt.yaml bottleneck: ~2 ms/GN-iter at 640x480).

Measures, with the device-loop protocol (MEMORY tpu-tunnel-measurement):
the full _rgb_Hg term, rgb_odometry alone, the warp gather alone, a
gather-free variant (roll stands in for the random access), and the H/g
einsum reduction alone.

    python tools/rgb_dense_prof.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def device_ms(name, fn, ops=(), K=32, repeats=4):
    """fn(eps, *ops); `ops` are passed as jit ARGUMENTS (closed-over device
    arrays would be baked as mlir constants -> D2H fetch, tunnel error)."""
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
    print(f"{name:58s} {ms:8.3f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.ops import imgproc
    from nerf_fusion_tpu.system import tracker as T
    from nerf_fusion_tpu.system.frontend import preprocess_frame
    from nerf_fusion_tpu.system.tracker import TrackerConfig
    from nerf_fusion_tpu.utils import config as exp_util

    repo = Path(__file__).resolve().parent.parent
    data = repo / "output" / "lrkt_data" / "lr-kt"
    args = exp_util.parse_config_yaml(repo / "configs" / "fusion-lr-kt.yaml")
    args.tracking = exp_util.dict_to_args(args.tracking)
    tcfg = TrackerConfig.from_args(args.tracking)
    tq = json.loads((data / "first_tq.json").read_text())
    seq = ICLNUIMSequence(path=str(data), start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    f0, f1 = next(seq), next(seq)
    c = f0.calib

    pre = jax.jit(lambda rgb, depth: preprocess_frame(
        rgb, depth, c.fx, c.fy, c.cx, c.cy,
        args.depth_cut_min, args.depth_cut_max, 40960))
    p0 = pre(jnp.asarray(np.asarray(f0.rgb)), jnp.asarray(np.asarray(f0.depth)))
    p1 = pre(jnp.asarray(np.asarray(f1.rgb)), jnp.asarray(np.asarray(f1.depth)))
    level = (p0.pyramid.intensity[0], p0.pyramid.depth[0],
             p1.pyramid.intensity[0], p1.pyramid.depth[0],
             p1.pyramid.gradient[0])
    prev_i, prev_d, cur_i, cur_d, cur_g = level
    H, W = np.asarray(cur_i).shape
    print(f"level0: {H}x{W}  stride={tcfg.rgb_stride} "
          f"min_grad={tcfg.min_grad_scale}")

    K3 = jnp.asarray([[c.fx, 0, c.cx], [0, c.fy, c.cy], [0, 0, 1.0]],
                     jnp.float32)
    Kinv = jnp.linalg.inv(K3)

    def krkt(eps):
        # a tiny eps-dependent rotation so the loop can't hoist the warp
        dR, dt = jnp.eye(3) + eps * jnp.ones((3, 3)) * 1e-9, \
            jnp.ones(3) * (1e-4 + eps * 1e-12)
        return K3 @ dR @ Kinv, K3 @ dt

    def full_term(eps, *lv):
        return T._rgb_Hg(tcfg, lv, c.fx, c.fy, c.cx, c.cy,
                         jnp.eye(3) + eps * 1e-12, jnp.ones(3) * 1e-4,
                         500.0)

    def odo_only(eps, *lv):
        krkinv, kt = krkt(eps)
        return imgproc.rgb_odometry(lv[0], lv[1], lv[2], lv[3], lv[4],
                                    c.fx, c.fy, c.cx, c.cy, krkinv, kt,
                                    tcfg.min_grad_scale,
                                    tcfg.max_depth_delta, stride=1)

    packed = jax.jit(lambda a, b: jax.lax.complex(a, b).reshape(-1))(
        prev_i, prev_d)
    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)

    def _warp_lin(eps, d1, uu, vv):
        krkinv, kt = krkt(eps)
        wz = d1 * (krkinv[2, 0] * uu + krkinv[2, 1] * vv + krkinv[2, 2]) + kt[2]
        u0 = jnp.round((d1 * (krkinv[0, 0] * uu + krkinv[0, 1] * vv
                              + krkinv[0, 2]) + kt[0]) / wz).astype(jnp.int32)
        v0 = jnp.round((d1 * (krkinv[1, 0] * uu + krkinv[1, 1] * vv
                              + krkinv[1, 2]) + kt[1]) / wz).astype(jnp.int32)
        return (jnp.clip(v0, 0, H - 1) * W
                + jnp.clip(u0, 0, W - 1)).reshape(-1)

    def gather_only(eps, pk, d1, uu, vv):
        got = jnp.take(pk, _warp_lin(eps, d1, uu, vv), mode="clip")
        return jnp.real(got).sum() + jnp.imag(got).sum()

    def warp_coords_only(eps, d1, uu, vv):
        return jnp.sum(_warp_lin(eps, d1, uu, vv))

    f_, J_, ok_ = jax.jit(lambda *lv: odo_only(np.float32(0.0), *lv))(*level)
    f_ = jax.block_until_ready(f_)

    def reduce_only(eps, ff, JJ, okk):
        f2 = (ff + eps * 1e-12).reshape(-1)
        J2 = JJ.reshape(6, -1)
        w2 = okk.astype(jnp.float32).reshape(-1)
        Hm = jnp.einsum("an,bn->ab", J2 * w2[None], J2,
                        precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("an,n->a", J2, w2 * f2,
                       precision=jax.lax.Precision.HIGHEST)
        return Hm, g, jnp.sum(f2 * f2)

    device_ms("full _rgb_Hg level0 dense (1 iter)", full_term, level)
    device_ms("rgb_odometry only (f,J,ok)", odo_only, level)
    device_ms("warp coords only (no gather)", warp_coords_only,
              (cur_d, u, v))
    device_ms("warp + packed complex64 gather", gather_only,
              (packed, cur_d, u, v))
    device_ms("H/g einsum reduction only", reduce_only, (f_, J_, ok_))


if __name__ == "__main__":
    main()
