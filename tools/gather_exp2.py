#!/usr/bin/env python3
"""Warp-gather + fusion experiments for the dense photometric term.

Variants: f32 single-plane gather, complex64 packed gather, two f32
gathers, elementwise-chain baseline, and rgb_odometry with optimization
barriers that stop XLA re-computing the warp inside every consumer fusion.

Supersedes the round-2 gather_exp.py (deleted round 5), whose findings
stand: sorted vs random index order makes no measurable difference to
the TPU gather (no sort is worth paying for), and the half-resolution
resize is fastest as separable constant blend-matrix MXU matmuls (the
production resize_half_bilinear).  tools/gather_exp3.py adds the round-5
Pallas probe: Mosaic only lowers take_along_axis-style 2D gathers
(tpu.dynamic_gather needs input/indices/output shapes equal), which
cannot express an arbitrary image warp without lane-routing conflicts —
the XLA 64-bit (N,2) row gather at ~4.5 ns/row stays the floor.

    python tools/gather_exp2.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from rgb_dense_prof import device_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    H, W = 480, 640
    N = H * W
    rng = np.random.RandomState(0)
    # warp-like indices: near-identity flow, mostly sorted
    flow = rng.randint(-8 * W, 8 * W, N)
    lin_np = np.clip(np.arange(N) + flow, 0, N - 1).astype(np.int32)
    lin = jax.device_put(jnp.asarray(lin_np))
    a = jax.device_put(jnp.asarray(rng.rand(N).astype(np.float32)))
    b = jax.device_put(jnp.asarray(rng.rand(N).astype(np.float32)))
    pk = jax.jit(jax.lax.complex)(a, b)
    ab2 = jax.jit(lambda x, y: jnp.stack([x, y], -1))(a, b)    # (N, 2)

    def g_f32(eps, aa, idx):
        return jnp.take(aa, idx + (eps * 0).astype(jnp.int32), mode="clip").sum()

    def g_c64(eps, pp, idx):
        got = jnp.take(pp, idx + (eps * 0).astype(jnp.int32), mode="clip")
        return jnp.real(got).sum() + jnp.imag(got).sum()

    def g_2xf32(eps, aa, bb, idx):
        i2 = idx + (eps * 0).astype(jnp.int32)
        return jnp.take(aa, i2, mode="clip").sum() \
            + jnp.take(bb, i2, mode="clip").sum()

    def g_rows2(eps, ab, idx):
        i2 = idx + (eps * 0).astype(jnp.int32)
        got = jnp.take(ab, i2, axis=0, mode="clip")
        return got.sum()

    def g_sorted(eps, aa, idx):
        # identity indices: is the gather cheaper when trivially coalesced?
        i2 = jnp.arange(N, dtype=jnp.int32) + (eps * 0).astype(jnp.int32)
        return jnp.take(aa, i2, mode="clip").sum()

    def ew_chain(eps, aa, bb):
        x = aa + eps
        for _ in range(15):
            x = x * bb + aa
        return x.sum()

    device_ms("f32 gather (N)", g_f32, (a, lin))
    device_ms("c64 packed gather (N)", g_c64, (pk, lin))
    device_ms("2x f32 gathers", g_2xf32, (a, b, lin))
    device_ms("(N,2) row gather", g_rows2, (ab2, lin))
    device_ms("f32 gather, identity idx", g_sorted, (a, lin))
    device_ms("30-plane elementwise chain", ew_chain, (a, b))

    # --- barriered rgb_odometry --------------------------------------
    from nerf_fusion_tpu.ops import imgproc
    from nerf_fusion_tpu.system.tracker import TrackerConfig
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.system.frontend import preprocess_frame

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

    K3 = np.array([[c.fx, 0, c.cx], [0, c.fy, c.cy], [0, 0, 1.0]], np.float32)
    Kinv = np.linalg.inv(K3)

    def krkt(eps):
        dR = jnp.eye(3) + eps * jnp.ones((3, 3)) * 1e-9
        dt = jnp.ones(3) * (1e-4 + eps * 1e-12)
        return jnp.asarray(K3) @ dR @ jnp.asarray(Kinv), jnp.asarray(K3) @ dt

    def odo(eps, *lv):
        krkinv, kt = krkt(eps)
        return imgproc.rgb_odometry(lv[0], lv[1], lv[2], lv[3], lv[4],
                                    c.fx, c.fy, c.cx, c.cy, krkinv, kt,
                                    tcfg.min_grad_scale,
                                    tcfg.max_depth_delta, stride=1)

    def odo_barrier(eps, *lv):
        prev_i, prev_d, cur_i, cur_d, cur_g = lv
        gx, gy = cur_g[0], cur_g[1]
        krkinv, kt = krkt(eps)
        d1 = cur_d
        grad2 = gx * gx + gy * gy
        ok = jnp.isfinite(grad2) & (grad2 >= tcfg.min_grad_scale) \
            & jnp.isfinite(d1)
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        wz = d1 * (krkinv[2, 0] * u + krkinv[2, 1] * v + krkinv[2, 2]) + kt[2]
        u0 = jnp.round((d1 * (krkinv[0, 0] * u + krkinv[0, 1] * v
                              + krkinv[0, 2]) + kt[0]) / wz).astype(jnp.int32)
        v0 = jnp.round((d1 * (krkinv[1, 0] * u + krkinv[1, 1] * v
                              + krkinv[1, 2]) + kt[1]) / wz).astype(jnp.int32)
        inb = (u0 >= 0) & (u0 < W) & (v0 >= 0) & (v0 < H)
        u0c = jnp.clip(u0, 0, W - 1)
        v0c = jnp.clip(v0, 0, H - 1)
        # materialize warp results ONCE
        u0c, v0c, inb, wz = jax.lax.optimization_barrier((u0c, v0c, inb, wz))
        lin = (v0c * W + u0c).reshape(-1)
        packed = jax.lax.complex(prev_i, prev_d).reshape(-1)
        got = jnp.take(packed, lin, mode="clip").reshape(H, W)
        i0 = jnp.real(got)
        d0 = jnp.imag(got)
        i0, d0 = jax.lax.optimization_barrier((i0, d0))
        ok = ok & inb & jnp.isfinite(d0) & (d0 > 0.0) \
            & (jnp.abs(wz - d0) <= tcfg.max_depth_delta)
        f = jnp.where(ok, cur_i - i0, 0.0)
        Gx = d0 * (u0c.astype(jnp.float32) - c.cx) / c.fx
        Gy = d0 * (v0c.astype(jnp.float32) - c.cy) / c.fy
        Gz = jnp.maximum(d0, 1e-6)
        p0_ = gx * c.fx / Gz
        p1_ = gy * c.fy / Gz
        p2_ = -(p0_ * Gx + p1_ * Gy) / Gz
        J = jnp.stack([p0_, p1_, p2_,
                       -Gz * p1_ + Gy * p2_,
                       Gz * p0_ - Gx * p2_,
                       -Gy * p0_ + Gx * p1_], axis=0)
        J = jnp.where(ok[None, ...], J, 0.0)
        return f, J, ok

    def term(odo_fn):
        def run(eps, *lv):
            f, J, ok = odo_fn(eps, *lv)
            m = ok.astype(f.dtype)
            w2 = m.reshape(-1)
            J2 = J.reshape(6, -1)
            f2 = f.reshape(-1)
            Hm = jnp.einsum("an,bn->ab", J2 * w2[None], J2,
                            precision=jax.lax.Precision.HIGHEST)
            g = jnp.einsum("an,n->a", J2, w2 * f2,
                           precision=jax.lax.Precision.HIGHEST)
            return Hm, g, jnp.sum(f2 * (w2 * f2))
        return run

    def odo_row_barrier(eps, *lv):
        prev_i, prev_d, cur_i, cur_d, cur_g = lv
        gx, gy = cur_g[0], cur_g[1]
        krkinv, kt = krkt(eps)
        d1 = cur_d
        grad2 = gx * gx + gy * gy
        ok = jnp.isfinite(grad2) & (grad2 >= tcfg.min_grad_scale) \
            & jnp.isfinite(d1)
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        wz = d1 * (krkinv[2, 0] * u + krkinv[2, 1] * v + krkinv[2, 2]) + kt[2]
        u0 = jnp.round((d1 * (krkinv[0, 0] * u + krkinv[0, 1] * v
                              + krkinv[0, 2]) + kt[0]) / wz).astype(jnp.int32)
        v0 = jnp.round((d1 * (krkinv[1, 0] * u + krkinv[1, 1] * v
                              + krkinv[1, 2]) + kt[1]) / wz).astype(jnp.int32)
        inb = (u0 >= 0) & (u0 < W) & (v0 >= 0) & (v0 < H)
        u0c = jnp.clip(u0, 0, W - 1)
        v0c = jnp.clip(v0, 0, H - 1)
        u0c, v0c, inb, wz = jax.lax.optimization_barrier((u0c, v0c, inb, wz))
        lin = (v0c * W + u0c).reshape(-1)
        rows = jnp.stack([prev_i.reshape(-1), prev_d.reshape(-1)], -1)
        got = jnp.take(rows, lin, axis=0, mode="clip")
        i0 = got[:, 0].reshape(H, W)
        d0 = got[:, 1].reshape(H, W)
        i0, d0 = jax.lax.optimization_barrier((i0, d0))
        ok = ok & inb & jnp.isfinite(d0) & (d0 > 0.0) \
            & (jnp.abs(wz - d0) <= tcfg.max_depth_delta)
        f = jnp.where(ok, cur_i - i0, 0.0)
        Gx = d0 * (u0c.astype(jnp.float32) - c.cx) / c.fx
        Gy = d0 * (v0c.astype(jnp.float32) - c.cy) / c.fy
        Gz = jnp.maximum(d0, 1e-6)
        p0_ = gx * c.fx / Gz
        p1_ = gy * c.fy / Gz
        p2_ = -(p0_ * Gx + p1_ * Gy) / Gz
        J = jnp.stack([p0_, p1_, p2_,
                       -Gz * p1_ + Gy * p2_,
                       Gz * p0_ - Gx * p2_,
                       -Gy * p0_ + Gx * p1_], axis=0)
        J = jnp.where(ok[None, ...], J, 0.0)
        return f, J, ok

    device_ms("odo plain", odo, level)
    device_ms("odo row-gather barriered", odo_row_barrier, level)
    device_ms("term row-gather barriered", term(odo_row_barrier), level)
    device_ms("odo barriered", odo_barrier, level)
    device_ms("term plain (odo+reduce)", term(odo), level)
    device_ms("term barriered (odo+reduce)", term(odo_barrier), level)

    # numeric agreement
    o1 = jax.jit(lambda *lv: term(odo)(np.float32(0.0), *lv))(*level)
    o2 = jax.jit(lambda *lv: term(odo_barrier)(np.float32(0.0), *lv))(*level)
    o3 = jax.jit(lambda *lv: term(odo_row_barrier)(np.float32(0.0), *lv))(*level)
    for x, y in zip(jax.tree_util.tree_leaves(o1), jax.tree_util.tree_leaves(o3)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(o1), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    print("barriered == plain numerically")


if __name__ == "__main__":
    main()
