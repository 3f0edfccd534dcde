"""SDF + photometric camera tracker: Gauss-Newton entirely on device.

Capability parity with the reference ``SDFTracker`` (system/tracker.py:27-288;
SURVEY.md §2.1), redesigned TPU-first (SURVEY.md §7.1):

  * the whole staged iteration schedule (``iter_config``) runs inside ONE
    jitted program — three ``lax.scan`` loops (one per group) carrying the
    delta pose; the reference instead syncs device->host EVERY iteration
    for a numpy 6x6 solve (tracker.py:277);
  * SDF residuals: ``r = mu(T p)/sigma`` with the position Jacobian via
    ``jax.vjp`` through the decoder, chain-ruled to the left-perturbation
    twist of the last pose exactly as the reference derives it
    (tracker.py:196-205: J = [dS/dx R_last, (delta p) x (dS/dx R_last)]);
  * photometric residuals: dense warp via ops.imgproc.rgb_odometry with
    per-level scaled intrinsics.  (Intentional fix: the reference passes
    full-resolution intrinsics at every pyramid level — tracker.py:144-150 —
    which mis-scales the coarse levels; we scale by 0.5^level.)
  * robust kernels (huber/tukey), per-group energy-increase rejection with
    revert (tracker.py:269-274), divergence safeguard raising the RGB
    weight after 3 unstable frames (tracker.py:281-286), and the optional
    ``motion`` prior term the reference's config format names but never
    implements.

Host-side state is just the pose list and two scalars; everything heavy is
functional and jitted.
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import se3_jax as sj
from ..utils.config import dict_to_args
from ..utils.se3 import Isometry
from ..ops import imgproc
from .frontend import preprocess_frame
from .map import get_sdf

_HI = jax.lax.Precision.HIGHEST


def _robust_weight(x, kernel: str, k: float):
    if kernel is None:
        return jnp.ones_like(x)
    if kernel == "huber":
        ax = jnp.abs(x)
        return jnp.where(ax > k, k / jnp.maximum(ax, 1e-12), 1.0)
    if kernel == "tukey":
        ax = jnp.abs(x)
        w = (1.0 - (x / k) ** 2) ** 2
        return jnp.where(ax <= k, w, 0.0)
    raise NotImplementedError(kernel)


class TrackerConfig(NamedTuple):
    """Static snapshot of the tracking yaml (fusion-lr-kt.yaml:42-52)."""
    iter_config: tuple          # ((n, (('sdf',), ('rgb', 0))), ...)
    sdf_robust_kernel: str
    sdf_robust_k: float
    subsample: float
    rgb_robust_kernel: str
    rgb_robust_k: float
    min_grad_scale: float
    max_depth_delta: float
    motion_weight: float

    @staticmethod
    def from_args(args) -> "TrackerConfig":
        sdf = args.sdf if isinstance(args.sdf, dict) else vars(args.sdf)
        rgb = args.rgb if isinstance(args.rgb, dict) else vars(args.rgb)
        groups = []
        for g in args.iter_config:
            terms = tuple(tuple(t) for t in g["type"])
            groups.append((int(g["n"]), terms))
        return TrackerConfig(
            iter_config=tuple(groups),
            sdf_robust_kernel=sdf.get("robust_kernel"),
            sdf_robust_k=float(sdf.get("robust_k", 1.0)),
            subsample=float(sdf.get("subsample", 0.5)),
            rgb_robust_kernel=rgb.get("robust_kernel"),
            rgb_robust_k=float(rgb.get("robust_k", 0.01)),
            min_grad_scale=float(rgb.get("min_grad_scale", 0.0)),
            max_depth_delta=float(rgb.get("max_depth_delta", 0.2)),
            motion_weight=float(getattr(args, "motion", {}).get("weight", 1.0)
                                if hasattr(args, "motion") else 1.0),
        )


def _sdf_Hg(map_state, map_cfg, dec_params, dec_cfg, tcfg: TrackerConfig,
            last_R, last_t, dR, dt, pts, mask):
    """SDF term: H (6,6), g (6,), energy ()."""
    p_delta = sj.transform_points(dR, dt, pts)          # delta @ p
    p_world = sj.transform_points(last_R, last_t, p_delta)

    def res_fn(pw):
        sdf, std, valid = get_sdf(map_state, map_cfg, dec_params, dec_cfg, pw)
        return sdf / jax.lax.stop_gradient(std), valid

    r, vjp, valid = jax.vjp(res_fn, p_world, has_aux=True)
    dsdf_dpos = vjp(jnp.ones_like(r))[0]                # (M, 3)

    m = (mask & valid).astype(r.dtype)
    # Twist lives in the last-camera frame (update: delta <- exp(xi) o delta),
    # so the world gradient chain-rules through d x_world/d rho = R_last:
    # J_rho = dS/dx @ R_last.  (The reference applies R_last^T here,
    # tracker.py:202-203 — invisible on lr-kt only because its canonical
    # first pose is a pi-rotation, which is a symmetric matrix.)
    Lai = jnp.matmul(dsdf_dpos, last_R, precision=_HI)  # (M,3)
    Lbi = jnp.cross(p_delta, Lai)
    J = jnp.concatenate([Lai, Lbi], axis=-1)            # (M, 6)

    w = _robust_weight(r, tcfg.sdf_robust_kernel, tcfg.sdf_robust_k) * m
    n_valid = jnp.maximum(jnp.sum(m), 1.0)
    scale = 1.0 / n_valid
    H = jnp.einsum("ni,nj->ij", J * w[:, None], J, precision=_HI) * scale
    g = jnp.sum(J * (w * r)[:, None], axis=0) * scale
    energy = jnp.sum(r * (w * r)) * scale
    return H, g, energy


def _rgb_Hg(tcfg: TrackerConfig, level_data, fx, fy, cx, cy,
            dR, dt, rgb_weight):
    """Photometric term at one pyramid level."""
    prev_i, prev_d, cur_i, cur_d, cur_g = level_data
    K = jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    Kinv = jnp.asarray([[1.0 / fx, 0.0, -cx / fx],
                        [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]])
    krkinv = K @ dR @ Kinv
    kt = K @ dt
    f, J, ok = imgproc.rgb_odometry(prev_i, prev_d, cur_i, cur_d, cur_g,
                                    fx, fy, cx, cy, krkinv, kt,
                                    tcfg.min_grad_scale, tcfg.max_depth_delta)
    J = -J  # kernel computes d/d(-xi) (reference tracker.py:162)
    m = ok.astype(f.dtype)
    w = _robust_weight(f, tcfg.rgb_robust_kernel, tcfg.rgb_robust_k) * m
    n_valid = jnp.maximum(jnp.sum(m), 1.0)
    scale = rgb_weight / n_valid
    Jf = J.reshape(-1, 6)
    ff = f.reshape(-1)
    wf = w.reshape(-1)
    H = jnp.einsum("ni,nj->ij", Jf * wf[:, None], Jf, precision=_HI) * scale
    g = jnp.sum(Jf * (wf * ff)[:, None], axis=0) * scale
    energy = jnp.sum(ff * (wf * ff)) * scale
    return H, g, energy


def _motion_Hg(tcfg: TrackerConfig, dR, dt):
    """Constant-velocity prior: penalise the delta twist (named in the
    reference's config format, left unimplemented there)."""
    xi = jnp.concatenate([dt, sj.so3_log(dR)])
    w = tcfg.motion_weight
    H = w * jnp.eye(6)
    g = w * xi
    energy = w * jnp.sum(xi * xi)
    return H, g, energy


@functools.partial(jax.jit, static_argnames=("map_cfg", "dec_cfg", "tcfg"))
def track_gauss_newton(map_state, map_cfg, dec_params, dec_cfg, tcfg: TrackerConfig,
                       prev_pyr, cur_pyr, pts, mask,
                       last_R, last_t, init_dR, init_dt,
                       fx, fy, cx, cy, rgb_weight):
    """Run the full staged GN schedule; returns (dR, dt, iters_used (G,))."""

    def group_scan(carry_in, group):
        n_iters, terms = group

        def build_Hg(dR, dt):
            H = jnp.zeros((6, 6))
            g = jnp.zeros((6,))
            energy = 0.0
            for term in terms:
                if term[0] == "sdf":
                    Hs, gs, es = _sdf_Hg(map_state, map_cfg, dec_params, dec_cfg,
                                         tcfg, last_R, last_t, dR, dt, pts, mask)
                    H, g, energy = H + Hs, g + gs, energy + es
                elif term[0] == "rgb":
                    lev = int(term[1]) if len(term) > 1 else 0
                    s = 0.5 ** lev
                    level_data = (prev_pyr.intensity[lev], prev_pyr.depth[lev],
                                  cur_pyr.intensity[lev], cur_pyr.depth[lev],
                                  cur_pyr.gradient[lev])
                    Hr, gr, er = _rgb_Hg(tcfg, level_data, fx * s, fy * s,
                                         cx * s, cy * s, dR, dt, rgb_weight)
                    H, g, energy = H + Hr, g + gr, energy + er
                elif term[0] == "motion":
                    Hm, gm, em = _motion_Hg(tcfg, dR, dt)
                    H, g, energy = H + Hm, g + gm, energy + em
            return H, g, energy

        def body(carry, i):
            dR, dt, bR, bt, last_energy, done, used = carry
            H, g, energy = build_Hg(dR, dt)
            worse = energy > last_energy
            # revert & stop on energy increase (tracker.py:269-274)
            newly_done = done | worse
            bR2 = jnp.where(worse | done, bR, dR)
            bt2 = jnp.where(worse | done, bt, dt)
            best_energy = jnp.where(worse | done, last_energy, energy)
            # solve + update unless finished or on the trailing eval pass
            xi = jnp.linalg.solve(H + 1e-9 * jnp.eye(6), -g)
            eR, et = sj.se3_exp(xi)
            nR, nt = sj.compose(eR, et, dR, dt)
            do_update = (~newly_done) & (i < n_iters)
            dR2 = jnp.where(do_update, nR, bR2)
            dt2 = jnp.where(do_update, nt, bt2)
            used2 = jnp.where(newly_done, used, i)
            return (dR2, dt2, bR2, bt2, best_energy, newly_done, used2), energy

        dR, dt = carry_in
        init = (dR, dt, dR, dt, jnp.inf, jnp.asarray(False), jnp.asarray(0))
        (dR, dt, bR, bt, _, done, used), _ = jax.lax.scan(
            body, init, jnp.arange(n_iters + 1))
        return (bR, bt), used

    dR, dt = init_dR, init_dt
    iters_used = []
    for group in tcfg.iter_config:
        (dR, dt), used = group_scan((dR, dt), group)
        iters_used.append(used)
    return dR, dt, jnp.stack(iters_used)


class SDFTracker:
    """Host-side tracker state machine (API parity: system/tracker.py:27)."""

    def __init__(self, vmap, args, point_budget: int = 16384):
        self.map = vmap
        self.args = args
        if isinstance(args, dict):
            args = dict_to_args(args)
        self.tcfg = TrackerConfig.from_args(args)
        rgb = args.rgb if isinstance(args.rgb, dict) else vars(args.rgb)
        self.rgb_weight = float(rgb["weight"])
        self.point_budget = point_budget
        self.all_pd_pose = []
        self.prev_pyr = None
        self.last_processed_pc = None
        self.n_unstable = 0

    def preprocess(self, rgb, depth, calib, depth_cut=(0.5, 5.0)):
        pre = preprocess_frame(jnp.asarray(rgb, jnp.float32),
                               jnp.asarray(depth, jnp.float32),
                               calib.fx, calib.fy, calib.cx, calib.cy,
                               depth_cut[0], depth_cut[1], self.point_budget)
        return pre

    def track_camera(self, rgb, depth, calib, set_pose: Isometry = None,
                     depth_cut=(0.5, 5.0)):
        pre = self.preprocess(rgb, depth, calib, depth_cut)
        self.last_processed_pc = (np.asarray(pre.points), np.asarray(pre.normals),
                                  np.asarray(pre.mask))

        if set_pose is not None:
            final = set_pose
        else:
            assert self.all_pd_pose, "first frame needs set_pose (first_iso)"
            last = self.all_pd_pose[-1]
            last_R = jnp.asarray(last.q.rotation_matrix, jnp.float32)
            last_t = jnp.asarray(last.t, jnp.float32)
            dR, dt, iters = track_gauss_newton(
                self.map.state, self.map.cfg,
                self.map.model.decoder_params, self.map.model.decoder_config,
                self.tcfg, self.prev_pyr, pre.pyramid,
                pre.points, pre.mask, last_R, last_t,
                jnp.eye(3), jnp.zeros(3),
                calib.fx, calib.fy, calib.cx, calib.cy,
                jnp.asarray(self.rgb_weight, jnp.float32))
            delta = Isometry.from_matrix(np.asarray(dR, np.float64),
                                         np.asarray(dt, np.float64), ortho=True)
            final = last.dot(delta)
            # divergence safeguard (tracker.py:281-286)
            if int(np.asarray(iters)[-1]) >= 10:
                self.n_unstable += 1
                if self.n_unstable >= 3:
                    self.rgb_weight = max(self.rgb_weight, 500.0)

        self.prev_pyr = pre.pyramid
        self.all_pd_pose.append(final)
        return final
