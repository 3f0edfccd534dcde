"""Background latent-code refinement (OptimizeProcess parity).

The reference ships a fork-server process that Adam-optimises the latent
codes of high-confidence voxels against a clamped Gaussian NLL with L2
code regularisation (system/map.py:29-113,457-517) — but keeps it dormant
(`.start()` commented out, do_optimize=False; SURVEY.md §7.4).  Here the
capability is functional and on-device:

  * target generation mirrors map.py:476-494: for refine-eligible voxels
    (obs_count >= encoder_count_th, not yet optimized), surface points are
    gathered with the x8 corner trick, jittered along their normals by
    ``sdf ~ N(0, 0.05^2)``, and the jitter becomes the SDF target;
  * a jitted ``lax.scan`` Adam loop optimises the (C, L) latent buffer
    under an eligibility mask (replacing torch Adam on gathered uniques);
  * async mode dispatches the same jitted program from a worker thread on
    an immutable state snapshot (no fork-server, no queues, no
    backup_vars) and merges with the reference's de-integration correction
    (map.py:321-335): latents fused *during* the window are preserved via
    ``new = old_cur + (opt - old) * orig_count / cur_count``.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import apply_decoder
from ..ops import voxel as vox
from .map import MapConfig, MapState, _CORNER_OFFSETS


class RefineResult(NamedTuple):
    latents: jnp.ndarray        # (C, L) optimised latent buffer
    refined: jnp.ndarray        # (C,) bool which slots were optimised
    old_latents: jnp.ndarray    # (C, L) snapshot at dispatch
    old_counts: jnp.ndarray     # (C,)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "dec_cfg", "n_iters"))
def refine_latents(state: MapState, cfg: MapConfig, dec_params, dec_cfg,
                   points, normals, valid, rng,
                   n_iters: int = 10, lr: float = 1e-2,
                   code_reg_lambda: float = 1e-2) -> RefineResult:
    """Optimise latents of eligible voxels against surface-consistency NLL."""
    C, L = state.latents.shape
    bound_min = jnp.asarray(cfg.bound_min, jnp.float32)
    xyz_norm = (points - bound_min[None, :]) / cfg.voxel_size

    eligible = (state.positions >= 0) & \
        (state.obs_count >= cfg.encoder_count_th) & (~state.optimized)

    # x8 corner gather restricted to eligible target voxels.
    n_xyz_arr = jnp.asarray(cfg.n_xyz, jnp.int32)
    offs = jnp.asarray(_CORNER_OFFSETS)
    tgt = jnp.ceil(xyz_norm[:, None, :] + offs[None, :, :]).astype(jnp.int32) - 1
    tgt = jnp.clip(tgt, 0, n_xyz_arr[None, None, :] - 1)
    rel = xyz_norm[:, None, :] - tgt.astype(jnp.float32) - 0.5
    tgt_gid = vox.linearize_id(tgt, cfg.n_xyz)
    tgt_slot = state.indexer[tgt_gid]
    slot_c = jnp.clip(tgt_slot, 0, C - 1)
    contrib = valid[:, None] & (tgt_slot >= 0) & eligible[slot_c]

    # targets: jitter along normals; the jitter is the gt sdf (map.py:487-488)
    gt_sdf = jax.random.normal(rng, tgt_slot.shape) * 0.05        # (N,8)
    pos = rel + gt_sdf[..., None] * normals[:, None, :]           # (N,8,3)

    flat_slot = slot_c.reshape(-1)
    flat_pos = pos.reshape(-1, 3)
    flat_gt = jnp.clip(gt_sdf.reshape(-1), -0.2, 0.2)
    flat_m = contrib.reshape(-1).astype(jnp.float32)
    n_samples = jnp.maximum(jnp.sum(flat_m), 1.0)

    def loss_fn(latents):
        lat = latents[flat_slot]
        sdf, std = apply_decoder(dec_params, dec_cfg,
                                 jnp.concatenate([lat, flat_pos], axis=1))
        mu = jnp.clip(sdf[:, 0], -0.2, 0.2)
        sig = std[:, 0]
        nll = 0.5 * ((flat_gt - mu) / sig) ** 2 + jnp.log(sig)
        ll = jnp.sum(nll * flat_m) / n_samples
        reg = code_reg_lambda * jnp.sum(
            jnp.linalg.norm(latents, axis=1) * eligible) / n_samples
        return ll + reg

    # Adam on the masked latent buffer.
    b1, b2, eps = 0.9, 0.999, 1e-8
    def step(carry, i):
        lat, m, v = carry
        g = jax.grad(loss_fn)(lat)
        g = g * eligible[:, None]
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1.0))
        vh = v / (1 - b2 ** (i + 1.0))
        lat = lat - lr * mh / (jnp.sqrt(vh) + eps)
        return (lat, m, v), None

    init = (state.latents, jnp.zeros_like(state.latents),
            jnp.zeros_like(state.latents))
    (lat_opt, _, _), _ = jax.lax.scan(step, init, jnp.arange(n_iters))
    return RefineResult(lat_opt, eligible, state.latents, state.obs_count)


def merge_refined(state: MapState, res: RefineResult,
                  deintegrate: bool) -> MapState:
    """Fold an optimisation result back into the (possibly newer) state."""
    mask = res.refined
    if deintegrate:
        cur = jnp.maximum(state.obs_count, 1.0)[:, None]
        orig = res.old_counts[:, None]
        merged = state.latents + (res.latents - res.old_latents) * orig / cur
    else:
        merged = res.latents
    latents = jnp.where(mask[:, None], merged, state.latents)
    optimized = state.optimized | mask
    return state._replace(latents=latents, optimized=optimized)


class AsyncRefiner:
    """Single-outstanding-job async wrapper (replaces OptimizeProcess).

    With ``device`` set, reproduces the reference's aux-GPU placement
    (main.py:124-132, system/map.py:222-226): the state snapshot, decoder
    params and frame points are ``device_put`` onto the aux device, the
    whole Adam program runs there (overlapping tracking/fusion on device
    0), and the result transfers back at collect time — explicit
    device-to-device copies over ICI instead of the reference's mp.Queue
    tensor shipping.
    """

    def __init__(self, device=None):
        self.pool = ThreadPoolExecutor(max_workers=1)
        self.future = None
        self.device = device
        self._dec_params_aux = None   # decoder weights cached on aux device

    def busy(self) -> bool:
        return self.future is not None and not self.future.done()

    def dispatch(self, state, cfg, dec_params, dec_cfg,
                 points, normals, valid, rng, **kwargs):
        assert not self.busy()
        if self.device is not None:
            if self._dec_params_aux is None:
                self._dec_params_aux = jax.device_put(dec_params, self.device)
            dec_params = self._dec_params_aux
            state, points, normals, valid, rng = jax.device_put(
                (state, points, normals, valid, rng), self.device)
        self.future = self.pool.submit(
            lambda: jax.block_until_ready(refine_latents(
                state, cfg, dec_params, dec_cfg,
                points, normals, valid, rng, **kwargs)))

    def collect(self, device=None):
        """Return the finished RefineResult (moved to ``device``), or None."""
        if self.future is not None and self.future.done():
            res = self.future.result()
            self.future = None
            if self.device is not None:
                # D2D copy back to the fusion device (ICI on TPU slices).
                res = jax.device_put(res, device or jax.devices()[0])
            return res
        return None
