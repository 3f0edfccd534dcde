"""Sparse latent voxel map ("PLIVox") as functional JAX state.

Capability parity with the reference ``DenseIndexedMap`` (system/map.py:158-580;
SURVEY.md §2.1/§3.3) redesigned TPU-first (SURVEY.md §7.1):

  * ``MapState`` is an immutable pytree of fixed-capacity buffers — a dense
    ``indexer`` (flat voxel id -> latent slot, -1 empty) plus SoA slot
    attributes (latents, positions, obs_count, optimized).  The reference's
    amortised buffer doubling (map.py:263-285), snapshot ``backup_vars`` and
    ``modifying_lock`` (map.py:214-233) all disappear: an old state IS a
    snapshot, so the async mesher can read one while integration produces
    the next.
  * ``integrate_keyframe`` is one jitted program: observation pruning by
    per-voxel support (torch.unique counts -> sort/searchsorted), voxel
    allocation with 6-neighbour dummy expansion (scatter by cumsum-rank
    instead of data-dependent shapes), the x8 corner gather, the shared
    point-encoder MLP, and the Bayesian running-mean latent update
    (segment-sum instead of the atomicAdd groupby CUDA kernel).
  * ``get_sdf`` evaluates the decoder on all query points with a validity
    mask (instead of boolean-compacting), so the tracker can differentiate
    straight through it on device.

Capacity overflow sets ``state.overflow`` which the host-side wrapper
checks after each integration (explicit failure instead of silent realloc).
"""

from __future__ import annotations

import functools
import logging
import threading
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import apply_decoder
from ..models.encoder import apply_encoder
from ..ops import voxel as vox


class MapConfig(NamedTuple):
    """Static (hashable) map geometry + fusion thresholds."""
    n_xyz: tuple                 # (Nx, Ny, Nz)
    voxel_size: float
    bound_min: tuple             # (3,)
    prune_min_vox_obs: int       # drop voxels observed by fewer points (map.py:374)
    ignore_count_th: float       # min obs count for SDF queries / meshing
    encoder_count_th: float      # stop encoder updates above this confidence
    latent_dim: int
    latent_capacity: int         # max allocated voxels (C)
    alloc_capacity: int          # max new voxels per integrate call

    @property
    def n_voxels(self):
        return int(np.prod(self.n_xyz))

    @staticmethod
    def from_args(args, latent_dim: int) -> "MapConfig":
        n_xyz = tuple(int(x) for x in np.ceil(
            (np.asarray(args.bound_max) - np.asarray(args.bound_min)) / args.voxel_size))
        return MapConfig(
            n_xyz=n_xyz,
            voxel_size=float(args.voxel_size),
            bound_min=tuple(float(x) for x in args.bound_min),
            prune_min_vox_obs=int(args.prune_min_vox_obs),
            ignore_count_th=float(args.ignore_count_th),
            encoder_count_th=float(args.encoder_count_th),
            latent_dim=latent_dim,
            latent_capacity=int(getattr(args, "latent_capacity", 40960)),
            alloc_capacity=int(getattr(args, "alloc_capacity", 8192)),
        )


class MapState(NamedTuple):
    """Donatable functional map state."""
    indexer: jnp.ndarray      # (n_voxels,) int32: flat voxel id -> slot | -1
    latents: jnp.ndarray      # (C, L) f32
    positions: jnp.ndarray    # (C,) int32: slot -> flat voxel id | -1
    obs_count: jnp.ndarray    # (C,) f32
    optimized: jnp.ndarray    # (C,) bool
    n_occupied: jnp.ndarray   # () int32
    overflow: jnp.ndarray     # () bool


def init_state(cfg: MapConfig) -> MapState:
    C = cfg.latent_capacity
    return MapState(
        indexer=jnp.full((cfg.n_voxels,), -1, jnp.int32),
        latents=jnp.zeros((C, cfg.latent_dim), jnp.float32),
        positions=jnp.full((C,), -1, jnp.int32),
        obs_count=jnp.zeros((C,), jnp.float32),
        optimized=jnp.zeros((C,), bool),
        n_occupied=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), bool),
    )


# The 8 corner offsets: every surface point contributes to the voxel that
# contains it under each half-voxel shift (map.py:186-189).
_CORNER_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-0.5, 0.5) for dy in (-0.5, 0.5) for dz in (-0.5, 0.5)],
    dtype=np.float32)


def _allocate(state: MapState, cfg: MapConfig, gid: jnp.ndarray, valid: jnp.ndarray):
    """Allocate slots for unseen voxels among ``gid`` plus 6-neighbour dummies."""
    # Unique unseen voxel ids among the observations.
    unseen = valid & (state.indexer[jnp.clip(gid, 0, cfg.n_voxels - 1)] == -1)
    uniq, uniq_valid, _, ovf1 = vox.masked_unique(gid, unseen, cfg.alloc_capacity)
    # Expand with the 6 axis neighbours (dummy voxels aiding mesh extraction).
    exp_ids, exp_valid = vox.expand_neighbors6(uniq, uniq_valid, cfg.n_xyz)
    cand, cand_valid, _, ovf2 = vox.masked_unique(exp_ids, exp_valid, 7 * cfg.alloc_capacity)
    # Keep only still-unallocated candidates and assign slots by rank.
    new = cand_valid & (state.indexer[cand] == -1)
    rank = jnp.cumsum(new) - 1
    n_new = jnp.sum(new).astype(jnp.int32)
    slot = state.n_occupied + rank.astype(jnp.int32)
    fits = new & (slot < cfg.latent_capacity)
    indexer = state.indexer.at[jnp.where(fits, cand, cfg.n_voxels)].set(
        jnp.where(fits, slot, -1), mode="drop")
    positions = state.positions.at[jnp.where(fits, slot, cfg.latent_capacity)].set(
        cand.astype(jnp.int32), mode="drop")
    n_occ = jnp.minimum(state.n_occupied + n_new, cfg.latent_capacity)
    overflow = state.overflow | ovf1 | ovf2 | (state.n_occupied + n_new > cfg.latent_capacity)
    return state._replace(indexer=indexer, positions=positions,
                          n_occupied=n_occ, overflow=overflow)


# NOTE: deliberately NOT donating `state`: the async mesher and refiner hold
# immutable snapshots of earlier states; donation would invalidate their
# buffers mid-read.  The copies this costs are ~10 MB of HBM traffic per
# keyframe — noise next to the encoder pass.
@functools.partial(jax.jit, static_argnames=("cfg", "enc_cfg"))
def integrate_keyframe(state: MapState, cfg: MapConfig,
                       enc_params, enc_bn, enc_cfg,
                       points: jnp.ndarray, normals: jnp.ndarray,
                       valid: jnp.ndarray,
                       pose_R: jnp.ndarray = None, pose_t: jnp.ndarray = None):
    """Fuse one oriented point cloud into the latent map.

    :param points:  (N, 3) surface points; camera-frame if pose given.
    :param normals: (N, 3) normals (same frame as points).
    :param valid:   (N,) bool padding mask.
    :param pose_R/pose_t: optional camera-to-world transform applied on
        device (keeps the per-frame loop free of host round-trips).
    :return: (new_state, updated_mask (C,) bool, stats dict)

    Mirrors system/map.py:341-453 (allocation + encoder fusion path; the
    latent-refinement branch lives in ``refine``).
    """
    if pose_R is not None:
        points = jnp.matmul(points, pose_R.T,
                            precision=jax.lax.Precision.HIGHEST) + pose_t[None, :]
        normals = jnp.matmul(normals, pose_R.T,
                             precision=jax.lax.Precision.HIGHEST)
    bound_min = jnp.asarray(cfg.bound_min, jnp.float32)
    xyz_norm, grid = vox.world_to_grid(points, bound_min, cfg.voxel_size)
    valid = valid & vox.in_bounds(grid, cfg.n_xyz)
    gid = vox.linearize_id(jnp.clip(grid, 0, jnp.asarray(cfg.n_xyz) - 1), cfg.n_xyz)

    # 1. Prune sparse observations (unique-count threshold, map.py:374-379).
    if cfg.prune_min_vox_obs > 0:
        counts = vox.occurrence_count(gid, valid)
        valid = valid & (counts > cfg.prune_min_vox_obs)

    # 2. Allocate unseen voxels (+ dummy neighbours).
    state = _allocate(state, cfg, gid, valid)

    # 3. Encoder-eligible voxels: allocated and still below the confidence cap.
    enc_slot_mask = (state.positions >= 0) & (state.obs_count < cfg.encoder_count_th)

    # Reference pre-prune (map.py:390-398): a point participates only if its
    # own voxel lies in the 6-neighbour expansion of the encoder voxel set.
    enc_pos = jnp.where(enc_slot_mask, state.positions, 0)
    exp_ids, exp_valid = vox.expand_neighbors6(enc_pos, enc_slot_mask, cfg.n_xyz)
    focus_grid = jnp.zeros((cfg.n_voxels,), bool).at[
        jnp.where(exp_valid, exp_ids, 0)].set(exp_valid, mode="drop")
    point_focus = valid & focus_grid[gid]

    # 4. x8 corner gather: assign each point to its 8 shifted voxels.
    n_xyz_arr = jnp.asarray(cfg.n_xyz, jnp.int32)
    offs = jnp.asarray(_CORNER_OFFSETS)                         # (8,3)
    tgt = jnp.ceil(xyz_norm[:, None, :] + offs[None, :, :]).astype(jnp.int32) - 1
    tgt = jnp.clip(tgt, 0, n_xyz_arr[None, None, :] - 1)        # (N,8,3)
    rel = xyz_norm[:, None, :] - tgt.astype(jnp.float32) - 0.5  # (N,8,3)
    tgt_gid = vox.linearize_id(tgt, cfg.n_xyz)                  # (N,8)
    tgt_slot = state.indexer[tgt_gid]                           # (N,8)
    # Per-PAIR validity only: the encoder-eligibility test
    # (enc_slot_mask[tgt_slot]) is per-SLOT and therefore constant within
    # a segment, so it moves AFTER the reduction — the per-pair gather of
    # a (C,) mask at 8N indices was ~4 ms of scalar-unit work in context.
    pair_ok = point_focus[:, None] & (tgt_slot >= 0)            # (N,8)

    feats = jnp.concatenate(
        [rel, jnp.broadcast_to(normals[:, None, :], rel.shape)], axis=-1
    ).reshape(-1, 6)                                            # (8N, 6)

    # 5. Shared-MLP encoder over all (point, corner) pairs.
    enc_latent, _ = apply_encoder(enc_params, enc_bn, enc_cfg, feats, train=False)

    # 6. Bayesian running-mean fusion via ONE (L+1)-channel segment-sum
    # (latent channels + pair count; map.py:446-452), slot-eligibility
    # applied post-reduction.
    seg = jnp.clip(tgt_slot.reshape(-1), 0, cfg.latent_capacity - 1)
    cmask = pair_ok.reshape(-1)
    packed = jnp.concatenate(
        [enc_latent, jnp.ones((enc_latent.shape[0], 1), enc_latent.dtype)],
        axis=1)
    red = vox.masked_segment_sum(packed, seg, cmask, cfg.latent_capacity)
    lat_sum = jnp.where(enc_slot_mask[:, None], red[:, :-1], 0.0)
    cnt = jnp.where(enc_slot_mask, red[:, -1], 0.0)
    new_total = state.obs_count + cnt
    fused = (lat_sum + state.latents * state.obs_count[:, None]) \
        / jnp.maximum(new_total, 1.0)[:, None]
    updated = cnt > 0
    latents = jnp.where(updated[:, None], fused, state.latents)
    state = state._replace(latents=latents, obs_count=new_total)

    stats = {
        "n_points": jnp.sum(valid), "n_updated_voxels": jnp.sum(updated),
        "n_occupied": state.n_occupied, "n_contrib": jnp.sum(cnt),
    }
    return state, updated, stats


def get_sdf(state: MapState, cfg: MapConfig, dec_params, dec_cfg,
            xyz: jnp.ndarray):
    """Decode SDF at world points. (sdf (N,), std (N,), valid (N,)).

    Parity: system/map.py:560-580 — voxel lookup, obs-count gating, decoder
    on voxel-local coords.  Invalid points still run through the decoder
    (static shapes); callers mask.  Differentiable w.r.t. ``xyz``.
    """
    bound_min = jnp.asarray(cfg.bound_min, jnp.float32)
    xyz_norm = (xyz - bound_min[None, :]) / cfg.voxel_size
    grid = jnp.ceil(jax.lax.stop_gradient(xyz_norm)).astype(jnp.int32) - 1
    inb = vox.in_bounds(grid, cfg.n_xyz)
    gid = vox.linearize_id(jnp.clip(grid, 0, jnp.asarray(cfg.n_xyz) - 1), cfg.n_xyz)
    slot = state.indexer[gid]
    slot_c = jnp.clip(slot, 0, cfg.latent_capacity - 1)
    valid = inb & (slot >= 0) & (state.obs_count[slot_c] > cfg.ignore_count_th)
    latent = state.latents[slot_c]                              # (N, L)
    rel = xyz_norm - grid.astype(jnp.float32) - 0.5
    sdf, std = apply_decoder(dec_params, dec_cfg,
                             jnp.concatenate([latent, rel], axis=1))
    return sdf[:, 0], std[:, 0], valid


class SparseVoxelMap:
    """Host-side wrapper: owns the functional state + model params.

    Mirrors the public surface of the reference ``DenseIndexedMap``
    (integrate_keyframe / get_sdf / extract_mesh / save / load) without its
    lock/snapshot machinery — old states are immutable snapshots.
    """

    def __init__(self, model, args, latent_dim: int, enable_async: bool = False,
                 aux_device=None):
        """``aux_device``: optional second jax device for background latent
        refinement (the reference's aux-GPU plan, main.py:124-132)."""
        self.model = model
        self.cfg = MapConfig.from_args(args, latent_dim)
        self.args = args
        self.state = init_state(self.cfg)
        self.enable_async = enable_async
        self.aux_device = aux_device
        self.main_device = None   # device of the fusion state (None = default)
        self.updated_slots = np.zeros((self.cfg.latent_capacity,), bool)
        self._updated_dev = None     # device-side accumulator (sync-free path)
        # Guards read-modify-writes of the updated-voxel accumulators: the
        # async mesher consumes them (and feeds leftovers back) from its
        # worker thread while integration appends from the main thread.
        self._upd_lock = threading.Lock()
        self.mesher = None  # attached lazily by system.mesher
        self.refiner = None
        self._refine_rng = jax.random.PRNGKey(
            int(getattr(args, "seed", 0)) + 1234)
        self.optim_n_iters = int(getattr(args, "optim_n_iters", 10))
        self.code_reg_lambda = float(getattr(args, "code_reg_lambda", 1e-2))
        logging.info("Map size Nx=%d Ny=%d Nz=%d (capacity %d voxels)",
                     *self.cfg.n_xyz, self.cfg.latent_capacity)

    @property
    def bound_min(self):
        return np.asarray(self.cfg.bound_min)

    @property
    def bound_max(self):
        return self.bound_min + np.asarray(self.cfg.n_xyz) * self.cfg.voxel_size

    def integrate_keyframe(self, points, normals, valid=None, pose=None,
                           do_optimize: bool = False, async_optimize: bool = False):
        """Fuse a frame. ``pose``: optional camera-to-world (Isometry or
        device (R, t)); with it, points/normals may stay camera-frame and
        device-resident — no host sync happens on this path."""
        from .refine import AsyncRefiner, merge_refined, refine_latents

        points = jnp.asarray(points, jnp.float32)
        normals = jnp.asarray(normals, jnp.float32)
        if valid is None:
            valid = jnp.ones((points.shape[0],), bool)
        pose_R = pose_t = None
        if pose is not None:
            if hasattr(pose, "q"):
                pose_R = jnp.asarray(pose.q.rotation_matrix, jnp.float32)
                pose_t = jnp.asarray(pose.t, jnp.float32)
            else:
                pose_R, pose_t = pose

        # Fold in a finished async refinement (de-integration merge,
        # reference map.py:361-364).
        if self.refiner is not None:
            res = self.refiner.collect(device=self.main_device)
            if res is not None:
                self.state = merge_refined(self.state, res, deintegrate=True)
                with self._upd_lock:
                    self.updated_slots |= np.asarray(res.refined)

        self.state, updated, stats = integrate_keyframe(
            self.state, self.cfg,
            self.model.encoder_params, self.model.encoder_bn,
            self.model.encoder_config,
            points, normals, valid, pose_R, pose_t)
        # Overflow is checked lazily (self.check_overflow()) to keep this
        # call sync-free; updated_slots accumulates on device.
        with self._upd_lock:
            self._updated_dev = (updated if self._updated_dev is None
                                 else self._updated_dev | updated)
        if logging.getLogger().isEnabledFor(logging.DEBUG):
            logging.debug("integrate: %d pts -> %d voxels updated (%d occupied)",
                          int(stats["n_points"]), int(stats["n_updated_voxels"]),
                          int(stats["n_occupied"]))

        # Optional latent refinement (OptimizeProcess parity; functional here).
        if do_optimize and self.optim_n_iters > 0:
            self._refine_rng, sub = jax.random.split(self._refine_rng)
            if async_optimize:
                if self.refiner is None:
                    self.refiner = AsyncRefiner(device=self.aux_device)
                if not self.refiner.busy():
                    self.refiner.dispatch(
                        self.state, self.cfg, self.model.decoder_params,
                        self.model.decoder_config, points, normals, valid, sub,
                        n_iters=self.optim_n_iters,
                        code_reg_lambda=self.code_reg_lambda)
            else:
                res = refine_latents(
                    self.state, self.cfg, self.model.decoder_params,
                    self.model.decoder_config, points, normals, valid, sub,
                    n_iters=self.optim_n_iters,
                    code_reg_lambda=self.code_reg_lambda)
                self.state = merge_refined(self.state, res, deintegrate=False)
                with self._upd_lock:
                    self.updated_slots |= np.asarray(res.refined)
        return updated

    def get_sdf(self, xyz):
        return get_sdf(self.state, self.cfg, self.model.decoder_params,
                       self.model.decoder_config, jnp.asarray(xyz, jnp.float32))

    def sync_updated(self):
        """Fold the device-side updated-voxel accumulator into the host set
        (one D2H sync; called by the mesher, not per frame)."""
        with self._upd_lock:
            upd, self._updated_dev = self._updated_dev, None
        if upd is not None:
            self.updated_slots |= np.asarray(upd)
        return self.updated_slots

    def check_overflow(self):
        if bool(np.asarray(self.state.overflow)):
            raise RuntimeError(
                "Map capacity overflow: raise mapping.latent_capacity/alloc_capacity")

    # -- persistence (parity: map.py:239-249) -------------------------------
    def save(self, path):
        np.savez(Path(path),
                 **{k: np.asarray(v) for k, v in self.state._asdict().items()})

    def load(self, path):
        path = Path(path)
        if not path.exists():
            path = path.with_suffix(".npz")
        with np.load(path) as d:
            self.state = MapState(**{k: jnp.asarray(d[k]) for k in MapState._fields})

    # -- debug visuals (parity: map.py:726-833, headless numpy payloads) -----
    def get_fast_preview_visuals(self):
        """Wireframes of all allocated voxel blocks + the map bound."""
        from ..utils import vis

        occupied = np.asarray(self.state.positions)
        occupied = occupied[occupied >= 0]
        xyz = np.asarray(vox.unlinearize_id(jnp.asarray(occupied), self.cfg.n_xyz))
        start = xyz * self.cfg.voxel_size + self.bound_min
        boxes = [vis.wireframe_bbox(s, s + self.cfg.voxel_size) for s in start]
        boxes.append(vis.wireframe_bbox(self.bound_min, self.bound_max, color_id=4))
        return [vis.merged_linesets(boxes)]

    def get_map_visuals(self, return_blocks=False, return_samples=False,
                        return_uncertainty=False, return_mesh=False,
                        sample_range=None, voxel_resolution: int = 8):
        """Debug visuals: blocks / dense SDF sample clouds / uncertainty / mesh."""
        from ..utils import vis
        from .mesher import Mesher, _sample_offsets

        out = {"blocks": [], "samples": [], "uncertainty": [], "mesh": []}
        if return_blocks:
            out["blocks"] = self.get_fast_preview_visuals()
        if return_mesh:
            # Debug read must not consume the live mesher's bookkeeping:
            # the no_cache extraction below drains/clears the updated-voxel
            # accumulators, so snapshot them and merge back after (a plain
            # restore could lose a concurrent integrate's update; |= only
            # ever re-meshes extra).
            mesher = Mesher(self)
            with self._upd_lock:
                saved_slots = self.updated_slots.copy()
                saved_dev = self._updated_dev
            try:
                out["mesh"] = [mesher.extract(voxel_resolution, no_cache=True)]
            finally:
                with self._upd_lock:
                    self.updated_slots |= saved_slots
                    if saved_dev is not None:
                        self._updated_dev = (
                            saved_dev if self._updated_dev is None
                            else self._updated_dev | saved_dev)
        if return_samples or return_uncertainty:
            st = self.state
            occ = np.asarray(st.positions) >= 0
            conf = np.asarray(st.obs_count) > self.cfg.ignore_count_th
            slots = np.where(occ & conf)[0]
            if len(slots) == 0:
                return out
            r = voxel_resolution // 2
            offs = _sample_offsets(r)                       # ((2r)^3, 3)
            lat = np.asarray(st.latents)[slots]
            B, S = len(slots), len(offs)
            net_in = np.concatenate(
                [np.repeat(lat, S, axis=0), np.tile(offs, (B, 1))], axis=1)
            sdf, std = apply_decoder(self.model.decoder_params,
                                     self.model.decoder_config,
                                     jnp.asarray(net_in))
            sdf = np.asarray(sdf)[:, 0]
            std = np.asarray(std)[:, 0]
            base = np.asarray(vox.unlinearize_id(
                jnp.asarray(np.asarray(st.positions)[slots]), self.cfg.n_xyz))
            pos = (np.repeat(base, S, axis=0) + np.tile(offs + 0.5, (B, 1))) \
                * self.cfg.voxel_size + self.bound_min
            lo, hi = (sample_range if sample_range is not None
                      else (sdf.min(), sdf.max()))
            if return_samples:
                t = np.clip((sdf - lo) / max(hi - lo, 1e-9), 0, 1)
                out["samples"] = [vis.pointcloud(pos, cfloat=t)]
            if return_uncertainty:
                t = np.clip((std - lo) / max(hi - lo, 1e-9), 0, 1)
                out["uncertainty"] = [vis.pointcloud(pos, cfloat=t)]
        return out
