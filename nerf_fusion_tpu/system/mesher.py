"""Incremental mesh extraction from the latent voxel map.

Capability parity with ``DenseIndexedMap.extract_mesh`` (system/map.py:582-724;
SURVEY.md §3.4), TPU-first:

  * per-voxel dense decoder evaluation on the ``(2r)^3`` margin lattice, with
    the reference's "fast" mode (coarse eval -> trilinear upsample -> re-eval
    only near-surface cells) realised with a *fixed re-eval budget* +
    scatter, keeping shapes static under jit;
  * the sparse marching-cubes op (ops/marching_cubes.py) with cross-voxel
    std-weighted interpolation and max_std pruning;
  * an incremental host-side vertex cache keyed by owning voxel: re-meshed
    voxels' stale triangles are dropped, new ones appended.  Unlike the
    reference's numba ``_get_valid_idx`` (which only invalidates voxels that
    *still* produce triangles), we invalidate every voxel in the meshed
    batch — re-meshed voxels that became empty lose their stale triangles.

Batch sizes are padded to power-of-two buckets so jit recompiles are
bounded (log2 many shapes).
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import apply_decoder
from ..ops import voxel as voxops
from ..ops.marching_cubes import marching_cubes_sparse
from .map import SparseVoxelMap


def _bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


# Fixed per-chunk voxel batch: the mesher processes any voxel count as
# ceil(B/MESH_CHUNK) invocations of ONE compiled program.  (Growing
# power-of-two buckets would recompile mid-run — ruinous when compiles are
# expensive, e.g. over a tunneled chip.)
MESH_CHUNK = 512


class _Pending(NamedTuple):
    """A dispatched-but-unfetched extraction.

    Fused entries carry device arrays (``mesh_ids``+``keep``+overflow
    flag+leftover mask); chunked entries carry a host ``mesh_ids`` array
    and ``None`` for the rest.
    """
    mesh_ids: object
    keep: object
    result: object
    map_ovf: object
    leftover: object = None      # (C,) bool device mask of deferred voxels
    n_leftover: object = None    # () device count of the above


def _sample_offsets(r: int) -> np.ndarray:
    """Decoder-frame sample coords of the (2r)^3 margin lattice.

    Sample i along an axis sits at ``(i - r//2)/r - 0.5`` in the decoder's
    voxel-local frame (map.py:641-648 with the 0.5 network offset folded in).
    """
    i = np.arange(2 * r)
    ax = (i - r // 2) / r - 0.5
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)


def _coarse_offsets(r: int) -> np.ndarray:
    """r^3 lattice spanning the same extent (fast mode's low resolution)."""
    a = -(r // 2) / r - 0.5
    b = 1.0 + ((r - 1) // 2) / r - 0.5
    ax = np.linspace(a, b, r)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _upsample_blend_matrix(r: int) -> np.ndarray:
    """((2r)^3, r^3) align_corners trilinear upsample as a constant matrix.

    Row j holds the <=8 trilinear weights of high-res sample j over the
    coarse lattice — the Kronecker cube of the 1-D resample matrix, in
    the same row-major (x, y, z) flattening as the sample grids.
    """
    j = np.arange(2 * r) * (r - 1) / (2 * r - 1)
    lo = np.floor(j).astype(np.int64)
    hi = np.minimum(lo + 1, r - 1)
    f = (j - lo).astype(np.float32)
    W1 = np.zeros((2 * r, r), np.float32)
    W1[np.arange(2 * r), lo] += 1.0 - f
    W1[np.arange(2 * r), hi] += f
    T = np.einsum("ai,bj,ck->abcijk", W1, W1, W1)
    return T.reshape((2 * r) ** 3, r ** 3)


@functools.partial(jax.jit, static_argnames=("cfg", "dec_cfg", "r", "fast",
                                              "mesh_budget", "tri_budget",
                                              "reeval_budget", "precision"))
def fused_extract(state, updated_mask, cfg, dec_params, dec_cfg,
                  r: int, fast: bool, mesh_budget: int, tri_budget: int,
                  reeval_budget: int, max_std, precision: str = "high",
                  blend=None, mesh_cache=None, reuse_eps=0.0):
    """The WHOLE incremental extraction as one device program.

    Candidate selection (updated slots -> 6-neighbour expansion -> dedup ->
    confidence filter, map.py:628-632), chunked decoder evaluation of the
    sample cubes, and the global marching-cubes pass — fused so the frame
    loop pays ONE dispatch per extraction and zero blocking transfers (the
    chunked host-driven path costs a queue-draining device_get plus a
    dispatch per 512-voxel chunk, ~1.4 s wall through a tunneled chip).

    ``mesh_budget`` (static) caps the re-meshed voxel batch.  Voxels that
    need re-meshing but did not fit (batch or unique-table truncation) come
    back in the ``leftover`` slot mask: the host feeds it into the map's
    device-side updated accumulator so the NEXT extraction picks them up —
    overflow degrades into deferred incremental work instead of a full
    re-mesh through the (compile-heavy) chunked path.

    ``mesh_cache`` (optional): a per-slot snapshot of each voxel's latent
    as of its last successful meshing — ``(lat (C, L) f32, valid (C,)
    bool)``.  An updated voxel whose latent moved < ``reuse_eps``
    (max-abs) since it was last meshed produces (to eps) the same SDF
    field, hence the same triangles: it is dropped from the re-mesh set
    BEFORE the 6-neighbour dilation, shrinking the decode scan, the
    marching-cubes batch, and the host cache churn.  The obs-count-
    weighted Bayesian mean makes sub-eps updates the common case late in
    a run (reference intent: incremental re-meshing, map.py:582-724).
    Neighbours of a genuinely changed voxel still re-mesh via the
    dilation, so cross-voxel interpolation seams stay crack-free.

    :return: (MCResult, mesh_ids (mesh_budget,), keep (mesh_budget,) bool,
              map_overflow (), leftover (C,) bool, n_leftover (),
              new_mesh_cache (same structure as ``mesh_cache``, or None)).
    """
    C = cfg.latent_capacity
    upd = updated_mask & (state.positions >= 0)
    if mesh_cache is not None:
        cache_lat, cache_valid = mesh_cache
        delta = jnp.max(jnp.abs(state.latents - cache_lat), axis=-1)
        upd = upd & (~cache_valid | (delta > reuse_eps))
    upd_ids, upd_valid, _ = voxops.compact_by_mask(state.positions, upd, mesh_budget)
    exp_ids, exp_valid = voxops.expand_neighbors6(upd_ids, upd_valid, cfg.n_xyz)
    uniq, uniq_valid, _, ovf_u = voxops.masked_unique(exp_ids, exp_valid, mesh_budget)
    slots = state.indexer[jnp.clip(uniq, 0, cfg.n_voxels - 1)]
    slot_c = jnp.clip(slots, 0, C - 1)
    keep = uniq_valid & (slots >= 0) & \
        (state.obs_count[slot_c] > cfg.ignore_count_th)
    # Front-compact the kept rows (stable, so relative order is preserved)
    # so the decode scan below can SKIP trailing all-padding chunks: the
    # steady-state lr-kt batch keeps ~2k of the 4096 budget, i.e. half the
    # decode chunks were spent on zero latents.  batch_map / mesh_ids /
    # keep / cube grids all carry the same permutation, so MC's slot->row
    # lookups and the host bookkeeping are unchanged.
    perm = jnp.argsort(jnp.logical_not(keep), stable=True)
    uniq = uniq[perm]
    keep = keep[perm]
    slot_c = slot_c[perm]
    batch_map = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(keep, slot_c, C)].set(
        jnp.arange(mesh_budget, dtype=jnp.int32), mode="drop")
    lat_b = jnp.where(keep[:, None], state.latents[slot_c], 0.0)
    if mesh_cache is not None:
        # Snapshot the latents of the voxels actually meshed in THIS batch
        # (truncated/deferred voxels keep their stale snapshot and stay
        # "changed" until a later batch takes them).
        dst = jnp.where(keep, slot_c, C)
        new_mesh_cache = (
            cache_lat.at[dst].set(state.latents[slot_c], mode="drop"),
            cache_valid.at[dst].set(True, mode="drop"))
    else:
        new_mesh_cache = None

    # Deferral set: every allocated+confident slot in the 6-neighbour
    # dilation of the updated set that this batch did NOT process.  Empty
    # whenever the batch fit; on truncation it routes the remainder to the
    # next extraction (strictly shrinking, so repeated extraction drains it).
    upd_grid = jnp.zeros((cfg.n_voxels,), bool).at[
        jnp.where(upd, state.positions, cfg.n_voxels)].set(True, mode="drop")
    pos_xyz = voxops.unlinearize_id(jnp.maximum(state.positions, 0), cfg.n_xyz)
    n_arr = jnp.asarray(cfg.n_xyz, jnp.int32)
    need = upd
    for d in (jnp.asarray(o, jnp.int32) for o in
              ([-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0],
               [0, 0, -1], [0, 0, 1])):
        nb = pos_xyz + d[None, :]
        inb = jnp.all((nb >= 0) & (nb < n_arr), axis=-1)
        ngid = voxops.linearize_id(jnp.clip(nb, 0, n_arr - 1), cfg.n_xyz)
        need = need | (inb & upd_grid[ngid])
    confident = state.obs_count > cfg.ignore_count_th
    need = need & (state.positions >= 0) & confident
    leftover = need & (batch_map < 0)
    n_leftover = jnp.sum(leftover).astype(jnp.int32)

    n_chunks = mesh_budget // MESH_CHUNK
    assert mesh_budget % MESH_CHUNK == 0, "mesh_budget must be a MESH_CHUNK multiple"
    L = lat_b.shape[-1]

    def chunk_body(_, inp):
        lat_c, val_c = inp

        def decode(_):
            return _decode_cubes(dec_params, dec_cfg, lat_c, val_c,
                                 r, fast, reeval_budget, precision)

        def skip(_):
            # all-padding chunk (possible after the front-compaction
            # above): inert fill — positive SDF (no crossings) and huge
            # std (max_std-pruned) — on top of the keep-mask exclusion
            shape = (MESH_CHUNK, 2 * r, 2 * r, 2 * r)
            return (jnp.full(shape, 1.0, jnp.float32),
                    jnp.full(shape, 1e6, jnp.float32))

        csdf, cstd = jax.lax.cond(jnp.any(val_c), decode, skip, 0)
        return 0, (csdf, cstd)

    _, (sdf_ch, std_ch) = jax.lax.scan(
        chunk_body, 0,
        (lat_b.reshape(n_chunks, MESH_CHUNK, L),
         keep.reshape(n_chunks, MESH_CHUNK)))
    shape = (mesh_budget, 2 * r, 2 * r, 2 * r)
    cube_sdf = sdf_ch.reshape(shape)
    cube_std = std_ch.reshape(shape)

    result = marching_cubes_sparse(
        state.indexer, batch_map, uniq.astype(jnp.int32), keep,
        cube_sdf, cube_std, cfg.n_xyz, cfg.voxel_size,
        jnp.asarray(cfg.bound_min, jnp.float32),
        r, C, max_std, tri_budget, blend=blend)
    return (result, uniq, keep, state.overflow, leftover, n_leftover,
            new_mesh_cache)


@functools.partial(jax.jit, static_argnames=("dec_cfg", "r", "fast",
                                              "reeval_budget", "precision"))
def _decode_cubes(dec_params, dec_cfg, latents_b, valid_b, r: int,
                  fast: bool, reeval_budget: int, precision: str = "high"):
    """(B, L) voxel latents -> (B, 2r, 2r, 2r) sdf and std sample grids.

    ``precision`` names the decoder matmul precision
    (models.decoder.PRECISIONS); the mesher only thresholds/interpolates
    the SDF, so one-pass bf16 ("default") is a measurable-speedup option
    gated by the bench's mesh |SDF| oracle."""
    from ..models.decoder import PRECISIONS
    prec = PRECISIONS[precision]
    B, L = latents_b.shape
    n_hi = (2 * r) ** 3

    def decode(lat_rep, offs_rep):
        sdf, std = apply_decoder(dec_params, dec_cfg,
                                 jnp.concatenate([lat_rep, offs_rep], axis=1),
                                 precision=prec)
        return sdf[:, 0], std[:, 0]

    if not fast:
        offs = jnp.asarray(_sample_offsets(r))                       # (n_hi,3)
        lat_rep = jnp.repeat(latents_b, n_hi, axis=0)
        offs_rep = jnp.tile(offs, (B, 1))
        sdf, std = decode(lat_rep, offs_rep)
        shape = (B, 2 * r, 2 * r, 2 * r)
        return sdf.reshape(shape), std.reshape(shape)

    # Fast mode (map.py:656-683): coarse r^3 eval, trilinear upsample
    # (align_corners), then re-evaluate only |sdf| < 0.05 cells up to budget.
    n_lo = r ** 3
    offs_lo = jnp.asarray(_coarse_offsets(r))
    sdf_lo, std_lo = decode(jnp.repeat(latents_b, n_lo, axis=0),
                            jnp.tile(offs_lo, (B, 1)))
    sdf_lo = sdf_lo.reshape(B, r, r, r)
    std_lo = std_lo.reshape(B, r, r, r)

    # align_corners trilinear upsample r -> 2r: the resample grid is
    # FIXED, so the interpolation is one constant (n_hi, n_lo) blend
    # matrix on the MXU instead of a vmapped map_coordinates gather of
    # B * n_hi * 2 samples (the gather path dominated fused_extract on
    # TPU; same weights, f32-rounding-close).
    T = jnp.asarray(_upsample_blend_matrix(r))                   # (n_hi, n_lo)
    HI = jax.lax.Precision.HIGHEST
    sdf_hi = jnp.matmul(sdf_lo.reshape(B, n_lo), T.T,
                        precision=HI).reshape(B * n_hi)
    std_hi = jnp.matmul(std_lo.reshape(B, n_lo), T.T,
                        precision=HI).reshape(B * n_hi)

    near = (jnp.abs(sdf_hi) < 0.05) & jnp.repeat(valid_b, n_hi)
    flat_idx = jnp.arange(B * n_hi)
    sel_idx, sel_valid, _ = voxops.compact_by_mask(flat_idx, near, reeval_budget)
    offs_hi = jnp.asarray(_sample_offsets(r))                        # (n_hi,3)
    sel_b = sel_idx // n_hi
    sel_o = sel_idx % n_hi
    sdf_re, std_re = decode(latents_b[sel_b], offs_hi[sel_o])
    # dest is nondecreasing (compaction preserves order; the invalid tail
    # maps to the sentinel row B*n_hi), so the scatter is sorted.
    dest = jnp.where(sel_valid, sel_idx, B * n_hi)
    sdf_hi = jnp.concatenate([sdf_hi, jnp.zeros((1,))]).at[dest].set(
        jnp.where(sel_valid, sdf_re, 0.0), mode="drop",
        indices_are_sorted=True)[:-1]
    std_hi = jnp.concatenate([std_hi, jnp.zeros((1,))]).at[dest].set(
        jnp.where(sel_valid, std_re, 0.0), mode="drop",
        indices_are_sorted=True)[:-1]
    shape = (B, 2 * r, 2 * r, 2 * r)
    return sdf_hi.reshape(shape), std_hi.reshape(shape)


class Mesher:
    """Owns the incremental triangle cache for one map."""

    def __init__(self, vmap: SparseVoxelMap, max_n_triangles: int = 1 << 17,
                 reeval_fraction: float = 0.25, device=None,
                 mesh_batch_budget: int = 4096,
                 decode_precision: str = "high",
                 mesh_fast: bool = False,
                 reuse_latent_eps: float = 0.0):
        """``device``: optional second jax device; decode + marching cubes
        then run there on a snapshot copied over ICI, overlapping the
        fusion/tracking programs on the main device (the reference's
        aux-GPU / dedicated-CUDA-stream meshing, map.py:222-226,717-721)."""
        self.map = vmap
        self.budget = int(max_n_triangles)
        self.reeval_fraction = reeval_fraction
        self.decode_precision = decode_precision
        # Default decode mode for extract(fast=None): exact full decode is
        # both faster AND more accurate than the reference's coarse+re-eval
        # "fast" mode on TPU (see pipeline.py).
        self.mesh_fast = bool(mesh_fast)
        self.device = device
        self._dec_params_aux = None
        self.vertices = np.zeros((0, 3, 3), np.float32)
        self.vertices_std = np.zeros((0, 3), np.float32)
        self.vertices_flatten_id = np.zeros((0,), np.int64)
        self._lock = __import__("threading").RLock()
        self._pending = []   # dispatched-but-unfetched _Pending entries
        self._thread = None
        # Fused-path budgets: the incremental per-extraction voxel batch and
        # its triangle buffer (the full ``budget`` applies to the cache).
        self.mesh_budget = -(-int(mesh_batch_budget) // MESH_CHUNK) * MESH_CHUNK
        self.fused_tri_budget = min(self.budget,
                                    max(1 << 15, self.mesh_budget * 64))
        self._need_full_remesh = False
        self._blend_cache = {}   # (r, device) -> device (mats, colsums)
        # Latent-reuse re-mesh gating (fused path): skip updated voxels
        # whose latent moved < eps (max-abs) since their last meshing.
        # 0 disables.  The snapshot is keyed by the extraction parameters
        # that shape triangles — a changed (r, fast, max_std, precision)
        # would otherwise leave stale-by-parameters triangles cached.
        self.reuse_latent_eps = float(reuse_latent_eps)
        self._mesh_cache = None       # (lat (C,L), valid (C,)) device arrays
        self._mesh_cache_key = None   # (r, fast, max_std, precision)
        # Join any in-flight async extraction at interpreter exit: a daemon
        # thread mid-device-op during runtime teardown aborts the process.
        import atexit
        import weakref
        ref = weakref.ref(self)
        atexit.register(lambda: (lambda m: m and m.join_async())(ref()))

    def _get_blend(self, r: int, device):
        """Device-resident corner-blend operands (all r).

        The blend constants grow as r^6 (~322 MB at r=8); baking them into
        the jitted program oversizes its serialization (a tunnel compile
        endpoint rejects it outright).  Round 4 unified ALL r on the
        operand path: bench fps is unchanged at r=4 (125.0 vs 123.6
        median, within window noise) and one code path serves every
        resolution.  (Measured, for the record: the 7.1 MB of r=4 blend
        constants compress to ~0.3 MB in the serialized executable, so
        this does NOT shrink first-load.)  The constant-folded path
        (blend=None) remains for direct callers.
        """
        import jax

        from ..ops.marching_cubes import blend_operands
        key = (r, device)
        if key not in self._blend_cache:
            ops = blend_operands(r)
            self._blend_cache[key] = (jax.device_put(ops, device)
                                      if device is not None
                                      else jax.device_put(ops))
        return self._blend_cache[key]

    def join_async(self):
        t = self._thread
        if t is not None and t.is_alive():
            t.join()
        self._thread = None

    def extract(self, voxel_resolution: int, max_std: float = 2000.0,
                fast: "bool | None" = None, no_cache: bool = False,
                extract_async: bool = False, materialize: bool = True):
        """Re-mesh updated voxels; returns (T,3,3) world triangles.

        ``fast=None`` uses the Mesher's configured decode mode
        (``mesh_fast``) — callers that don't care must not override it, or
        the cadence and final extractions diverge (and a second variant of
        the fused program compiles).

        ``extract_async`` reproduces the reference's threaded meshing
        contract (map.py:582-608): while an extraction is in flight the
        call returns None; when it finishes, the next call returns the
        refreshed cache and may start a new extraction.  Snapshot safety is
        free — the worker reads an immutable MapState, so the reference's
        backup_vars/lock machinery has no equivalent here.

        ``materialize=False`` (sync mode only): dispatch the decode+MC
        programs and return immediately without any device->host fetch —
        the triangles ride the device queue and are fetched on the next
        ``current_mesh()``/``save_ply()``/materializing extract.  This
        keeps the frame loop free of blocking transfers while preserving
        program-order extraction semantics.
        """
        import threading

        if fast is None:
            fast = self.mesh_fast
        if extract_async:
            if self._thread is not None:
                if self._thread.is_alive():
                    return None
                self._thread = None
                return self.current_mesh()
            # The worker drains ONE round only (drain_deferred=False):
            # mid-run leftovers roll into the next cadence extraction.
            # Loop-draining here would fetch + re-dispatch repeatedly while
            # the frame loop runs — mid-run D2H roundtrips contend with the
            # dispatch stream (measured 46 -> 26 fps through a tunneled
            # chip).  The run-final SYNC extraction still drains fully.
            self._thread = threading.Thread(
                target=self._extract_impl,
                args=(voxel_resolution, max_std, fast, no_cache),
                kwargs={"drain_deferred": False}, daemon=True)
            self._thread.start()
            return None
        self.join_async()                  # drain any async job first
        return self._extract_impl(voxel_resolution, max_std, fast, no_cache,
                                  materialize=materialize)

    def _extract_impl(self, voxel_resolution: int, max_std: float,
                      fast: bool, no_cache: bool, materialize: bool = True,
                      drain_deferred: bool = True):
        if self._need_full_remesh and not no_cache:
            # A previous fused extraction truncated its batch; repair by
            # re-meshing everything through the unbounded chunked path.
            self._need_full_remesh = False
            no_cache = True
        if not no_cache:
            self._dispatch_fused(voxel_resolution, max_std, fast)
            if not materialize:
                return None
            if not drain_deferred:
                # async worker: fetch this batch only; leftovers roll into
                # the next cadence extraction
                self._drain_pending()
                return self.current_mesh()
            # Materialising extractions drain deferred (budget-truncated)
            # batches to completion.  Each round re-dilates the leftover
            # set, so progress per round can degenerate near the budget —
            # the round cap hands a stalled (or repair-flagged) drain to
            # the unbounded chunked path, which always completes.
            max_rounds = -(-self.map.cfg.latent_capacity // self.mesh_budget) + 8
            for _ in range(max_rounds):
                if not self._drain_pending():
                    break
                self._dispatch_fused(voxel_resolution, max_std, fast)
            else:
                logging.warning(
                    "deferral drain stalled after %d rounds; full re-mesh",
                    max_rounds)
                self._need_full_remesh = True
            if self._need_full_remesh:
                # A batch lost triangles on-device (cell/triangle budget)
                # during THIS drain: repair now — save_ply may be next.
                self._need_full_remesh = False
                return self._extract_chunked(voxel_resolution, max_std, fast,
                                             True, materialize)
            return self.current_mesh()
        return self._extract_chunked(voxel_resolution, max_std, fast,
                                     no_cache, materialize)

    def _dispatch_fused(self, voxel_resolution: int, max_std: float,
                        fast: bool):
        """Incremental extraction: ONE device dispatch, zero host blocking."""
        import jax

        vmap = self.map
        with vmap._upd_lock:
            upd, vmap._updated_dev = vmap._updated_dev, None
            if vmap.updated_slots.any():
                h = jnp.asarray(vmap.updated_slots)
                upd = h if upd is None else (upd | h)
                vmap.updated_slots[:] = False
        if upd is None:
            return

        state = vmap.state
        dec_params = vmap.model.decoder_params
        if self.device is not None:
            if self._dec_params_aux is None:
                self._dec_params_aux = jax.device_put(dec_params, self.device)
            dec_params = self._dec_params_aux
            state, upd = jax.device_put((state, upd), self.device)

        r = int(voxel_resolution)
        reeval_budget = max(1024, int(MESH_CHUNK * (2 * r) ** 3
                                      * self.reeval_fraction))
        mesh_cache = None
        if self.reuse_latent_eps > 0.0:
            key = (r, fast, float(max_std), self.decode_precision)
            if self._mesh_cache is None or self._mesh_cache_key != key:
                C = vmap.cfg.latent_capacity
                L = state.latents.shape[-1]
                mesh_cache = jax.device_put(
                    (jnp.zeros((C, L), jnp.float32), jnp.zeros((C,), bool)),
                    self.device)
                self._mesh_cache_key = key
            else:
                mesh_cache = self._mesh_cache
        result, ids, keep, map_ovf, leftover, n_left, new_cache = \
            fused_extract(
                state, upd, vmap.cfg, dec_params, vmap.model.decoder_config,
                r, fast, self.mesh_budget, self.fused_tri_budget,
                reeval_budget, float(max_std), self.decode_precision,
                blend=self._get_blend(r, self.device), mesh_cache=mesh_cache,
                reuse_eps=jnp.float32(self.reuse_latent_eps))
        if new_cache is not None:
            self._mesh_cache = new_cache
        # Truncated batches defer their remainder: the leftover mask rides
        # in the pending entry and is folded back into the map's updated
        # accumulator at drain time iff non-empty (an unconditional
        # feed-back would make every later extraction dispatch a full
        # program for an empty batch).
        if self.device is not None:
            main_dev = next(iter(vmap.state.indexer.devices()))
            leftover = jax.device_put(leftover, main_dev)
        with self._lock:
            self._pending.append(
                _Pending(ids, keep, result, map_ovf, leftover, n_left))

    def _extract_chunked(self, voxel_resolution: int, max_std: float,
                         fast: bool, no_cache: bool, materialize: bool = True):
        import jax

        # The chunked path re-meshes without consulting or updating the
        # latent-reuse snapshot, so the snapshot no longer reflects the
        # latents behind the cached triangles: drop it (every voxel
        # re-reads as "changed" at the next fused extraction).
        self._mesh_cache = None
        self._mesh_cache_key = None

        vmap, cfg = self.map, self.map.cfg
        state = vmap.state
        # One batched D2H for all the host-side bookkeeping (each individual
        # fetch costs a full roundtrip on tunneled devices).
        with vmap._upd_lock:
            upd_dev, vmap._updated_dev = vmap._updated_dev, None
        overflow, upd_fetch, positions, obs, indexer_host = jax.device_get(
            (state.overflow,
             upd_dev if upd_dev is not None else state.overflow,
             state.positions, state.obs_count, state.indexer))
        if bool(overflow):
            raise RuntimeError(
                "Map capacity overflow: raise mapping.latent_capacity/alloc_capacity")
        with vmap._upd_lock:
            if upd_dev is not None:
                vmap.updated_slots |= upd_fetch
            if no_cache:
                updated = obs > 0
                with self._lock:
                    self._pending.clear()  # superseded: everything re-meshes
                self.vertices = np.zeros((0, 3, 3), np.float32)
                self.vertices_std = np.zeros((0, 3), np.float32)
                self.vertices_flatten_id = np.zeros((0,), np.int64)
            else:
                updated = vmap.updated_slots.copy()
            vmap.updated_slots[:] = False
        if not updated.any():
            return self.current_mesh() if materialize else None

        # Expand updated voxels to neighbours; keep confident ones
        # (map.py:628-632).  Pure numpy: device ops here would trace a new
        # program per (varying) voxel count on every extraction.
        upd_ids = positions[updated & (positions >= 0)]
        nx, ny, nz = cfg.n_xyz
        xyz = np.stack([upd_ids // (ny * nz), (upd_ids // nz) % ny,
                        upd_ids % nz], axis=1)
        offs = np.array([[0, 0, 0], [-1, 0, 0], [1, 0, 0], [0, -1, 0],
                         [0, 1, 0], [0, 0, -1], [0, 0, 1]])
        nb = np.clip(xyz[:, None, :] + offs[None], 0,
                     np.array([nx - 1, ny - 1, nz - 1]))
        exp_ids = np.unique((nb[..., 0] * ny + nb[..., 1]) * nz + nb[..., 2])
        slots = indexer_host[exp_ids]
        keep = (slots >= 0) & (obs[np.clip(slots, 0, None)] > cfg.ignore_count_th)
        slots = slots[keep]
        mesh_ids = exp_ids[keep]
        B_real = len(slots)
        if B_real == 0:
            return self.current_mesh() if materialize else None
        r = int(voxel_resolution)
        B = MESH_CHUNK
        reeval_budget = max(1024, int(B * (2 * r) ** 3 * self.reeval_fraction))

        # Aux-device placement: snapshot the latents/indexer onto the mesh
        # device (D2D over ICI) so decode+MC overlap the fusion device.
        dec_params = vmap.model.decoder_params
        lat_src, idx_src = state.latents, state.indexer
        if self.device is not None:
            if self._dec_params_aux is None:
                self._dec_params_aux = jax.device_put(dec_params, self.device)
            dec_params = self._dec_params_aux
            lat_src, idx_src = jax.device_put((state.latents, state.indexer),
                                              self.device)

        # Phase 1a: decode every voxel's sample cube in fixed-size chunks
        # (one compiled decode program regardless of batch size).
        n_chunks = -(-B_real // B)
        cube_sdf_chunks, cube_std_chunks = [], []
        slots_pad = np.zeros((n_chunks * B,), np.int32)
        slots_pad[:B_real] = slots
        ids_pad = np.zeros((n_chunks * B,), np.int64)
        ids_pad[:B_real] = mesh_ids
        for s in range(0, n_chunks * B, B):
            valid_b = jnp.asarray(np.arange(s, s + B) < B_real)
            latents_b = lat_src[jnp.asarray(slots_pad[s:s + B])]
            csdf, cstd = _decode_cubes(
                dec_params, vmap.model.decoder_config,
                latents_b, valid_b, r, fast, reeval_budget,
                self.decode_precision)
            cube_sdf_chunks.append(csdf)
            cube_std_chunks.append(cstd)

        # Phase 1b: ONE marching-cubes pass over the whole batch (bucketed
        # to power-of-two chunk counts so only log2 shapes ever compile);
        # the global batch_map gives every voxel access to ALL neighbours'
        # sample grids — no chunk-boundary interpolation seams.
        bucket_chunks = 1
        while bucket_chunks < n_chunks:
            bucket_chunks *= 2
        BT = bucket_chunks * B
        pad_chunks = bucket_chunks - n_chunks
        zeros_cube = jnp.zeros_like(cube_sdf_chunks[0])
        cube_sdf = jnp.concatenate(cube_sdf_chunks + [zeros_cube] * pad_chunks)
        cube_std = jnp.concatenate(cube_std_chunks + [zeros_cube] * pad_chunks)
        ids_b = np.zeros((BT,), np.int64)
        ids_b[:B_real] = mesh_ids
        valid_bt = np.arange(BT) < B_real
        batch_map = np.full((cfg.latent_capacity,), -1, np.int32)
        batch_map[slots] = np.arange(B_real, dtype=np.int32)

        result = marching_cubes_sparse(
            idx_src, jnp.asarray(batch_map),
            jnp.asarray(ids_b, jnp.int32),
            jnp.asarray(valid_bt), cube_sdf, cube_std,
            cfg.n_xyz, cfg.voxel_size,
            jnp.asarray(cfg.bound_min, jnp.float32),
            r, cfg.latent_capacity, float(max_std), self.budget,
            blend=self._get_blend(r, self.device))
        with self._lock:
            self._pending.append(_Pending(mesh_ids, None, result, None, None))
        if not materialize:
            return None
        self._drain_pending()
        return self.current_mesh()

    def _drain_pending(self):
        """Materialise all dispatched extractions into the host cache.

        Exactly TWO batched D2H calls — one for the counts/flags/id lists,
        one for all (bucket-sliced) triangle buffers.  Slice sizes round up
        to power-of-two buckets (>=4096) so at most log2(budget) distinct
        slice programs ever compile.
        """
        import jax

        with self._lock:
            pending, self._pending = self._pending, []
        if not pending:
            return 0
        # First pass: scalars + (for fused entries) the meshed-id lists.
        meta = jax.device_get([
            (p.result.n_triangles, p.mesh_ids, p.keep,
             p.map_ovf, p.result.cells_dropped, p.n_leftover)
            for p in pending])
        sliced, ns, id_lists = [], [], []
        total_leftover = 0
        for p, (n, ids, keep, map_ovf, cells_dropped,
                n_leftover) in zip(pending, meta):
            if bool(cells_dropped):
                logging.warning(
                    "marching-cubes active-cell budget exceeded; scheduling "
                    "full re-mesh")
                self._need_full_remesh = True
            if map_ovf is not None and bool(map_ovf):
                raise RuntimeError(
                    "Map capacity overflow: raise mapping.latent_capacity/"
                    "alloc_capacity")
            if n_leftover is not None and int(n_leftover) > 0:
                # Truncated batch: defer the remainder to the next
                # extraction instead of a full re-mesh (the chunked path's
                # per-bucket-size compiles are ruinous on tunneled chips).
                total_leftover += int(n_leftover)
                vmap = self.map
                with vmap._upd_lock:
                    vmap._updated_dev = (
                        p.leftover if vmap._updated_dev is None
                        else vmap._updated_dev | p.leftover)
                logging.info(
                    "mesh batch budget %d exceeded; %d voxels deferred to "
                    "the next extraction", self.mesh_budget, int(n_leftover))
            ids = np.asarray(ids)
            if keep is not None:                 # fused entry: mask padding
                ids = ids[np.asarray(keep)]
            id_lists.append(ids)
            n = int(n)
            cap = (self.fused_tri_budget if keep is not None else self.budget)
            if n > cap:
                logging.warning("mesh triangle budget exceeded: %d > %d",
                                n, cap)
                if keep is not None:
                    self._need_full_remesh = True
                n = cap
            # Power-of-two fetch buckets: a linear 4096 rounding would give
            # up to budget/4096 (~1000 at the 4M lr-kt budget) distinct
            # device slice programs — each a fresh compile.  log2 bounds it
            # at ~11 shapes for <=2x over-fetch.
            nb = min(cap, _bucket(n, 4096))
            sliced.append((p.result.vertices[:nb], p.result.vertex_std[:nb],
                           p.result.flatten_id[:nb]))
            ns.append(n)
        fetched = jax.device_get(sliced)
        # Merge batches in dispatch order: each batch drops every cached
        # triangle owned by a voxel it re-meshed, then appends its own.
        with self._lock:
            for mesh_ids, f, n in zip(id_lists, fetched, ns):
                verts, vstd = f[0][:n], f[1][:n]
                fid = f[2][:n].astype(np.int64)
                stale = np.isin(self.vertices_flatten_id, mesh_ids)
                self.vertices = np.concatenate([self.vertices[~stale], verts])
                self.vertices_std = np.concatenate(
                    [self.vertices_std[~stale], vstd])
                self.vertices_flatten_id = np.concatenate(
                    [self.vertices_flatten_id[~stale], fid])
        return total_leftover

    def current_mesh(self):
        self._drain_pending()
        with self._lock:
            return self.vertices

    # -- export -------------------------------------------------------------
    def save_ply(self, path, color_by_std: bool = True, std_range=None):
        """Write the cached mesh as binary PLY with jet vertex colors of the
        uncertainty (parity: map.py:522-544 visual).  Vectorised structured
        write: a per-line Python loop takes minutes at the 4M-triangle
        lr-kt budget."""
        self._drain_pending()
        verts = self.vertices.reshape(-1, 3).astype("<f4")
        stds = self.vertices_std.reshape(-1)
        tris = np.arange(len(verts), dtype="<i4").reshape(-1, 3)
        colors = None
        if color_by_std and len(verts):
            lo, hi = (stds.min(), stds.max()) if std_range is None else std_range
            tcol = np.clip((stds - lo) / max(hi - lo, 1e-9), 0, 1)
            colors = (_jet(tcol) * 255).astype(np.uint8)
        vfields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if colors is not None:
            vfields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        vrec = np.zeros(len(verts), dtype=vfields)
        vrec["x"], vrec["y"], vrec["z"] = verts[:, 0], verts[:, 1], verts[:, 2]
        if colors is not None:
            vrec["red"], vrec["green"], vrec["blue"] = \
                colors[:, 0], colors[:, 1], colors[:, 2]
        frec = np.zeros(len(tris), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        frec["n"] = 3
        frec["idx"] = tris
        with open(path, "wb") as f:
            hdr = ["ply", "format binary_little_endian 1.0",
                   f"element vertex {len(verts)}",
                   "property float x", "property float y", "property float z"]
            if colors is not None:
                hdr += ["property uchar red", "property uchar green",
                        "property uchar blue"]
            hdr += [f"element face {len(tris)}",
                    "property list uchar int vertex_indices", "end_header"]
            f.write(("\n".join(hdr) + "\n").encode())
            f.write(vrec.tobytes())
            f.write(frec.tobytes())


def _jet(t: np.ndarray) -> np.ndarray:
    """Minimal jet colormap (matplotlib-free), t in [0,1] -> (N,3) rgb."""
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)
