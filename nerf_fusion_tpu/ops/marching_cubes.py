"""Vectorised sparse marching cubes with cross-voxel interpolation.

TPU-native replacement for the reference CUDA kernel
(system/ext/marching_cubes/mc_interp_kernel.cu; SURVEY.md §2.5): one fused
XLA program over all (voxel, cell) pairs instead of one CUDA thread each,
with a fixed triangle budget + prefix-sum compaction instead of an atomic
append.

Semantics reproduced from the reference kernel:
  * every meshed voxel carries a ``(2r)^3`` decoder sample grid spanning a
    half-voxel margin on each side (samples at ``(i - r/2)/r`` for
    ``i in [0, 2r)``, map.py:641-648);
  * a cell-corner value blends the estimates of the owning voxel and its
    lower/upper neighbours per axis (linear cross-fade of the overlapping
    margins), each source additionally weighted by its predicted std
    (``STD_W_SDF`` in mc_interp_kernel.cu:32,96-185);
  * missing (out-of-grid / unallocated / not-in-batch) neighbour sources
    drop out of the weighted sum — renormalisation over survivors;
  * the dominant-source NaN-kill (mc_interp_kernel.cu:101-185): a corner
    dies if the source indexed by ``zero_det`` is missing.  Decoding the
    kernel's m/p side selection shows ``zero_det`` always names the
    per-axis source with offset (0,0,0) — the corner's OWN voxel — which
    is in the meshing batch by construction, so for consistent inputs the
    kill is unreachable and the reference's effective behaviour IS the
    renormalisation above.  We reproduce the rule faithfully anyway
    (``frontier_kill=True``, the default): rows whose own voxel is absent
    from indexer/batch_map emit nothing, exactly as every corner of every
    cell of such a row would be NaN-killed in the CUDA kernel.  What
    actually stops the reference's mesh extruding into unobserved space is
    batch membership: unobserved voxels are never allocated, so no cells
    are generated there at all — identical here;
  * triangles whose any vertex-interpolated std exceeds ``max_std`` are
    pruned (mc_interp_kernel.cu:297-318).

Differences (intentional, documented):
  * our case tables are generated with a deterministic ambiguous-face rule,
    so the mesh is watertight by construction (see ops/mc_tables.py);
  * triangle winding is outward (toward positive SDF) without the sign flip
    the reference applies before its kernel (map.py:688).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import voxel as vox
from .mc_tables import CORNERS, EDGE_CORNERS, MAX_TRIS_PER_CELL, TRI_TABLE


class MCResult(NamedTuple):
    vertices: jnp.ndarray       # (budget, 3, 3) world-space triangle vertices
    vertex_std: jnp.ndarray     # (budget, 3)
    flatten_id: jnp.ndarray     # (budget,) owning voxel flat id
    valid: jnp.ndarray          # (budget,) bool
    n_triangles: jnp.ndarray    # () int32 (pre-clamp count)
    cells_dropped: jnp.ndarray  # () bool: active-cell budget overflowed


_HI = jax.lax.Precision.HIGHEST
# bf16x3 (HIGH) for the value-carrying MC contractions, at half the passes
# of HIGHEST.  Two distinct justifications — do NOT lower either to
# one-pass DEFAULT:
#  * edge-value einsum: tri_sel rows are one-hot, so each output is a
#    single product (no accumulation error, only bf16x3 input splitting,
#    which is f32-equivalent) — but DEFAULT would round world coordinates
#    to bf16 (~cm-scale error);
#  * corner-blend matmuls: columns accumulate up to 8 trilinear taps, so
#    these are genuine short accumulations where bf16x3 ~ f32 (verified by
#    the bench mesh-|SDF| gate), not exact selections.
_APPLY = jax.lax.Precision.HIGH


@functools.lru_cache(maxsize=None)
def _corner_blend_mats(r: int):
    """Constant blend matrices for the cross-voxel corner interpolation.

    The 8 per-corner sources of the CUDA kernel (mc_interp_kernel.cu:96-185)
    regroup by *neighbour offset*: each source of corner ``p`` reads a fixed
    sample index of the voxel at a fixed offset ``d`` in {-1,0,1}^3 with a
    fixed weight.  Folding (sample index, weight) into one ``(2r)^3 ->
    (r+1)^3`` matrix per offset turns the whole blend into D constant
    matmuls (MXU work) over per-offset neighbour row-gathers — instead of
    8 x B x (r+1)^3 random scalar gathers, which run on the TPU scalar unit
    (~100 us/voxel measured at r=4).

    :return: (offsets (D,3) int, mats (D, (2r)^3, (r+1)^3) f32,
              colsum (D, (r+1)^3) f32).
    """
    rp = np.arange(r + 1)
    rpx, rpy, rpz = np.meshgrid(rp, rp, rp, indexing="ij")
    rpos = np.stack([rpx, rpy, rpz], -1).reshape(-1, 3)               # (P,3)
    P = rpos.shape[0]
    rbound = (r - 1) // 2
    rstart = r // 2
    rmid = r / 2.0
    lower = rpos <= rbound
    off_m = np.where(lower, -1, 0)
    off_p = np.where(lower, 0, 1)
    idx_m = np.where(lower, rpos + r + rstart, rpos + rstart)
    idx_p = np.where(lower, rpos + rstart, rpos + rstart - r)
    w_m = np.where(lower, rmid - rpos, rmid + r - rpos) / r
    w_p = np.where(lower, rpos + rmid, rpos - rmid) / r
    n = 2 * r
    mats = {}
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                sel = (sx, sy, sz)
                off = np.stack([(off_p if s else off_m)[:, a]
                                for a, s in enumerate(sel)], -1)      # (P,3)
                idx = np.stack([(idx_p if s else idx_m)[:, a]
                                for a, s in enumerate(sel)], -1)
                w = ((w_p if sx else w_m)[:, 0]
                     * (w_p if sy else w_m)[:, 1]
                     * (w_p if sz else w_m)[:, 2])
                flat = (idx[:, 0] * n + idx[:, 1]) * n + idx[:, 2]
                for p in range(P):
                    d = tuple(int(x) for x in off[p])
                    if d not in mats:
                        mats[d] = np.zeros((n ** 3, P), np.float32)
                    mats[d][flat[p], p] += w[p]
    offsets = sorted(mats)
    M = np.stack([mats[d] for d in offsets])
    return (np.asarray(offsets, np.int32), M,
            M.sum(axis=1).astype(np.float32))


def blend_operands(r: int):
    """The (mats, colsums) constants of `_corner_blend_mats` as arrays.

    At r<=4 the blend matrices are small enough to bake into the program
    as constants, but they grow as r^6 — 27 x (2r)^3 x (r+1)^3 f32 is
    ~322 MB at r=8, which oversizes the serialized program (observed: a
    tunnel compile endpoint rejecting the request outright).  Callers that
    jit over large r pass these as runtime operands instead (the Mesher
    caches one device copy per (r, device)).
    """
    offsets, mats, colsums = _corner_blend_mats(r)
    return np.asarray(mats), np.asarray(colsums)


def _corner_field(indexer, batch_map, positions_b, cube_sdf, cube_std,
                  n_xyz, r: int, latent_capacity: int, blend=None):
    """Interpolated (sdf, std) at the (r+1)^3 cell-corner lattice of each voxel.

    :param positions_b: (B,) flat voxel ids of the meshing batch.
    :param cube_sdf/std: (B, 2r, 2r, 2r).
    :param blend: optional (mats, colsums) operands (see blend_operands);
        None bakes them as program constants (fine for small r).
    :return: sdf, std (B, r+1, r+1, r+1).
    """
    B = cube_sdf.shape[0]
    S = (2 * r) ** 3
    n_xyz_arr = jnp.asarray(n_xyz, jnp.int32)
    vox_xyz = vox.unlinearize_id(positions_b, n_xyz)                 # (B,3)
    offsets, mats, colsums = _corner_blend_mats(r)
    if blend is not None:
        mats, colsums = blend

    # Stacked source planes so each neighbour costs ONE row gather:
    # plane 0 = sdf*std (the std-weighted numerator), plane 1 = std.
    planes = jnp.stack([(cube_sdf * cube_std).reshape(B, S),
                        cube_std.reshape(B, S)], axis=-1)            # (B,S,2)

    num_sdf = jnp.zeros((B, colsums.shape[1]))
    den_sdf = jnp.zeros((B, colsums.shape[1]))
    den_std = jnp.zeros((B, colsums.shape[1]))
    for di in range(len(offsets)):
        src_xyz = vox_xyz + jnp.asarray(offsets[di])[None, :]        # (B,3)
        inb = jnp.all((src_xyz >= 0) & (src_xyz < n_xyz_arr), axis=-1)
        gid = vox.linearize_id(jnp.clip(src_xyz, 0, n_xyz_arr - 1), n_xyz)
        slot = indexer[gid]
        row = batch_map[jnp.clip(slot, 0, latent_capacity - 1)]
        ok = inb & (slot >= 0) & (row >= 0)                           # (B,)
        g = planes[jnp.clip(row, 0, B - 1)]                           # (B,S,2)
        Md = jnp.asarray(mats[di])  # constant (blend=None) or operand slice
        okf = ok.astype(jnp.float32)[:, None]
        num_sdf += jnp.matmul(g[..., 0], Md, precision=_APPLY) * okf
        den_sdf += jnp.matmul(g[..., 1], Md, precision=_APPLY) * okf
        den_std += okf * jnp.asarray(colsums[di])[None, :]

    # num_std == den_sdf (both accumulate w*std), so std = den_sdf/den_std.
    sdf = num_sdf / jnp.maximum(den_sdf, 1e-12)
    std = den_sdf / jnp.maximum(den_std, 1e-12)
    shape = (B, r + 1, r + 1, r + 1)
    return sdf.reshape(shape), std.reshape(shape)


@functools.lru_cache(maxsize=None)
def _tri_select_consts():
    """One-hot table constants: config -> (edge-selection, existence).

    SEL[c, ((t*3)+k)*12 + e] = 1 iff triangle t corner k of config c uses
    edge e; EX[c, t] = 1 iff triangle t exists.  Turns the data-dependent
    table + edge gathers into two exact 0/1 matmuls.
    """
    T = MAX_TRIS_PER_CELL
    SEL = np.zeros((256, T * 3 * 12), np.float32)
    EX = np.zeros((256, T), np.float32)
    for c in range(256):
        row = TRI_TABLE[c]
        for t in range(T):
            if row[3 * t] < 0:
                break
            EX[c, t] = 1.0
            for k in range(3):
                SEL[c, (t * 3 + k) * 12 + int(row[3 * t + k])] = 1.0
    return SEL, EX


@functools.partial(
    jax.jit,
    static_argnames=("n_xyz", "r", "latent_capacity", "budget", "voxel_size",
                     "frontier_kill"))
def marching_cubes_sparse(indexer, batch_map, positions_b, batch_valid,
                          cube_sdf, cube_std,
                          n_xyz, voxel_size, bound_min,
                          r: int, latent_capacity: int,
                          max_std: float, budget: int,
                          frontier_kill: bool = True,
                          blend=None) -> MCResult:
    """Extract triangles for a batch of voxels.

    :param indexer: (n_voxels,) flat id -> slot.
    :param batch_map: (C,) slot -> batch row | -1.
    :param positions_b: (B,) flat voxel ids of the meshing batch.
    :param batch_valid: (B,) bool (padding rows off).
    :param cube_sdf/cube_std: (B, 2r, 2r, 2r) decoder samples.
    :param max_std: vertex std pruning threshold (traced).
    :param budget: max triangles returned (static).
    :param frontier_kill: reproduce the reference's dominant-source NaN-kill
        (mc_interp_kernel.cu:101-185).  The dominant (``zero_det``) source of
        every corner is its own voxel (see module docstring), so the rule
        reduces to: a row whose own voxel is missing from indexer/batch_map
        emits no triangles.  False keeps the pure-renormalisation behaviour.
    """
    B = cube_sdf.shape[0]
    if frontier_kill:
        own_slot = indexer[positions_b]
        own_row = batch_map[jnp.clip(own_slot, 0, latent_capacity - 1)]
        own_ok = (own_slot >= 0) & (own_slot < latent_capacity) & (own_row >= 0)
        batch_valid = batch_valid & own_ok
    sdf, std = _corner_field(indexer, batch_map, positions_b, cube_sdf, cube_std,
                             n_xyz, r, latent_capacity, blend)

    # Cells: (r^3 per voxel); corner c of cell (x,y,z) sits at (x,y,z)+CORNERS[c].
    cr = np.arange(r)
    cx, cy, cz = np.meshgrid(cr, cr, cr, indexing="ij")
    cell = jnp.asarray(np.stack([cx, cy, cz], -1).reshape(-1, 3), jnp.int32)  # (Q,3)
    Q = cell.shape[0]
    corners_i = jnp.asarray(CORNERS.astype(np.int32))                  # (8,3)
    cidx = cell[:, None, :] + corners_i[None, :, :]                    # (Q,8,3)
    c_sdf = sdf[:, cidx[..., 0], cidx[..., 1], cidx[..., 2]]           # (B,Q,8)
    c_std = std[:, cidx[..., 0], cidx[..., 1], cidx[..., 2]]

    inside = (c_sdf < 0).astype(jnp.int32)
    config = jnp.sum(inside * (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :],
                     axis=-1)                                          # (B,Q)

    # Compact ACTIVE cells (config not 0/255) BEFORE any edge work:
    # typically only ~r^2 of the r^3 cells of a surface voxel cut the
    # surface, so the edge lerp/world-coordinate math runs on NC rows
    # instead of materializing (B,Q,12,3) buffers for every cell (50 MB
    # of writes at the flagship batch that the row-gather then re-read).
    T = MAX_TRIS_PER_CELL
    NC = min(B * Q, max(4096, B * 4 * r))
    active = batch_valid[:, None] & (config > 0) & (config < 255)      # (B,Q)
    flat_active = active.reshape(-1)
    cell_idx, cell_ok, _ = vox.compact_by_mask(
        jnp.arange(B * Q, dtype=jnp.int32), flat_active, NC)
    cells_dropped = jnp.sum(flat_active).astype(jnp.int32) > NC
    # per-active-cell corner values: complex-pack (sdf, std) so the row
    # gather moves one (NC, 8) complex array instead of two f32 ones
    packed = jax.lax.complex(c_sdf, c_std).reshape(B * Q, 8)
    cs_pack = packed[cell_idx]                                         # (NC,8)
    cs = jnp.real(cs_pack)
    ss = jnp.imag(cs_pack)
    cfg_c = config.reshape(-1)[cell_idx]                               # (NC,)
    fid_c = positions_b[cell_idx // Q]                                 # (NC,)

    # Vertex on each of the 12 edges of the ACTIVE cells (sdf-weighted
    # lerp; mc_interp_kernel.cu:187-200).
    ec = jnp.asarray(EDGE_CORNERS)                                     # (12,2)
    v1 = cs[:, ec[:, 0]]
    v2 = cs[:, ec[:, 1]]                                               # (NC,12)
    s1 = ss[:, ec[:, 0]]
    s2 = ss[:, ec[:, 1]]
    denom = v2 - v1
    t = jnp.where(jnp.abs(denom) < 1e-5, 0.0, -v1 / jnp.where(denom == 0, 1.0, denom))
    t = jnp.where(jnp.abs(v1) < 1e-5, 0.0, jnp.where(jnp.abs(v2) < 1e-5, 1.0, t))
    t = jnp.clip(t, 0.0, 1.0)
    p1 = jnp.asarray(CORNERS[EDGE_CORNERS[:, 0]], jnp.float32)          # (12,3)
    p2 = jnp.asarray(CORNERS[EDGE_CORNERS[:, 1]], jnp.float32)
    edge_pos = p1[None] + t[..., None] * (p2 - p1)[None]                # (NC,12,3)
    es = s1 + t * (s2 - s1)                                             # (NC,12)

    # Cell origin in grid units (per active cell).
    vox_xyz = vox.unlinearize_id(fid_c, n_xyz).astype(jnp.float32)      # (NC,3)
    cell_origin = vox_xyz + cell[cell_idx % Q].astype(jnp.float32) / r
    ew = (cell_origin[:, None, :] + edge_pos / r) * voxel_size \
        + bound_min[None, None, :]                                      # (NC,12,3)

    # Table + edge selection as exact one-hot matmuls (constant 0/1
    # matrices): the classic per-cell gather chain config -> tri rows ->
    # edge vertices becomes MXU work.  One-pass precision is EXACT here:
    # every output element has a single nonzero term (one config matches),
    # and 0/1 are exactly representable in bf16.
    SEL, EX = _tri_select_consts()
    onehot = (cfg_c[:, None] == jnp.arange(256, dtype=cfg_c.dtype)
              ).astype(jnp.float32)                                    # (NC,256)
    tri_sel = jnp.matmul(onehot, jnp.asarray(SEL)).reshape(NC, T, 3, 12)
    verts = jnp.einsum("ntke,ned->ntkd", tri_sel, ew, precision=_APPLY)  # (NC,T,3,3)
    vstd = jnp.einsum("ntke,ne->ntk", tri_sel, es, precision=_APPLY)     # (NC,T,3)
    tri_ok = jnp.matmul(onehot, jnp.asarray(EX)) > 0.5                 # (NC,T)

    tri_valid = tri_ok & cell_ok[:, None] & (jnp.max(vstd, axis=-1) <= max_std)

    # Prefix-sum compaction into the fixed budget.  Destination ranks are
    # monotone, so this is a SORTED segment-sum (vectorized segmented
    # reduce) — the generic scatter formulation ran on the scalar unit and
    # was the single hottest piece of the whole extraction (29.9 ms of
    # 44.9 at B=4096, r=4; sub-ms this way).
    flat_valid = tri_valid.reshape(-1)
    n_tri = jnp.sum(flat_valid).astype(jnp.int32)
    rank = jnp.cumsum(flat_valid) - 1
    keep = flat_valid & (rank < budget)
    seg = jnp.clip(rank, 0, budget - 1)
    keep_f = keep.astype(jnp.float32)
    packed = jnp.concatenate([
        verts.reshape(-1, 9), vstd.reshape(-1, 3),
    ], axis=1) * keep_f[:, None]                        # (NC*T, 12)
    out = jax.ops.segment_sum(packed, seg, num_segments=budget,
                              indices_are_sorted=True)
    # voxel ids stay int32 through their own segment-sum (a float round
    # trip is exact only below 2^24 flat ids — larger maps would silently
    # corrupt the incremental cache's stale-triangle eviction)
    flat_fid = jnp.broadcast_to(fid_c[:, None], (NC, T)).reshape(-1)
    out_fid = jax.ops.segment_sum(
        jnp.where(keep, flat_fid.astype(jnp.int32) + 1, 0), seg,
        num_segments=budget, indices_are_sorted=True) - 1  # empty -> -1
    out_verts = out[:, :9].reshape(budget, 3, 3)
    out_std = out[:, 9:12]
    valid = jnp.arange(budget) < n_tri
    return MCResult(out_verts, out_std, out_fid, valid, n_tri, cells_dropped)


def dense_marching_cubes(field: np.ndarray, origin=(0.0, 0.0, 0.0), spacing=1.0):
    """Host-side dense-grid marching cubes (numpy) over a scalar field.

    Debug/test utility sharing the generated tables with the sparse TPU op.
    :param field: (X, Y, Z) SDF samples (inside < 0).
    :return: (T, 3, 3) triangles, outward winding (normals toward sdf > 0).
    """
    X, Y, Z = field.shape
    inside = field < 0
    cfg = np.zeros((X - 1, Y - 1, Z - 1), np.int32)
    for bit, (dx, dy, dz) in enumerate(CORNERS.astype(int)):
        cfg |= inside[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz] << bit
    cells = np.argwhere((cfg > 0) & (cfg < 255))
    tris = []
    for x, y, z in cells:
        vals = np.array([field[x + int(c[0]), y + int(c[1]), z + int(c[2])]
                         for c in CORNERS])
        row = TRI_TABLE[cfg[x, y, z]]
        everts = {}
        for e in set(row[row >= 0].tolist()):
            a, b = EDGE_CORNERS[e]
            va, vb = vals[a], vals[b]
            if abs(va) < 1e-12:
                t = 0.0
            elif abs(vb) < 1e-12:
                t = 1.0
            elif abs(vb - va) < 1e-12:
                t = 0.0
            else:
                t = va / (va - vb)
            everts[e] = CORNERS[a] + t * (CORNERS[b] - CORNERS[a])
        for i in range(0, len(row), 3):
            if row[i] < 0:
                break
            tri = np.stack([everts[row[i]], everts[row[i + 1]], everts[row[i + 2]]])
            tris.append((tri + np.array([x, y, z])) * spacing + np.asarray(origin))
    if not tris:
        return np.zeros((0, 3, 3))
    return np.stack(tris)
