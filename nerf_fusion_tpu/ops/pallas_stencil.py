"""Fused Pallas stencil kernel: windowed point statistics -> normals.

The preprocessing frontend's hot loop accumulates count/mean/covariance
over a 7x7 pixel window (49 taps x 10 accumulator planes) and then solves
a symmetric-3x3 eigenproblem per pixel.  Under XLA each tap materialises
intermediate planes through HBM; this kernel holds one padded row-tile of
the point planes in VMEM and keeps every accumulator in registers, writing
only the final (normals, neighbour-count) planes.

Grid: one program per TILE_H-row slab.  Inputs are pre-padded by the halo
(3 rows/cols) so every slab reads a static (TILE_H + 6, W + 6) window —
no boundary conditionals inside the kernel.

Outputs per pixel: camera-facing unit normal (3 planes) + the within-radius
neighbour count (used by the radius-outlier filter), i.e. everything
``estimate_normals_image`` + ``radius_neighbor_count`` produce, in one pass.

Status: EXPERIMENTAL — compiled + validated on v5e (exact count parity,
99.99% normal agreement vs the XLA path at 320x240), but measured at
parity with XLA (0.54 ms/frame min-of-5x100 for both): XLA's fusion
already keeps this 49-tap elementwise chain in registers, so the manual
DMA buys nothing at this image size.  Not wired into
``frontend.preprocess_frame``; kept as the halo-stencil pattern
(manual ``make_async_copy`` slabs — BlockSpec index maps are
block-granular and cannot express overlapping reads) for larger-footprint
kernels where XLA's fusion window breaks down.

Mosaic lowering notes earned here: no ``dynamic_slice`` on values (use
static ref slices — tap offsets are Python ints), no inverse trig (the
``_acos`` polynomial below), DMA slice extents must be sublane/lane-tile
aligned ((8, 128) for f32 — hence SLAB row rounding and width padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
HALO = 3
# DMA slab rows: TILE_H + 2*HALO rounded up to the sublane tile (8) —
# Mosaic requires 8-aligned slice extents; the 2 trailing rows are unread.
SLAB = -(-(TILE_H + 2 * HALO) // 8) * 8


def _acos(x):
    """Polynomial arccos (Abramowitz-Stegun 4.4.45 extended, ~2e-8 rad).

    Mosaic has no inverse-trig lowering; this is sqrt + degree-7 Horner +
    select, all VPU elementwise.
    """
    ax = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, jnp.float32(jnp.pi) - r, r)


def _sym3_smallest_eigvec_planes(a00, a01, a02, a11, a12, a22):
    """Trigonometric smallest-eigenvector (see imgproc._sym3_smallest_eigvec)."""
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = _acos(r) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    r0 = (a00 - lam, a01, a02)
    r1 = (a01, a11 - lam, a12)
    r2 = (a02, a12, a22 - lam)

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    c01, c02, c12 = cross(r0, r1), cross(r0, r2), cross(r1, r2)
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
    use01 = n01 >= jnp.maximum(n02, n12)
    use02 = n02 >= n12
    v = [jnp.where(use01, c01[i], jnp.where(use02, c02[i], c12[i]))
         for i in range(3)]
    return v


def _make_kernel(radius2: float, W: int, Wp: int, count_only: bool = False):
    def kernel(pts_hbm, valid_hbm, out_ref):
        # pts_hbm: (3, Hp + SLAB - TILE_H, Wp) compiler-placed (ANY); each program
        # DMAs its halo-extended slab into VMEM scratch (overlapping reads
        # are not expressible with BlockSpec's block-granular index maps).
        i = pl.program_id(0)

        def body(scratch_p, scratch_v, sem_p, sem_v):
            cp = pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(i * TILE_H, SLAB), :], scratch_p, sem_p)
            cv = pltpu.make_async_copy(
                valid_hbm.at[:, pl.ds(i * TILE_H, SLAB), :], scratch_v, sem_v)
            cp.start()
            cv.start()
            cp.wait()
            cv.wait()
            _compute(scratch_p, scratch_v, out_ref)

        pl.run_scoped(
            body,
            scratch_p=pltpu.VMEM((3, SLAB, Wp), jnp.float32),
            scratch_v=pltpu.VMEM((1, SLAB, Wp), jnp.float32),
            sem_p=pltpu.SemaphoreType.DMA,
            sem_v=pltpu.SemaphoreType.DMA,
        )

    def _compute(pts_ref, valid_ref, out_ref):
        # Static-offset VMEM loads per tap (dy/dx are Python ints from the
        # unrolled loop; Mosaic has no dynamic_slice, but static slices of a
        # ref lower directly).
        def sl(plane, dy, dx):
            y0, x0 = HALO + dy, HALO + dx
            if plane < 3:
                return pts_ref[plane, y0:y0 + TILE_H, x0:x0 + W]
            return valid_ref[0, y0:y0 + TILE_H, x0:x0 + W]

        px, py, pz, va = 0, 1, 2, 3
        cx, cy, cz = sl(px, 0, 0), sl(py, 0, 0), sl(pz, 0, 0)
        cv = sl(va, 0, 0)

        cnt = jnp.zeros((TILE_H, W))
        if not count_only:
            s1x = jnp.zeros((TILE_H, W))
            s1y = jnp.zeros((TILE_H, W))
            s1z = jnp.zeros((TILE_H, W))
            sxx = jnp.zeros((TILE_H, W))
            sxy = jnp.zeros((TILE_H, W))
            sxz = jnp.zeros((TILE_H, W))
            syy = jnp.zeros((TILE_H, W))
            syz = jnp.zeros((TILE_H, W))
            szz = jnp.zeros((TILE_H, W))
        for dy in range(-HALO, HALO + 1):
            for dx in range(-HALO, HALO + 1):
                nx, ny, nz = sl(px, dy, dx), sl(py, dy, dx), sl(pz, dy, dx)
                nv = sl(va, dy, dx)
                d2 = (nx - cx) ** 2 + (ny - cy) ** 2 + (nz - cz) ** 2
                w = jnp.where((nv > 0.5) & (cv > 0.5) & (d2 <= radius2),
                              1.0, 0.0)
                cnt += w
                if count_only:
                    continue
                s1x += w * nx
                s1y += w * ny
                s1z += w * nz
                sxx += w * nx * nx
                sxy += w * nx * ny
                sxz += w * nx * nz
                syy += w * ny * ny
                syz += w * ny * nz
                szz += w * nz * nz
        if count_only:
            out_ref[0] = cnt
            return
        denom = jnp.maximum(cnt, 1.0)
        mx, my, mz = s1x / denom, s1y / denom, s1z / denom
        v = _sym3_smallest_eigvec_planes(
            sxx / denom - mx * mx, sxy / denom - mx * my,
            sxz / denom - mx * mz, syy / denom - my * my,
            syz / denom - my * mz, szz / denom - mz * mz)
        # camera at origin: flip toward -p
        dot = v[0] * cx + v[1] * cy + v[2] * cz
        flip = jnp.where(dot > 0, -1.0, 1.0)
        norm = jnp.sqrt(jnp.maximum(v[0] ** 2 + v[1] ** 2 + v[2] ** 2, 1e-24))
        out_ref[0] = flip * v[0] / norm
        out_ref[1] = flip * v[1] / norm
        out_ref[2] = flip * v[2] / norm
        out_ref[3] = cnt

    return kernel


def _padded_call(pts, valid, radius, count_only, interpret):
    _, H, W = pts.shape
    Hp = -(-H // TILE_H) * TILE_H
    # bottom pad so the last slab's SLAB-row DMA stays in bounds; right pad
    # so the DMA'd width is lane-tile (128) aligned.
    bot = Hp - H + (SLAB - HALO - TILE_H)
    Wp = -(-(W + 2 * HALO) // 128) * 128
    right = Wp - W - HALO
    pts_p = jnp.pad(pts, ((0, 0), (HALO, bot), (HALO, right)))
    val_p = jnp.pad(valid.astype(jnp.float32),
                    ((HALO, bot), (HALO, right)))[None]
    n_planes = 1 if count_only else 4
    out = pl.pallas_call(
        _make_kernel(radius * radius, W, Wp, count_only),
        out_shape=jax.ShapeDtypeStruct((n_planes, Hp, W), jnp.float32),
        grid=(Hp // TILE_H,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # full array, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((n_planes, TILE_H, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_p, val_p)
    return out


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def normals_stencil_pallas(pts, valid, radius: float = 0.1,
                           interpret: bool = False):
    """(3, H, W) points + (H, W) validity -> (normals (3,H,W), count (H,W)).

    count includes the centre pixel (subtract 1 for neighbour count);
    normals are unit and camera-facing (camera at the origin) wherever the
    window has >= ~2 non-collinear neighbours — at degenerate pixels
    (count <= 2, zero covariance) they are finite but meaningless, so gate
    on the count exactly as with ``estimate_normals_image``'s ok mask.
    H is padded to a TILE_H multiple internally.  Fused replacement for
    ``imgproc.estimate_normals_image`` + ``imgproc.radius_neighbor_count``
    at a shared radius (reference: imgproc.cu sym3eig + pcproc.cu
    remove_radius_outlier, done there as two KD-tree passes).
    """
    _, H, _ = pts.shape
    out = _padded_call(pts, valid, radius, False, interpret)
    return out[:3, :H, :], out[3, :H, :]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def neighbor_count_pallas(pts, valid, radius: float = 0.05,
                          interpret: bool = False):
    """Within-radius windowed neighbour count, centre pixel included.

    Count-only kernel variant (no covariance/eigensolve) for the radius
    outlier gate, which the frontend applies at a smaller radius *before*
    normal estimation (frontend.py:77 vs :81 — two radii, sequential
    validity, so the two passes cannot be fused into one).
    """
    _, H, _ = pts.shape
    out = _padded_call(pts, valid, radius, True, interpret)
    return out[0, :H, :]
