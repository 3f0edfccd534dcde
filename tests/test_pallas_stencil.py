"""Fused Pallas windowed-normals stencil vs the XLA imgproc path.

Interpret mode on CPU; on a real TPU backend the same assertions run
against the compiled kernel (manual-DMA halo slabs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.data.synth import SyntheticSequence
from nerf_fusion_tpu.ops import imgproc
from nerf_fusion_tpu.ops.pallas_stencil import (HALO, TILE_H,
                                                neighbor_count_pallas,
                                                normals_stencil_pallas)

_INTERPRET = jax.devices()[0].platform != "tpu"


def _frame(h=120, w=160):
    seq = SyntheticSequence(n_frames=1, width=w, height=h)
    fr = seq.render_frame(0)
    depth = jnp.asarray(fr.depth)
    pts = imgproc.unproject_depth(depth, fr.calib.fx, fr.calib.fy,
                                  fr.calib.cx, fr.calib.cy)
    valid = jnp.isfinite(depth)
    return jnp.where(valid[None], pts, 0.0), valid


def test_normals_stencil_matches_xla():
    pts, valid = _frame()
    n_ref, ok = imgproc.estimate_normals_image(
        pts, valid, radius=0.1, radius_px=HALO, min_neighbors=5)
    cnt_ref = imgproc.radius_neighbor_count(pts, valid, radius=0.1,
                                            radius_px=HALO)
    n_pal, cnt_pal = normals_stencil_pallas(pts, valid, radius=0.1,
                                            interpret=_INTERPRET)
    m = np.asarray(ok)
    nr = np.asarray(n_ref)[:, m].T
    npal = np.asarray(n_pal)[:, m].T
    dot = np.sum(nr * npal, -1)
    # Sign/direction can legitimately differ at grazing incidence (the
    # camera-facing flip is ambiguous at n.p ~ 0) and where two eigenvalues
    # nearly coincide; require agreement on the overwhelming majority.
    assert np.mean(np.abs(dot) > 0.999) > 0.99
    assert np.mean(dot > 0) > 0.995
    assert np.median(np.abs(npal - nr)) < 1e-3
    # counts are integers -> exact
    dc = np.asarray(cnt_pal) - 1.0 - np.asarray(cnt_ref)
    assert np.abs(dc[np.asarray(valid)]).max() == 0.0


def test_count_only_kernel_matches_xla():
    pts, valid = _frame()
    cnt_ref = imgproc.radius_neighbor_count(pts, valid, radius=0.05,
                                            radius_px=HALO)
    cnt_pal = neighbor_count_pallas(pts, valid, radius=0.05,
                                    interpret=_INTERPRET)
    dc = (np.asarray(cnt_pal) - 1.0 - np.asarray(cnt_ref))[np.asarray(valid)]
    assert np.abs(dc).max() == 0.0


@pytest.mark.parametrize("h", [TILE_H - 7, TILE_H, TILE_H + 1, 3 * TILE_H])
def test_nonmultiple_heights(h):
    pts, valid = _frame(h=h, w=96)
    cnt_ref = imgproc.radius_neighbor_count(pts, valid, radius=0.1,
                                            radius_px=HALO)
    n_pal, cnt_pal = normals_stencil_pallas(pts, valid, radius=0.1,
                                            interpret=_INTERPRET)
    assert n_pal.shape == (3, h, 96) and cnt_pal.shape == (h, 96)
    dc = (np.asarray(cnt_pal) - 1.0 - np.asarray(cnt_ref))[np.asarray(valid)]
    assert np.abs(dc).max() == 0.0


def test_all_invalid_frame():
    pts = jnp.zeros((3, 72, 96))
    valid = jnp.zeros((72, 96), bool)
    n, cnt = normals_stencil_pallas(pts, valid, radius=0.1,
                                    interpret=_INTERPRET)
    assert np.all(np.asarray(cnt) == 0.0)
    assert np.all(np.isfinite(np.asarray(n)))
