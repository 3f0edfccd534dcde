"""Mesh -> SDF training samples (virtual-scan-free sampler).

Capability parity with the ``sampler_cuda/PreprocessMeshCUDA`` binary
(SURVEY.md §2.5): produce (a) oriented surface samples and (b) query points
with signed distances, where the sign comes from *k-nearest sign voting*
against the oriented surfels (unanimous vote -> signed distance of the
nearest surfel; split vote -> sample discarded; PreprocessMesh.cu
ComputeSDFKernel semantics).

Differences (by design): the reference's method 1 renders the mesh from
~100-300 virtual cameras through OpenGL to harvest only *visible* surfels;
this sampler implements method 2 (trust mesh normals, area-weighted
sampling — PreprocessMesh.cu:264-272,573-575), which the reference also
supports, is deterministic, and needs no GL.  Queries mix near-surface
Gaussian perturbations at two scales (sigma, sigma/5) with uniform samples
in the expanded bounding box (SamplePointKernel/SampleUniformKernel).

A native C++ grid-hash kNN backend (nerf_fusion_tpu.native) accelerates the
voting; scipy's cKDTree is the fallback.
"""

from __future__ import annotations

import numpy as np

from .mesh import sample_surface


def sample_mesh_sdf(V, F, n_samples: int, var: float,
                    perturb_ratio: float = 0.8, expand: float = 0.2,
                    n_surface: int = None, k_vote: int = 11, rng=None):
    """:return: (data (N,4) xyz+sdf  — NaN-vote rows dropped,
                 surface (M,6) xyz+normal)."""
    rng = rng or np.random.RandomState(0)
    if n_surface is None:
        n_surface = max(n_samples // 2, 10000)
    surf_pts, surf_nrm = sample_surface(V, F, n_surface, rng)

    n_pert = int(n_samples * perturb_ratio)
    base = surf_pts[rng.randint(0, n_surface, n_pert)]
    sigmas = np.where(rng.rand(n_pert, 1) < 0.5, var, var / 5.0) ** 0.5
    q_pert = base + rng.randn(n_pert, 3) * sigmas
    bb_min = V.min(0) - expand
    bb_max = V.max(0) + expand
    q_unif = rng.rand(n_samples - n_pert, 3) * (bb_max - bb_min) + bb_min
    queries = np.concatenate([q_pert, q_unif]).astype(np.float64)

    sdf, keep = sign_vote_sdf(queries, surf_pts, surf_nrm, k_vote)
    data = np.concatenate([queries[keep], sdf[keep, None]], axis=1).astype(np.float32)
    surface = np.concatenate([surf_pts, surf_nrm], axis=1).astype(np.float32)
    return data, surface


def sign_vote_sdf(queries, surf_pts, surf_nrm, k: int = 11):
    """Signed distance by unanimous kNN sign voting.

    :return: (sdf (N,), keep (N,) bool — False where the vote split).
    """
    try:
        from ..native import knn_sign_vote
        return knn_sign_vote(queries, surf_pts, surf_nrm, k)
    except Exception:
        pass
    from scipy.spatial import cKDTree

    tree = cKDTree(surf_pts)
    dist, idx = tree.query(queries, k=k)
    diff = queries[:, None, :] - surf_pts[idx]          # (N, k, 3)
    votes = np.einsum("nkj,nkj->nk", diff, surf_nrm[idx]) > 0
    n_pos = votes.sum(axis=1)
    keep = (n_pos == 0) | (n_pos == k)
    sign = np.where(n_pos == k, 1.0, -1.0)
    return sign * dist[:, 0], keep
