"""Native C++ kernels vs scipy oracles."""

import numpy as np
import pytest


def test_knn_sign_vote_matches_scipy():
    try:
        from nerf_fusion_tpu.native import knn_sign_vote
        knn_sign_vote(np.zeros((1, 3)), np.zeros((4, 3)) + np.eye(4, 3),
                      np.ones((4, 3)) / np.sqrt(3), 2)
    except Exception as e:
        pytest.skip(f"native lib unavailable: {e}")
    from scipy.spatial import cKDTree

    rng = np.random.RandomState(1)
    d = rng.randn(5000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    surf, nrm = 0.5 * d, d
    q = rng.randn(20000, 3) * 0.4

    sdf_n, keep_n = knn_sign_vote(q, surf, nrm, 11)

    tree = cKDTree(surf)
    dist, idx = tree.query(q, k=11)
    votes = np.einsum("nkj,nkj->nk", q[:, None, :] - surf[idx], nrm[idx]) > 0
    npos = votes.sum(1)
    keep_s = (npos == 0) | (npos == 11)
    sdf_s = np.where(npos == 11, 1.0, -1.0) * dist[:, 0]

    assert (keep_n == keep_s).all()
    both = keep_n & keep_s
    assert np.allclose(sdf_n[both], sdf_s[both], atol=1e-12)
