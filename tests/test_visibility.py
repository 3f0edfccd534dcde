"""Virtual-scan visibility (method-1 sampler) tests."""

import numpy as np

from nerf_fusion_tpu.data.providers import SimpleShapeGenerator
from nerf_fusion_tpu.ops.mesh import sample_surface, sphere_mesh
from nerf_fusion_tpu.ops.sdf_sampler import sample_mesh_sdf, visible_surface_points


def _cams(n=40, radius=2.0):
    from nerf_fusion_tpu.utils.se3 import Isometry
    phi = np.pi * (3.0 - np.sqrt(5.0))
    cams = []
    for i in range(n):
        y = 1 - (i / float(n - 1)) * 2
        r = np.sqrt(max(1 - y * y, 0.0))
        p = np.array([np.cos(phi * i) * r, y, np.sin(phi * i) * r]) * radius
        cams.append(Isometry.look_at(p, np.zeros(3)))
    return cams


def test_hidden_inner_sphere_culled():
    """Points on an inner sphere enclosed by an outer shell must be culled."""
    Vo, Fo = sphere_mesh(0.5, 24, 48)
    rng = np.random.RandomState(0)
    outer_p, outer_n = sample_surface(Vo, Fo, 20000, rng)
    inner_p, inner_n = outer_p * 0.4, outer_n
    pts = np.concatenate([outer_p, inner_p])
    nrm = np.concatenate([outer_n, inner_n])
    vis = visible_surface_points(pts, nrm, _cams(), ortho_half=1.0, res=200)
    outer_vis = vis[:20000].mean()
    inner_vis = vis[20000:].mean()
    assert outer_vis > 0.7, f"outer visibility {outer_vis}"
    assert inner_vis < 0.02, f"inner leak {inner_vis}"


def test_method1_sampling_still_accurate():
    V, F = sphere_mesh(0.5, 24, 48)
    rng = np.random.RandomState(1)
    data, surface = sample_mesh_sdf(V, F, n_samples=15000, var=0.01, rng=rng,
                                    method=1, cameras=_cams(), ortho_half=1.0)
    r = np.linalg.norm(data[:, :3], axis=1)
    err = np.abs(data[:, 3] - (r - 0.5))
    assert np.median(err) < 6e-3


def test_provider_supplies_cameras():
    gen = SimpleShapeGenerator(2, seed=1)
    item = gen[0]
    assert len(item["cameras"]) == 100
    assert item["ortho_half"] > 0
