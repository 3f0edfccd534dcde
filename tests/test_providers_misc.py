"""ShapeNet provider (fake mini dataset), OBJ IO, bilateral depth filter."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fusion_tpu.data.providers import ShapeNetGenerator
from nerf_fusion_tpu.ops import imgproc
from nerf_fusion_tpu.ops.mesh import box_mesh, load_obj, save_obj


@pytest.fixture
def mini_shapenet(tmp_path):
    """Two categories x one model in ShapeNetCore.v2 layout."""
    for cat, shape in [("02871439", "aaaa"), ("03001627", "bbbb")]:
        mdir = tmp_path / cat / shape / "models"
        mdir.mkdir(parents=True)
        V, F = box_mesh(0.4, 0.6, 0.5)
        save_obj(mdir / "model_normalized.obj", V - V.mean(0), F)
    return tmp_path


def test_shapenet_generator(mini_shapenet):
    gen = ShapeNetGenerator(str(mini_shapenet),
                            categories=["02871439", "03001627", "99999999"],
                            shapes_per_category=[5, 5, 5], scale=[1.0, 1.7, 1.0])
    assert len(gen) == 2
    item = gen[0]
    assert item["vertices"].shape[1] == 3 and item["faces"].shape[1] == 3
    assert item["sampler_mult"] in (1.0, 1.7)
    assert "/" in gen.get_source(0)


def test_obj_roundtrip(tmp_path):
    V, F = box_mesh(1.0, 2.0, 0.5)
    save_obj(tmp_path / "m.obj", V, F)
    V2, F2 = load_obj(tmp_path / "m.obj")
    assert np.allclose(V, V2, atol=1e-5)
    assert np.array_equal(F, F2)


def test_obj_polygon_triangulation(tmp_path):
    (tmp_path / "quad.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    V, F = load_obj(tmp_path / "quad.obj")
    assert len(V) == 4 and len(F) == 2  # quad fan-triangulated


def test_bilateral_depth_filter():
    rng = np.random.RandomState(0)
    depth = np.full((32, 32), 2.0, np.float32)
    depth[:, 16:] = 3.0                       # a depth edge
    noisy = depth + rng.randn(32, 32).astype(np.float32) * 0.01
    noisy[5, 5] = np.nan
    out = np.asarray(imgproc.bilateral_depth_filter(jnp.asarray(noisy)))
    assert np.isnan(out[5, 5])                # NaN preserved
    # noise reduced away from the edge
    flat = out[10:20, 2:12]
    assert flat.std() < noisy[10:20, 2:12].std() * 0.6
    # edge preserved (no blur across)
    assert abs(out[10, 14] - 2.0) < 0.05
    assert abs(out[10, 18] - 3.0) < 0.05
