"""Data-generation + training slice tests (tiny, hermetic)."""

import numpy as np
import pytest

from nerf_fusion_tpu.data.generator import run_generator, split_lifs
from nerf_fusion_tpu.data.lif_dataset import LifDataset, batch_iterator, perturb_normal
from nerf_fusion_tpu.ops.mesh import box_mesh, cylinder_mesh, face_normals, sphere_mesh
from nerf_fusion_tpu.ops.sdf_sampler import sample_mesh_sdf, sign_vote_sdf
from nerf_fusion_tpu.trainer.train import train
from nerf_fusion_tpu.utils.config import dict_to_args


def test_primitive_meshes_closed():
    for V, F in [box_mesh(1, 0.5, 2), sphere_mesh(0.5, 12, 24), cylinder_mesh(0.5, 1, 24)]:
        # closed orientable mesh: every directed edge appears exactly once
        edges = {}
        for tri in F:
            for i in range(3):
                e = (int(tri[i]), int(tri[(i + 1) % 3]))
                edges[e] = edges.get(e, 0) + 1
        for (a, b), c in edges.items():
            assert c == 1
            assert edges.get((b, a), 0) == 1
        # outward normals: positive volume via divergence theorem
        n, area = face_normals(V, F)
        ctr = V[F].mean(axis=1)
        vol = np.einsum("ij,ij->i", ctr - V.mean(0), n * area[:, None]).sum() / 3
        assert vol > 0


def test_sign_vote_sdf_sphere():
    V, F = sphere_mesh(0.5, 24, 48)
    rng = np.random.RandomState(0)
    data, surface = sample_mesh_sdf(V, F, n_samples=20000, var=0.01, rng=rng)
    r = np.linalg.norm(data[:, :3], axis=1)
    true_sdf = r - 0.5
    err = np.abs(data[:, 3] - true_sdf)
    assert np.median(err) < 5e-3
    # signs nearly always correct away from surface
    far = np.abs(true_sdf) > 0.02
    sign_ok = np.sign(data[far, 3]) == np.sign(true_sdf[far])
    assert sign_ok.mean() > 0.99


def test_split_lifs_normalisation():
    rng = np.random.RandomState(0)
    pts = rng.rand(20000, 3) * 0.3
    sdf = rng.randn(20000) * 0.05
    data = np.concatenate([pts, sdf[:, None]], axis=1).astype(np.float32)
    surf = np.concatenate([pts[:5000], np.tile([[0, 0, 1.0]], (5000, 1))],
                          axis=1).astype(np.float32)
    lifs = split_lifs(data, surf, voxel_size=0.08)
    assert len(lifs) > 0
    for l in lifs[:5]:
        assert np.abs(l["data"][:, :3]).max() <= 1.0 + 1e-5
        assert l["data"].shape[1] == 4 and l["surface"].shape[1] == 6


def test_perturb_normal_cone():
    rng = np.random.RandomState(0)
    n = np.tile([[0.0, 0.0, 1.0]], (500, 1))
    p = perturb_normal(n, np.deg2rad(30.0), rng)
    cos = p @ np.array([0.0, 0.0, 1.0])
    assert np.all(cos > np.cos(np.deg2rad(30.0)) - 1e-6)
    assert np.allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_lif_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("lif")
    args = dict_to_args(dict(
        provider="simple_shape", provider_kwargs={"n_shapes": 2},
        output=str(out / "ds"), sample_method=2, sampler_var=0.005,
        sampler_count=60000, voxel_size=0.08, nn_size=2.0, nproc=0))
    run_generator(args)
    return out / "ds"


@pytest.mark.slow
def test_generator_and_dataset(tiny_lif_dir):
    ds = LifDataset(str(tiny_lif_dir), num_sample=256, num_surface_sample=64,
                    augment_rotation="Y", augment_noise=(0.025, 40.0))
    assert len(ds) > 0
    samples, surf, idx = ds[0]
    assert samples.shape == (256, 4) and surf.shape == (64, 6)
    batches = list(batch_iterator(ds, 2, drop_last=True))
    assert batches and batches[0][0].shape == (2, 256, 4)


@pytest.mark.slow
def test_training_loss_decreases(tiny_lif_dir):
    args = dict_to_args(dict(
        run_name="t", num_epochs=2, batch_size=4, batch_split=1,
        samples_per_lif=256, min_context_points=16,
        lr_schedule=[{"Type": "Step", "Initial": 1e-3, "Interval": 80, "Factor": 0.4}] * 2,
        train_set=[{"data_path": str(tiny_lif_dir), "augment_rotation": "Y",
                    "num_surface_sample": 64, "augment_noise": [0.025, 40.0]}],
        code_bound=None, code_length=29,
        network_name="di_decoder",
        network_specs={"dims": [128, 128, 128, 128], "dropout": [0, 1, 2, 3, 4, 5],
                       "dropout_prob": 0.2, "norm_layers": [0, 1, 2, 3, 4, 5],
                       "latent_in": [3], "weight_norm": True},
        encoder_name="di_encoder",
        encoder_specs={"per_point_feat": [6, 32, 64, 256], "bn": {"class": "BatchNorm"}},
        snapshot_frequency=2, additional_snapshots=[],
        training_loss={"types": ["neg_log_likelihood", "reg_loss"],
                       "enforce_minmax": True, "clamping_distance": 0.2,
                       "code_reg_lambda": 1e-2},
        save_dir=str(tiny_lif_dir.parent / "ckpt")))
    model, save_dir = train(args, max_steps_per_epoch=6)
    assert (save_dir / "model_2.npz").exists()
    assert (save_dir / "encoder_2.npz").exists()
    assert (save_dir / "hyper.json").exists()
    # loss trend from the scalar log
    import json
    lines = [json.loads(l) for l in
             (save_dir / "logs" / "scalars.jsonl").read_text().splitlines()]
    lls = [l["train"] for l in lines if l["tag"] == "epoch_sum/ll"]
    assert len(lls) == 2 and lls[1] < lls[0]


@pytest.mark.slow
def test_packed_sample_batch_matches_itemwise_distribution(tiny_lif_dir):
    """The packed-mmap vectorised sampler must draw from exactly the same
    per-LIF pools as the itemwise path: membership, sign balance, and
    augmentation invariants all hold."""
    ds = LifDataset(str(tiny_lif_dir), num_sample=64, num_surface_sample=32,
                    augment_rotation=None, augment_noise=(0.0, 0.0))
    idxs = np.arange(min(len(ds), 8))
    sdf, surf = ds.sample_batch(idxs)
    assert sdf.shape == (len(idxs), 64, 4) and surf.shape == (len(idxs), 32, 6)
    for bi, i in enumerate(idxs):
        raw = ds.get_raw_data(int(i))
        data, surface = raw["data"], raw["surface"]
        pos = data[data[:, 3] > 0]
        neg = data[data[:, 3] <= 0]
        # membership: every sampled row appears verbatim in the source pool
        for row in sdf[bi, :32]:
            src = pos if len(pos) else np.zeros((1, 4), np.float32)
            assert np.isclose(src, row, atol=0).all(1).any()
        for row in sdf[bi, 32:]:
            src = neg if len(neg) else np.zeros((1, 4), np.float32)
            assert np.isclose(src, row, atol=0).all(1).any()
        for row in surf[bi]:
            assert np.isclose(surface, row, atol=0).all(1).any()

    # with augmentation: norms preserved, positions perturbed
    ds2 = LifDataset(str(tiny_lif_dir), num_sample=64, num_surface_sample=32,
                     augment_rotation="Y", augment_noise=(0.025, 40.0))
    sdf2, surf2 = ds2.sample_batch(idxs)
    assert np.allclose(np.linalg.norm(surf2[..., 3:6], axis=-1), 1.0, atol=1e-5)
    # batch_iterator prefers the vectorised path and keeps the contract
    b = next(iter(batch_iterator(ds2, 4, seed=0)))
    assert b[0].shape == (4, 64, 4) and b[1].shape == (4, 32, 6)
    assert b[2].shape == (4,)


def test_packed_sampler_trailing_empty_pool(tmp_path):
    """A trailing LIF with an empty sign pool must zero-fill, not crash
    (regression: the packed gather indexed past the pool array)."""
    import json
    pdir = tmp_path / "payload"
    pdir.mkdir()
    rng = np.random.RandomState(0)
    lifs = []
    for i in range(3):
        n = 50
        data = rng.randn(n, 4).astype(np.float32)
        if i == 2:
            data[:, 3] = -np.abs(data[:, 3])   # last LIF: no positive sdf
        surface = rng.randn(20, 6).astype(np.float32)
        np.savez(pdir / ("%08d.npz" % i), data=data, surface=surface,
                 min=np.zeros(3, np.float32), max=np.ones(3, np.float32))
        lifs.append({"shape": "t", "voxel": i})
    with (tmp_path / "source.json").open("w") as f:
        json.dump(lifs, f)
    ds = LifDataset(str(tmp_path), num_sample=16, num_surface_sample=8)
    sdf, surf = ds.sample_batch(np.array([0, 1, 2]))
    assert np.all(sdf[2, :8] == 0.0)           # empty positive pool -> zeros
    assert np.all(sdf[2, 8:, 3] <= 0)
