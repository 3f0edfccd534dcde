"""Device-resident LIF sampling (data/device_lif.py): distribution
semantics vs the host packed sampler, and the trainer integration.
(VERDICT r2 item 2 enabler: zero per-step H2D for the reference-scale run.)
"""

import numpy as np
import jax
import pytest

from nerf_fusion_tpu.data.device_lif import DeviceLifDataset
from nerf_fusion_tpu.data.generator import run_generator
from nerf_fusion_tpu.data.lif_dataset import LifDataset
from nerf_fusion_tpu.utils.config import dict_to_args


@pytest.fixture(scope="module")
def tiny_lif_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("devlif")
    args = dict_to_args(dict(
        provider="simple_shape", provider_kwargs={"n_shapes": 2},
        output=str(out / "ds"), sample_method=2, sampler_var=0.005,
        sampler_count=60000, voxel_size=0.08, nn_size=2.0, nproc=0))
    run_generator(args)
    return out / "ds"


@pytest.mark.slow
def test_device_sampler_matches_pool_semantics(tiny_lif_dir):
    ds = LifDataset(str(tiny_lif_dir), num_sample=128, num_surface_sample=32)
    dev = DeviceLifDataset.from_dataset(ds)
    idxs = np.arange(min(8, len(ds)))
    sdf, surf = dev.sample(jax.random.PRNGKey(0), idxs)
    sdf, surf = np.asarray(sdf), np.asarray(surf)
    assert sdf.shape == (len(idxs), 128, 4)
    assert surf.shape == (len(idxs), 32, 6)

    pk = ds._ensure_packed()
    half = 64
    for b, i in enumerate(idxs):
        pos = np.asarray(pk["pos"][pk["pos_off"][i]:pk["pos_off"][i + 1]])
        neg = np.asarray(pk["neg"][pk["neg_off"][i]:pk["neg_off"][i + 1]])
        # balanced signs: first half from the + pool, second from the - pool
        if len(pos):
            assert (sdf[b, :half, 3] > 0).all()
            # every drawn row is an actual member of this LIF's pool
            assert np.isin(np.round(sdf[b, :half, 3], 5),
                           np.round(pos[:, 3], 5)).all()
        else:
            assert (sdf[b, :half] == 0).all()
        if len(neg):
            assert (sdf[b, half:, 3] <= 0).all()
        else:
            assert (sdf[b, half:] == 0).all()
    # surface normals stay unit
    nn = np.linalg.norm(surf[..., 3:6], axis=-1)
    assert np.allclose(nn[nn > 0.5], 1.0, atol=1e-4)


@pytest.mark.slow
def test_device_sampler_augment_preserves_geometry(tiny_lif_dir):
    ds = LifDataset(str(tiny_lif_dir), num_sample=64, num_surface_sample=32,
                    augment_rotation="Y", augment_noise=(0.025, 40.0))
    dev = DeviceLifDataset.from_dataset(ds)
    idxs = np.zeros(4, np.int64)
    sdf, surf = dev.sample(jax.random.PRNGKey(1), idxs)
    sdf, surf = np.asarray(sdf), np.asarray(surf)
    # rotation preserves radii of sdf sample positions
    ds0 = LifDataset(str(tiny_lif_dir), num_sample=64, num_surface_sample=32)
    dev0 = DeviceLifDataset.from_dataset(ds0)
    sdf0, _ = dev0.sample(jax.random.PRNGKey(1), idxs)
    r_aug = np.sort(np.linalg.norm(sdf[..., :3], axis=-1), axis=None)
    r_ref = np.sort(np.linalg.norm(np.asarray(sdf0)[..., :3], axis=-1),
                    axis=None)
    # same per-LIF draws under the same key -> same rows, rotated
    np.testing.assert_allclose(r_aug, r_ref, atol=1e-4)
    # normals still unit after cone perturbation
    nn = np.linalg.norm(surf[..., 3:6], axis=-1)
    assert np.allclose(nn[nn > 0.5], 1.0, atol=1e-3)


@pytest.mark.slow
def test_trainer_device_data_path(tiny_lif_dir):
    from nerf_fusion_tpu.trainer.train import train

    args = dict_to_args(dict(
        run_name="tdev", num_epochs=2, batch_size=4, batch_split=1,
        samples_per_lif=256, min_context_points=16, device_data=True,
        lr_schedule=[{"Type": "Step", "Initial": 1e-3, "Interval": 80,
                      "Factor": 0.4}] * 2,
        train_set=[{"data_path": str(tiny_lif_dir), "augment_rotation": "Y",
                    "num_surface_sample": 64, "augment_noise": [0.025, 40.0]}],
        code_bound=None, code_length=29,
        network_name="di_decoder",
        network_specs={"dims": [32, 32], "dropout": [0, 1, 2],
                       "dropout_prob": 0.2, "norm_layers": [0, 1, 2],
                       "latent_in": [1], "weight_norm": True},
        encoder_name="di_encoder",
        encoder_specs={"per_point_feat": [6, 16, 32], "bn":
                       {"class": "BatchNorm"}},
        snapshot_frequency=100, additional_snapshots=[],
        training_loss={"types": ["neg_log_likelihood", "reg_loss"],
                       "enforce_minmax": True, "clamping_distance": 0.2,
                       "code_reg_lambda": 1e-2},
        save_dir=str(tiny_lif_dir.parent / "ckpt")))
    model, save_dir = train(args, max_steps_per_epoch=6)
    assert model is not None


@pytest.mark.slow
def test_steps_per_call_equivalent_trajectory(tiny_lif_dir):
    """The epoch-in-few-dispatches scan (steps_per_call > 1) reproduces the
    per-step device_data path: same RNG split order, same batches, same
    parameter trajectory.  NOT asserted bit-identical: the scanned and
    standalone step programs fuse differently, and a last-ulp (~1e-7
    relative) gradient difference passes through Adam's 1/(sqrt(v)+eps)
    normalization — where v can be arbitrarily small early in training —
    so per-step updates can differ by O(lr * ulp/sqrt(v)).  Five lr=1e-3
    steps bound the accumulated divergence well under rtol=1e-4 on every
    parameter; the tolerance below is that bound with margin.  (Fixture
    data is fully deterministic: the provider RNG is self-seeded, see
    providers.py / Isometry.random(rng).)"""
    from nerf_fusion_tpu.trainer.train import train

    def cfg(run, spc):
        # one epoch: the per-step generator pre-pulls one batch before a
        # max_steps_per_epoch break (an extra RNG split), so cross-epoch
        # sequences only match when epochs run to completion
        return dict_to_args(dict(
            run_name=run, num_epochs=1, batch_size=4, batch_split=1,
            samples_per_lif=256, min_context_points=16, device_data=True,
            steps_per_call=spc,
            lr_schedule=[{"Type": "Step", "Initial": 1e-3, "Interval": 80,
                          "Factor": 0.4}] * 2,
            train_set=[{"data_path": str(tiny_lif_dir),
                        "augment_rotation": "Y",
                        "num_surface_sample": 64,
                        "augment_noise": [0.025, 40.0]}],
            code_bound=None, code_length=29,
            network_name="di_decoder",
            network_specs={"dims": [32, 32], "dropout": [0, 1, 2],
                           "dropout_prob": 0.2, "norm_layers": [0, 1, 2],
                           "latent_in": [1], "weight_norm": True},
            encoder_name="di_encoder",
            encoder_specs={"per_point_feat": [6, 16, 32],
                           "bn": {"class": "BatchNorm"}},
            snapshot_frequency=100, additional_snapshots=[],
            training_loss={"types": ["neg_log_likelihood", "reg_loss"],
                           "enforce_minmax": True, "clamping_distance": 0.2,
                           "code_reg_lambda": 1e-2},
            save_dir=str(tiny_lif_dir.parent / "ckpt_spc")))

    m1, _ = train(cfg("spc1", 1), max_steps_per_epoch=5)
    # 3 + remainder 2: the tail dispatch reuses the SAME compiled 3-step
    # program with a padded+masked row (trainer/train.py make_steps_runner)
    m3, _ = train(cfg("spc3", 3), max_steps_per_epoch=5)
    for a, b in zip(jax.tree_util.tree_leaves(m1.decoder_params),
                    jax.tree_util.tree_leaves(m3.decoder_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.encoder_params),
                    jax.tree_util.tree_leaves(m3.encoder_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
