"""Trainer resume: params + optimizer state roundtrip, epochs continue."""

import json

import numpy as np
import pytest

from nerf_fusion_tpu.trainer.train import train
from nerf_fusion_tpu.utils.config import dict_to_args


def _args(tmp, lif_dir, n_epochs):
    return dict_to_args(dict(
        run_name="r", num_epochs=n_epochs, batch_size=4, batch_split=1,
        samples_per_lif=128, min_context_points=16,
        lr_schedule=[{"Type": "Step", "Initial": 1e-3, "Interval": 80,
                      "Factor": 0.4}] * 2,
        train_set=[{"data_path": str(lif_dir), "augment_rotation": None,
                    "num_surface_sample": 32, "augment_noise": [0.0, 0.0]}],
        code_bound=None, code_length=29,
        network_name="di_decoder",
        network_specs={"dims": [128, 128, 128, 128], "dropout": [0, 1, 2, 3, 4, 5],
                       "dropout_prob": 0.2, "norm_layers": [0, 1, 2, 3, 4, 5],
                       "latent_in": [3], "weight_norm": True},
        encoder_name="di_encoder",
        encoder_specs={"per_point_feat": [6, 32, 64, 256],
                       "bn": {"class": "BatchNorm"}},
        snapshot_frequency=2, additional_snapshots=[],
        training_loss={"types": ["neg_log_likelihood", "reg_loss"],
                       "enforce_minmax": True, "clamping_distance": 0.2,
                       "code_reg_lambda": 1e-2},
        save_dir=str(tmp)))


@pytest.mark.slow
def test_resume_continues(tmp_path):
    # tiny in-place dataset
    import nerf_fusion_tpu.data.generator as gen
    args_gen = dict_to_args(dict(provider="simple_shape",
                                 provider_kwargs={"n_shapes": 1},
                                 output=str(tmp_path / "ds"), sample_method=2,
                                 sampler_var=0.005, sampler_count=40000,
                                 voxel_size=0.08, nn_size=2.0, nproc=0))
    gen.run_generator(args_gen)

    a1 = _args(tmp_path, tmp_path / "ds", 2)
    model1, d1 = train(a1, max_steps_per_epoch=4)
    assert (d1 / "optimizer_2.pkl").exists()

    a2 = _args(tmp_path, tmp_path / "ds", 4)
    model2, d2 = train(a2, max_steps_per_epoch=4, resume_epoch=2)
    assert (d2 / "model_4.npz").exists()
    # resumed params start from the snapshot, not fresh init
    from nerf_fusion_tpu.models.io import load_params
    p2 = load_params(d1 / "model_2.npz")
    p4 = load_params(d2 / "model_4.npz")
    d_resumed = float(np.abs(np.asarray(p4["lin0"]["v"])
                             - np.asarray(p2["lin0"]["v"])).mean())
    import jax
    fresh = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (1,)))  # noqa
    assert d_resumed < 0.05  # drifted a little from epoch-2, not re-initialised
