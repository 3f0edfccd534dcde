"""Two-device system pipeline (reference aux-GPU plan, main.py:124-132).

On the virtual 8-CPU mesh, device 1 hosts background latent refinement and
meshing (snapshots copied device-to-device); results must match the
single-device pipeline exactly (same programs, same platform).
"""

from pathlib import Path

import numpy as np
import pytest

import jax

from nerf_fusion_tpu.data.synth import SyntheticSequence
from nerf_fusion_tpu.models.io import load_model
from nerf_fusion_tpu.system.pipeline import FusionPipeline
from nerf_fusion_tpu.system.refine import AsyncRefiner, refine_latents
from nerf_fusion_tpu.utils.config import dict_to_args, parse_config_yaml

REPO = Path(__file__).resolve().parent.parent


def _make_args(single_device: bool):
    args = parse_config_yaml(REPO / "configs" / "fusion-synth.yaml")
    model, margs = load_model(REPO / args.training_hypers, 300)
    args.model = margs
    args.mapping = dict_to_args(args.mapping)
    args.mapping.latent_capacity = 8192
    args.tracking = dict_to_args(args.tracking)
    args.integrate_interval = 3
    args.meshing_interval = 3
    args.max_n_triangles = 1 << 15
    args.single_device = single_device
    return model, args


def _run(single_device: bool, n_frames=7, w=320, h=240):
    model, args = _make_args(single_device)
    seq = SyntheticSequence(n_frames=n_frames, width=w, height=h)
    pipe = FusionPipeline(model, args, point_budget=8192)
    for i in range(n_frames):
        frame = next(seq)          # synth calib is already width-scaled
        pipe.process_frame(frame, i)
    mesh = pipe.mesher.extract(4, max_std=0.3)
    return pipe, np.stack([p.matrix for p in pipe.trajectory()]), mesh


@pytest.mark.slow
def test_two_device_pipeline_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    pipe2, traj2, mesh2 = _run(single_device=False)
    assert pipe2.aux_device is not None
    assert pipe2.aux_device == jax.devices()[1]
    pipe1, traj1, mesh1 = _run(single_device=True)
    assert pipe1.aux_device is None
    np.testing.assert_allclose(traj2, traj1, atol=1e-6)
    # non-vacuous: an earlier version double-scaled the synthetic calib
    # (synth frames already carry width-scaled intrinsics), which made the
    # outlier gate reject everything and compared two EMPTY meshes
    assert len(mesh1) > 0
    assert mesh1.shape == mesh2.shape
    np.testing.assert_allclose(np.sort(mesh2.reshape(-1)),
                               np.sort(mesh1.reshape(-1)), atol=1e-5)


def test_refine_on_aux_device_matches_main():
    """refine_latents dispatched on device 1 == the same program on device 0."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    model, args = _make_args(True)
    from nerf_fusion_tpu.system.map import SparseVoxelMap
    vmap = SparseVoxelMap(model, args.mapping, args.model.code_length)
    rng = np.random.RandomState(0)
    n = 4000
    pts = np.stack([rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n),
                    np.full(n, 0.05)], axis=1).astype(np.float32)
    nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    for _ in range(3):   # push obs_count over encoder_count_th eligibility
        vmap.integrate_keyframe(pts, nrm)
    vmap.cfg = vmap.cfg._replace(encoder_count_th=2.0)

    key = jax.random.PRNGKey(7)
    valid = np.ones((n,), bool)
    res0 = refine_latents(vmap.state, vmap.cfg, model.decoder_params,
                          model.decoder_config, pts, nrm, valid, key,
                          n_iters=4)
    assert bool(res0.refined.any()), "test setup: no eligible voxels"

    ref = AsyncRefiner(device=jax.devices()[1])
    ref.dispatch(vmap.state, vmap.cfg, model.decoder_params,
                 model.decoder_config, pts, nrm, valid, key, n_iters=4)
    import time
    for _ in range(600):
        res1 = ref.collect(device=jax.devices()[0])
        if res1 is not None:
            break
        time.sleep(0.05)
    assert res1 is not None
    assert res1.latents.devices() == {jax.devices()[0]}
    np.testing.assert_allclose(np.asarray(res1.latents),
                               np.asarray(res0.latents), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res1.refined),
                                  np.asarray(res0.refined))
