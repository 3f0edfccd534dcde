"""Multi-host (multi-process) path: 2 jax.distributed CPU processes run one
dp train step through parallel/distributed.py (maybe_initialize /
global_mesh / shard_host_batch) and must agree with each other AND with a
single-process run over the same global batch (VERDICT r2 item 5).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single(tmp_path):
    nproc, local_dev = 2, 2
    port = _free_port()
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={local_dev}",
               JAX_COMPILATION_CACHE_DIR="")
    env.pop("JAX_PLATFORM_NAME", None)
    outs = [tmp_path / f"w{i}.npz" for i in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "_distributed_worker.py"),
         str(i), str(nproc), str(port), str(outs[i])],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(nproc)]
    for p, out in zip(procs, outs):
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{so[-2000:]}\n{se[-4000:]}"
        assert out.exists()

    w0 = np.load(outs[0])
    w1 = np.load(outs[1])
    # both processes hold identical replicated post-step parameters
    assert set(w0.files) == set(w1.files)
    for k in w0.files:
        np.testing.assert_allclose(w0[k], w1[k], rtol=1e-6, atol=1e-7)

    # single-process reference over the same global batch
    from tests._train_step_fixture import build_tiny_step, make_batch

    step, params0 = build_tiny_step()
    sdf, surf = make_batch()
    import jax

    new_params, loss = step(params0, sdf, surf)
    flat, _ = jax.tree_util.tree_flatten(new_params)
    assert abs(float(loss) - float(w0["loss"])) < 1e-4
    for i, x in enumerate(flat):
        np.testing.assert_allclose(w0[f"p{i}"], np.asarray(x),
                                   rtol=1e-4, atol=1e-5)
