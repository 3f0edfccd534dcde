"""`main.py --load_map`: resume fusion from a saved map (the reference
README's recommended save+reload workflow, README.md:61)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd=REPO):
    # cwd=REPO: the config's training_hypers path is repo-relative
    env = dict(os.environ)
    # hermetic CPU child (see test_flagship_e2e.py: the axon sitecustomize
    # would otherwise route this through the shared TPU tunnel)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env.pop("JAX_PLATFORM_NAME", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "main.py"),
         str(REPO / "configs" / "fusion-synth.yaml"),
         "--exec",
         "sequence_kwargs['width']=160; sequence_kwargs['height']=120; "
         "sequence_kwargs['n_frames']=12; "
         "mapping['latent_capacity']=4096; mapping['alloc_capacity']=2048; "
         "mapping['points_capacity']=4096",
         *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc


@pytest.mark.slow
def test_load_map_resumes_fusion(tmp_path):
    out1 = tmp_path / "run1"
    _run(["--output", str(out1), "--max_frames", "8"])
    map1 = np.load(out1 / "map.npz")
    n1 = int(map1["n_occupied"])
    assert n1 > 0

    out2 = tmp_path / "run2"
    proc = _run(["--output", str(out2), "--max_frames", "6",
                 "--load_map", str(out1 / "map.npz")])
    assert "resumed map" in (proc.stderr + proc.stdout).lower()

    # the resumed run starts FROM the saved voxels and may only grow
    map2 = np.load(out2 / "map.npz")
    assert int(map2["n_occupied"]) >= n1
    stats = json.loads((out2 / "stats.json").read_text())
    assert stats["n_frames"] == 6
    assert (out2 / "mesh.ply").stat().st_size > 0
