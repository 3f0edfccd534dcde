"""Device-mesh + sharding layout for multi-chip training.

The reference's only multi-device training is ``torch.nn.DataParallel``
around the two tiny nets (trainer/main.py:54,59; SURVEY.md §2.7).  The
TPU-native equivalent is GSPMD over a ``jax.sharding.Mesh``:

  * ``dp`` axis — batch sharding (the DataParallel parity obligation);
    gradients all-reduce over ICI automatically via jit's partitioner;
  * ``tp`` axis — optional tensor sharding of the decoder hidden layers
    (the nets are tiny, so this axis exists to prove out the layout for
    larger decoder configs, e.g. deep-prior variants with width >= 1024).

Placement is declarative: we ``device_put`` params/batches with
NamedShardings and let jit insert the collectives (scaling-book recipe).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, dp: int = None, tp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        # Fall back to the (virtual) CPU backend when the accelerator
        # platform exposes fewer devices than requested — used by the
        # multi-chip dry run under --xla_force_host_platform_device_count.
        devices = jax.devices("cpu")
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    devices = np.asarray(devices[:n])
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) dim over dp, replicate over tp."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_decoder_params(mesh: Mesh, dec_params: dict):
    """Tensor-shard the decoder's square hidden layers over tp.

    Row-parallel weights (out_dim sharded) for lin1; the following layer
    consumes the full activation, so XLA inserts the all-gather on ICI.
    Layers whose dims don't divide the axis stay replicated.
    """
    tp = mesh.shape["tp"]
    out = {}
    for name, layer in dec_params.items():
        new_layer = {}
        for k, v in layer.items():
            spec = P()
            if tp > 1 and v.ndim == 2 and v.shape[0] % tp == 0 and v.shape[0] >= 64:
                spec = P("tp", None)
            elif tp > 1 and v.ndim == 1 and v.shape[0] % tp == 0 and v.shape[0] >= 64:
                spec = P("tp")
            new_layer[k] = jax.device_put(v, NamedSharding(mesh, spec))
        out[name] = new_layer
    return out
