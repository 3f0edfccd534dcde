"""Multi-host (DCN) training scale-out helpers.

The reference is strictly single-node (SURVEY.md §2.7/§5.8: no
torch.distributed anywhere); the TPU-native scale-out path is
``jax.distributed`` + a global mesh whose inner axis rides ICI within each
slice and whose outer axis crosses hosts over DCN.  Single-host callers
can ignore this module entirely — ``maybe_initialize`` is a no-op unless
the standard TPU pod environment variables (or explicit arguments) are
present.

Usage (one process per host, e.g. under a pod launcher):

    from nerf_fusion_tpu.parallel.distributed import maybe_initialize, global_mesh
    maybe_initialize()                       # no-op on single host
    mesh = global_mesh(tp=1)                 # dp = all chips across hosts
    train(args, mesh=mesh)

Gradients all-reduce over ICI within a slice and DCN across slices —
inserted automatically by jit's partitioner from the batch sharding
(the tiny DI-Fusion nets are far below DCN bandwidth limits).
"""

from __future__ import annotations

import logging
import os

import jax

from .mesh import make_mesh


def maybe_initialize(coordinator_address: str = None, num_processes: int = None,
                     process_id: int = None) -> bool:
    """Initialise jax.distributed when running multi-process; else no-op.

    :return: True if distributed runtime was initialised.
    """
    env_ok = (coordinator_address is not None
              or os.environ.get("COORDINATOR_ADDRESS")
              or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not env_ok and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed: process %d / %d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return True


def global_mesh(tp: int = 1):
    """dp x tp mesh over ALL global devices (ICI within host, DCN across)."""
    return make_mesh(n_devices=jax.device_count(), tp=tp)


def shard_host_batch(mesh, batch):
    """Place each host's local batch shard into the global dp sharding.

    For multi-host data loading: every process loads only its slice of the
    global batch; ``jax.make_array_from_process_local_data`` assembles the
    logically-global array.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        sharding = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
