"""Worker process for tests/test_distributed.py: one of N jax.distributed
processes running a single dp train step over the global mesh.

argv: <process_id> <num_processes> <coordinator_port> <out_npz>
Env (set by the parent): JAX_PLATFORMS=cpu, PALLAS_AXON_POOL_IPS=,
XLA_FLAGS=--xla_force_host_platform_device_count=<local_devices>.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    from nerf_fusion_tpu.parallel.distributed import (global_mesh,
                                                      maybe_initialize,
                                                      shard_host_batch)

    ok = maybe_initialize(coordinator_address=f"localhost:{port}",
                          num_processes=nproc, process_id=pid)
    assert ok, "maybe_initialize must initialise in explicit-args mode"

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == nproc
    mesh = global_mesh(tp=1)

    from tests._train_step_fixture import build_tiny_step, make_batch

    step, params0 = build_tiny_step()
    sdf, surf = make_batch()                        # GLOBAL batch
    B = sdf.shape[0]
    per = B // nproc                                # this host's slice
    local = (sdf[pid * per:(pid + 1) * per], surf[pid * per:(pid + 1) * per])
    gsdf, gsurf = shard_host_batch(mesh, local)
    assert gsdf.shape[0] == B                       # logically global

    from nerf_fusion_tpu.parallel.mesh import replicate

    params = replicate(mesh, params0)
    new_params, loss = step(params, gsdf, gsurf)
    flat, _ = jax.tree_util.tree_flatten(new_params)
    # fully-addressable after replication? dp-sharded grads all-reduce into
    # replicated params, so each host can fetch its local copy
    host = [np.asarray(jax.device_get(
        x.addressable_shards[0].data)) for x in flat]
    np.savez(out, loss=float(loss), **{f"p{i}": a for i, a in enumerate(host)})
    print(f"worker {pid}: loss={float(loss):.6f}")


if __name__ == "__main__":
    main()
