#!/usr/bin/env python3
"""Measure mesher decode precision options: device time of ``fused_extract``
and mesh |SDF| oracle error at HIGH (bf16x3, current default) vs DEFAULT
(one-pass bf16) decoder matmuls.

The mesher only thresholds/interpolates the decoded SDF grids, so one-pass
bf16 may be free accuracy-wise where it matters (the bench gates mesh
|SDF| at 20 mm).  Protocol: device-loop timing (tools/microbench.py).

    python tools/mesh_prec_exp.py [--data output/lrkt_data/lr-kt]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def device_ms(fn, K=8, repeats=4):
    import jax
    import jax.numpy as jnp

    def leaf_contrib(leaf):
        x = jnp.asarray(leaf)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.where(jnp.isfinite(x), x, 0.0)
            return jnp.sum(x).astype(jnp.float32)
        return jnp.sum(x).astype(jnp.float32)

    @jax.jit
    def run(k, eps0):
        def body(_, acc):
            out = fn(acc)
            c = sum(leaf_contrib(l) for l in jax.tree_util.tree_leaves(out))
            return acc + jnp.clip(c * 1e-20, -1e-8, 1e-8)
        return jax.lax.fori_loop(0, k, body, eps0)

    np.asarray(run(1, np.float32(0.0)))

    def timed(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(k, np.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * K) - timed(K)) / K * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fusion-lr-kt-fast.yaml")
    ap.add_argument("--data", default="output/lrkt_data/lr-kt")
    cli = ap.parse_args()

    import json

    import jax
    import jax.numpy as jnp

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system import mesher as mesher_mod
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    repo = Path(__file__).resolve().parent.parent
    args = exp_util.parse_config_yaml(repo / cli.config)
    model, margs = load_model(repo / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    args.run_async = False
    tq = json.loads((Path(cli.data) / "first_tq.json").read_text())
    args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])

    seq = ICLNUIMSequence(path=cli.data, start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    pipe = FusionPipeline(model, args)
    n_warm = 42
    for i in range(n_warm):
        pipe.process_frame(next(seq), i)
    pipe.trajectory()

    vmap = pipe.map
    upd_all = jnp.ones((vmap.cfg.latent_capacity,), bool)
    r = int(args.resolution)
    reeval = max(1024, int(mesher_mod.MESH_CHUNK * (2 * r) ** 3
                           * pipe.mesher.reeval_fraction))

    from nerf_fusion_tpu.data.synth import scene_sdf

    for prec in ("high", "default"):
        ms = device_ms(lambda eps: mesher_mod.fused_extract(
            vmap.state, upd_all, vmap.cfg, vmap.model.decoder_params,
            vmap.model.decoder_config, r, True, pipe.mesher.mesh_budget,
            pipe.mesher.fused_tri_budget, reeval, 0.15 + eps, prec))
        res = mesher_mod.fused_extract(
            vmap.state, upd_all, vmap.cfg, vmap.model.decoder_params,
            vmap.model.decoder_config, r, True, pipe.mesher.mesh_budget,
            pipe.mesher.fused_tri_budget, reeval, 0.15, prec)
        tri = np.asarray(res[0].vertices)
        n = int(np.asarray(res[0].n_triangles))
        verts = tri[:n].reshape(-1, 3)
        err = float(np.mean(np.abs(np.asarray(
            scene_sdf(jnp.asarray(verts))))))
        print(f"precision={prec:8s} fused_extract {ms:7.2f} ms  "
              f"tris={n}  mesh|SDF|={err * 1e3:.2f} mm")


if __name__ == "__main__":
    main()
