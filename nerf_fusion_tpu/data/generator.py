"""Offline LIF dataset generation driver.

Parity with dataset/training/main_generator.py:20-207 (SURVEY.md §3.5):
per mesh — SDF sampling (ops/sdf_sampler), per-voxel LIF splitting with
Chebyshev-radius neighbourhoods, voxel filters (>=50 local + surface
points, 10-90% positive ratio), voxel-local normalisation, npz payload +
source.json output, mesh copies.  Uses a process Pool when nproc > 0.
"""

from __future__ import annotations

import json
import logging
import shutil
from multiprocessing import Manager, Pool, Value
from pathlib import Path

import numpy as np

from ..ops import mesh as M
from ..ops.sdf_sampler import sample_mesh_sdf
from .providers import PROVIDERS

_counter = Value("i", 0)
_bad_counter = Value("i", 0)


def split_lifs(data_arr: np.ndarray, surface_arr: np.ndarray,
               voxel_size: float, nn_size: float = 2.0,
               min_points: int = 50, pos_ratio_range=(0.1, 0.9)):
    """Split SDF samples into per-voxel LIF chunks (main_generator.py:85-135)."""
    from scipy.spatial import cKDTree

    data_xyz = data_arr[:, :3]
    data_sdf = data_arr[:, 3]
    surf_xyz = surface_arr[:, :3]

    centers = np.unique(np.ceil(data_xyz / voxel_size) - 1, axis=0)
    centers = (centers + 0.5) * voxel_size

    r_lif = voxel_size * nn_size / 2.0
    tree_d = cKDTree(data_xyz)
    tree_s = cKDTree(surf_xyz)
    lif_idx = tree_d.query_ball_point(centers, r_lif, p=np.inf)
    loc_idx = tree_d.query_ball_point(centers, voxel_size * 0.5, p=np.inf)
    srf_idx = tree_s.query_ball_point(centers, r_lif, p=np.inf)

    lifs = []
    for c, li, lo, si in zip(centers, lif_idx, loc_idx, srf_idx):
        if len(lo) < min_points or len(si) < min_points:
            continue
        inner = data_sdf[li]
        pos_ratio = np.count_nonzero(inner > 0) / max(len(li), 1)
        if pos_ratio < pos_ratio_range[0] or pos_ratio > pos_ratio_range[1]:
            continue
        vox_min = c - 0.5 * voxel_size
        vox_max = c + 0.5 * voxel_size
        d = data_arr[li].copy()
        s = surface_arr[si].copy()
        d[:, :3] = (d[:, :3] - c) / voxel_size
        s[:, :3] = (s[:, :3] - c) / voxel_size
        d[:, 3] /= voxel_size
        lifs.append({"min": vox_min.astype(np.float32),
                     "max": vox_max.astype(np.float32),
                     "data": d.astype(np.float32),
                     "surface": s.astype(np.float32)})
    return lifs


def generate_samples(idx: int, args, provider, output_base: Path, source_list):
    try:
        item = provider[idx]
    except Exception as e:  # bad mesh: count and skip (main_generator.py:62-74)
        logging.warning("bad mesh %d: %s", idx, e)
        with _bad_counter.get_lock():
            _bad_counter.value += 1
        return
    V, F = item["vertices"], item["faces"]
    mult = item.get("sampler_mult", 1.0)

    rng = np.random.RandomState(idx * 7919 + 13)
    data_arr, surface_arr = sample_mesh_sdf(
        V, F,
        n_samples=int(args.sampler_count * mult * mult),
        var=args.sampler_var,
        perturb_ratio=0.8,
        expand=args.voxel_size * 2.5,
        rng=rng,
        method=int(getattr(args, "sample_method", 1)),
        cameras=item.get("cameras"),
        ortho_half=item.get("ortho_half"))
    data_arr = data_arr * mult
    surface_arr[:, :3] *= mult
    nan_rows = np.any(np.isnan(surface_arr), axis=1)
    surface_arr = surface_arr[~nan_rows]

    lifs = split_lifs(data_arr, surface_arr, args.voxel_size,
                      getattr(args, "nn_size", 2.0))

    with _counter.get_lock():
        mesh_idx = _counter.value
        _counter.value += 1
        lif_ids = []
        for _ in lifs:
            lif_ids.append(len(source_list))
            source_list.append([provider.get_source(idx), mesh_idx,
                               len(lif_ids) - 1])
    if lifs:
        logging.info("%d: +%d LIFs (mean %d pts)", mesh_idx, len(lifs),
                     int(np.mean([len(l["data"]) for l in lifs])))

    M.save_obj(output_base / "mesh" / ("%06d.obj" % mesh_idx), V, F)
    for lid, lif in zip(lif_ids, lifs):
        np.savez(output_base / "payload" / ("%08d.npz" % lid), **lif)
    # Incremental index checkpoint: a killed/crashed run keeps a usable
    # dataset (the reference only writes source.json at the very end).
    # Throttled to every 25th mesh: serializing the Manager list is
    # O(total LIFs) per dump, which at volume scale (~500k LIFs over 600
    # meshes) would otherwise dominate the tail of the run.
    with _counter.get_lock():
        if mesh_idx % 25 == 0:
            with (output_base / "source.json").open("w") as f:
                json.dump(list(source_list), f)
    provider.clean(idx)


def run_generator(args):
    provider = PROVIDERS[args.provider](**args.provider_kwargs)
    output = Path(args.output)
    if output.exists():
        logging.info("Removing old dataset at %s", output)
        shutil.rmtree(output)
    (output / "mesh").mkdir(parents=True)
    (output / "payload").mkdir(parents=True)
    with (output / "config.json").open("w") as f:
        json.dump({k: v for k, v in vars(args).items() if k != "exec"}, f,
                  indent=2, default=str)

    manager = Manager()
    source_list = manager.list()
    if getattr(args, "nproc", 0) > 0:
        import functools
        with Pool(processes=args.nproc) as pool:
            pool.map(functools.partial(generate_samples, args=args,
                                       provider=provider, output_base=output,
                                       source_list=source_list),
                     range(len(provider)))
    else:
        for idx in range(len(provider)):
            generate_samples(idx, args, provider, output, source_list)

    with (output / "source.json").open("w") as f:
        json.dump(list(source_list), f, indent=2)
    logging.info("Done with %d bad shapes", _bad_counter.value)
    return output
