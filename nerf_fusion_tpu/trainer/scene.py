"""Per-scene training: fit the encoder/decoder prior from an RGB-D sequence.

The reference fork gestures at this capability (yc_trainer.py +
ScannetSequence + configs/train_scannet.yaml) but its trainer references
undefined variables and cannot run (SURVEY.md §2.4/§7.4).  This is the
working equivalent:

  1. stream keyframes from any RGBDSequence with (GT or tracked) poses;
  2. preprocess each frame on device (frontend) into oriented world-space
     surface points;
  3. harvest LIF training pairs: SDF query points are surface points
     jittered along their normals (the jitter is the SDF target — the same
     supervision the reference's latent-refinement stage uses,
     system/map.py:476-494), split per voxel with the offline generator's
     Chebyshev bucketing and quality filters;
  4. train with the standard joint trainer on the in-memory dataset.

This turns any recorded sequence into a scene-specialised prior without
ShapeNet — the capability configs/train_scannet.yaml describes.
"""

from __future__ import annotations

import logging

import numpy as np

from ..data.generator import split_lifs
from ..data.lif_dataset import LifDataset
from ..system.frontend import preprocess_frame
from . import train as trainer_mod


class MemoryLifDataset(LifDataset):
    """LifDataset over in-memory payload dicts (no files)."""

    def __init__(self, payloads, num_sample, num_surface_sample=128,
                 augment_rotation=None, augment_noise=(0.0, 0.0), seed=0):
        self.payloads = payloads
        self.data_path = None       # in-memory: sample_batch packs in RAM
        self.data_sources = list(range(len(payloads)))
        self.num_sample = num_sample
        self.num_surface_sample = num_surface_sample
        self.augment_rotation = augment_rotation
        self.augment_noise = augment_noise
        self.rng = np.random.RandomState(seed)
        self._cache = None

    def get_raw_data(self, idx):
        return self.payloads[idx]


def harvest_scene_lifs(sequence, args, max_frames=None, frame_stride=5,
                       point_budget=32768, jitter=0.3, seed=0):
    """Stream a sequence -> in-memory LIF payloads."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    voxel = float(args.mapping["voxel_size"] if isinstance(args.mapping, dict)
                  else args.mapping.voxel_size)
    depth_cut = (getattr(args, "depth_cut_min", 0.5),
                 getattr(args, "depth_cut_max", 5.0))
    # frontend metric thresholds (reference VGA defaults; a coarse-pitch
    # sensor overrides via a top-level or tracking `preprocess:` block)
    pre = (getattr(args, "preprocess", None)
           or (args.tracking.get("preprocess")
               if isinstance(getattr(args, "tracking", None), dict) else None)
           or {})
    if not isinstance(pre, dict):
        pre = vars(pre)
    pre_kw = {k: pre[k] for k in ("outlier_radius", "outlier_min_nb",
                                  "normal_radius", "normal_min_nb",
                                  "box_filter_size") if k in pre}
    pre_kw = {k: (int(v) if k.endswith("_nb") else float(v))
              for k, v in pre_kw.items()}
    all_pts, all_nrm = [], []
    n = len(sequence) if max_frames is None else min(max_frames, len(sequence))
    for i in range(n):
        frame = next(sequence)
        if i % frame_stride != 0:
            continue
        pose = frame.gt_pose
        if pose is None:
            raise ValueError("per-scene training needs sequence poses (load_gt)")
        pre = preprocess_frame(jnp.asarray(frame.rgb), jnp.asarray(frame.depth),
                               frame.calib.fx, frame.calib.fy,
                               frame.calib.cx, frame.calib.cy,
                               depth_cut[0], depth_cut[1], point_budget,
                               depth_scale=float(
                                   getattr(frame.calib, "dscale", 1.0)),
                               **pre_kw)
        mask = np.asarray(pre.mask)
        pts = np.asarray(pre.points)[mask]
        nrm = np.asarray(pre.normals)[mask]
        R = pose.q.rotation_matrix
        all_pts.append(pts @ R.T + pose.t)
        all_nrm.append(nrm @ R.T)
    pts = np.concatenate(all_pts).astype(np.float32)
    nrm = np.concatenate(all_nrm).astype(np.float32)
    logging.info("scene harvest: %d surface points from %d keyframes",
                 len(pts), len(all_pts))

    # SDF queries: jitter along normals at two scales; jitter == target SDF.
    reps = 4
    base = np.repeat(pts, reps, axis=0)
    base_n = np.repeat(nrm, reps, axis=0)
    scale = np.where(rng.rand(len(base), 1) < 0.5, jitter * voxel,
                     jitter * voxel / 5.0)
    s = rng.randn(len(base), 1) * scale
    data_arr = np.concatenate([base + s * base_n, s], axis=1).astype(np.float32)
    surface_arr = np.concatenate([pts, nrm], axis=1).astype(np.float32)
    return split_lifs(data_arr, surface_arr, voxel)


def train_scene(args, sequence, max_frames=None, max_steps_per_epoch=None,
                mesh=None):
    """Harvest a sequence and run the joint trainer on it."""
    payloads = harvest_scene_lifs(sequence, args, max_frames=max_frames)
    logging.info("scene harvest: %d LIF voxels", len(payloads))
    if not payloads:
        raise RuntimeError("no LIFs harvested — check depth range / poses")
    train_spec = (args.train_set[0] if getattr(args, "train_set", None)
                  else {})
    dataset = MemoryLifDataset(
        payloads, num_sample=args.samples_per_lif,
        num_surface_sample=int(train_spec.get("num_surface_sample", 128)),
        augment_rotation=train_spec.get("augment_rotation"),
        augment_noise=tuple(train_spec.get("augment_noise", (0.0, 0.0))))

    return trainer_mod.train(args, max_steps_per_epoch=max_steps_per_epoch,
                             mesh=mesh, dataset=dataset)
