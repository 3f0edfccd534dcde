"""Online fusion pipeline: glue between sequence, tracker, map and mesher.

Mirrors the reference's per-frame driver loop (main.py:42-102; SURVEY.md
§3.1): depth cut -> track -> (every ``integrate_interval``) transform the
processed cloud by the pose, integrate into the map, re-mesh.  Adds the
per-stage timers and ATE evaluation the reference lacks (SURVEY.md §5.1,
§5.5).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from ..utils.evaluate import ate_rmse, save_tum_trajectory
from ..utils.meters import StageTimer
from .map import SparseVoxelMap
from .mesher import Mesher
from .tracker import SDFTracker


class FusionPipeline:
    def __init__(self, model, args, point_budget: int = None):
        import jax

        map_args = args.mapping
        latent_dim = args.model.code_length
        self.args = args
        # Two-device plan (reference main.py:124-132): tracking+fusion on
        # device 0; background refinement and meshing on device 1 when one
        # exists (aux work overlaps via ICI-copied snapshots).  Disable with
        # config `single_device: true`.
        devs = jax.devices()
        aux = (devs[1] if len(devs) > 1
               and not bool(getattr(args, "single_device", False)) else None)
        self.aux_device = aux
        self.map = SparseVoxelMap(model, map_args, latent_dim, aux_device=aux)
        # Triangle budget: reference main.py:93 drives int(4e6); configs may
        # override via max_n_triangles.
        # "Fast" (coarse eval + upsample + near-surface re-eval) is the
        # reference's speed mode (map.py:656-683).  On TPU the select +
        # scatter machinery costs MORE than decoding every sample outright
        # (measured per 512-voxel chunk at r=4: full 2.34 ms vs fast 2.67),
        # so the exact full decode is the default; `mesh_fast: true`
        # restores the reference behaviour.  The mode lives on the Mesher
        # so EVERY extraction (cadence, final, direct callers) uses it.
        self.mesh_fast = bool(getattr(args, "mesh_fast", False))
        self.mesher = Mesher(self.map, max_n_triangles=int(
            getattr(args, "max_n_triangles", 4e6)), device=aux,
            mesh_batch_budget=int(getattr(args, "mesh_batch_budget", 4096)),
            decode_precision=str(
                getattr(args, "mesh_decode_precision", "high")),
            mesh_fast=self.mesh_fast,
            reuse_latent_eps=float(
                getattr(args, "mesh_reuse_latent_eps", 0.0)))
        budget = point_budget or int(getattr(map_args, "points_capacity", 16384))
        self.tracker = SDFTracker(self.map, args.tracking, point_budget=budget)
        self.timer = StageTimer()
        self.poses = []
        # per-call stage prints for perf forensics (tunnel walls vary 10x,
        # so aggregate means hide which CALL was slow)
        self.verbose_timing = bool(getattr(args, "verbose_timing", False))
        # Tracking-only frames per device dispatch (1 = one program per
        # frame).  K>1 buffers non-keyframe frames and scans them through
        # ONE fused_frame_block program — the dispatch/H2D amortization for
        # thin-link hosts; cadence (integrate/mesh) frames always flush the
        # buffer first and run per-frame.  With the 20-frame default
        # cadence, K=19 makes every block full-sized (no extra programs).
        self.frames_per_call = int(getattr(args, "frames_per_call", 1))
        self._frame_buf = []

    def flush_frames(self):
        """Track any buffered frames (``frames_per_call`` > 1) now.

        Full K-sized buffers go through ONE ``fused_frame_block`` dispatch;
        a partial buffer (tail of a run, or a cadence arriving early) falls
        back to the already-compiled per-frame program rather than
        compiling a second block shape."""
        buf, self._frame_buf = self._frame_buf, []
        if not buf:
            return
        import jax.numpy as jnp

        depth_cut = (self.args.depth_cut_min, self.args.depth_cut_max)
        self.timer.start("track")
        if len(buf) == self.frames_per_call:
            def stack(arrs):
                if isinstance(arrs[0], np.ndarray):
                    return jnp.asarray(np.stack(arrs))
                return jnp.stack(arrs)

            pose = self.tracker.track_camera_block(
                stack([f.rgb for f in buf]), stack([f.depth for f in buf]),
                buf[0].calib, depth_cut=depth_cut)
            self.poses.append(pose)
        else:
            for f in buf:
                pose = self.tracker.track_camera(f.rgb, f.depth, f.calib,
                                                 depth_cut=depth_cut)
                self.poses.append(pose)
        self.timer.stop("track")

    def process_frame(self, frame, frame_id: int, use_gt_pose: bool = False):
        """One frame through the pipeline. Sync-free: the returned pose is a
        device (R, t) tuple; use ``trajectory()`` to materialise poses.

        With ``frames_per_call`` > 1, tracking-only frames are buffered and
        returned as None; they dispatch in one scanned program when the
        buffer fills or the next integrate/mesh cadence frame arrives
        (``flush_frames``)."""
        is_cadence = (frame_id % self.args.integrate_interval == 0
                      or frame_id % self.args.meshing_interval == 0)
        needs_set_pose = frame_id == 0 or use_gt_pose
        if self.frames_per_call > 1 and not is_cadence and not needs_set_pose:
            self._frame_buf.append(frame)
            if len(self._frame_buf) == self.frames_per_call:
                self.flush_frames()
            return None
        self.flush_frames()
        depth_cut = (self.args.depth_cut_min, self.args.depth_cut_max)
        set_pose = None
        if frame_id == 0:
            set_pose = frame.gt_pose if (use_gt_pose and frame.gt_pose is not None) \
                else getattr(self.args, "first_iso", None) or frame.gt_pose
        elif use_gt_pose:
            set_pose = frame.gt_pose

        self.timer.start("track")
        pose = self.tracker.track_camera(frame.rgb, frame.depth, frame.calib,
                                         set_pose=set_pose, depth_cut=depth_cut)
        dt_track = self.timer.stop("track")
        self.poses.append(pose)
        if self.verbose_timing:
            logging.info("frame %d track %.0f ms", frame_id, 1e3 * dt_track)

        if frame_id % self.args.integrate_interval == 0:
            pts, nrm, mask = self.tracker.last_processed_pc
            self.timer.start("integrate")
            self.map.integrate_keyframe(
                pts, nrm, valid=mask, pose=pose,
                do_optimize=bool(getattr(self.args, "do_optimize", False)),
                async_optimize=bool(getattr(self.args, "run_async", False)))
            dt = self.timer.stop("integrate")
            if self.verbose_timing:
                logging.info("frame %d integrate %.0f ms", frame_id, 1e3 * dt)
        if frame_id % self.args.meshing_interval == 0:
            self.timer.start("mesh")
            # Sync mode defers the D2H fetch (materialize=False): the
            # extraction is dispatched in program order but triangles
            # are pulled on the next read, keeping the frame loop free
            # of blocking transfers.
            self.mesher.extract(
                self.args.resolution,
                max_std=getattr(self.args, "max_std", 0.15),
                extract_async=bool(getattr(self.args, "run_async", False)),
                materialize=False)
            dt = self.timer.stop("mesh")
            if self.verbose_timing:
                logging.info("frame %d mesh %.0f ms", frame_id, 1e3 * dt)
        return pose

    def trajectory(self):
        """Materialise the pose chain as host Isometries (one sync point)."""
        return self.tracker.pose_history()

    def write_preview(self, preview_dir, frame_id: int):
        """Online inspection artifacts (the reference's --vis Open3D GUI
        stepped per frame, main.py:136-155; headless equivalent: periodic
        mesh/trajectory/voxel-block snapshots viewable in MeshLab).
        Costs a mesh drain D2H per call — gated behind --vis."""
        from ..utils import vis as vis_util
        from ..utils.evaluate import save_tum_trajectory

        preview_dir = Path(preview_dir)
        preview_dir.mkdir(parents=True, exist_ok=True)
        self.mesher.save_ply(preview_dir / f"mesh_{frame_id:05d}.ply")
        save_tum_trajectory(preview_dir / f"trajectory_{frame_id:05d}.txt",
                            self.trajectory())
        blocks = self.map.get_fast_preview_visuals()[0]
        vis_util.save_lineset_ply(
            preview_dir / f"blocks_{frame_id:05d}.ply", blocks)

    def run(self, sequence, use_gt_pose: bool = False, max_frames: int = None,
            output_dir=None):
        n = len(sequence) if max_frames is None else min(max_frames, len(sequence))
        vis_on = bool(getattr(self.args, "vis", False)) and output_dir is not None
        vis_interval = int(getattr(self.args, "vis_interval",
                                   self.args.meshing_interval))
        for i in range(n):
            frame = next(sequence)
            logging.info("Frame ID = %d", i)
            self.process_frame(frame, i, use_gt_pose=use_gt_pose)
            if vis_on and i % vis_interval == 0 and i > 0:
                with self.timer.scope("vis_preview"):
                    self.write_preview(Path(output_dir) / "preview", i)
        self.flush_frames()
        # final full-quality mesh (separate stage: it materialises + drains
        # deferred batches, so lumping it into the cadence "mesh" stat hides
        # where the time goes)
        with self.timer.scope("final_mesh"):
            self.mesher.extract(self.args.resolution,
                                max_std=getattr(self.args, "max_std", 0.15))
        poses = self.trajectory()
        results = {"n_frames": n, "timing": self.timer.summary()}
        if self.tracker.drop_fracs:
            import jax
            # entries are () scalars (per-frame path) or (K,) vectors
            # (block path) — flatten to one per-frame array
            drops = np.concatenate([np.atleast_1d(d) for d in
                                    jax.device_get(self.tracker.drop_fracs)])
            results["box_filter_drop_frac"] = {
                "mean": float(drops.mean()), "max": float(drops.max())}
            if drops.max() > 0.05:
                logging.warning(
                    "box-filter hash-collision drop rate peaked at %.1f%% "
                    "(>5%%): raise imgproc.box_filter_points table_bits",
                    100 * drops.max())
        if sequence.gt_trajectory is not None and not use_gt_pose:
            results["ate_rmse"] = ate_rmse(poses, sequence.gt_trajectory[:n])
        # Mesh-quality metric (BASELINE.md:32 parity): sequences exposing a
        # ground-truth SDF (the synthetic scene) get an exact mean-|SDF|
        # reconstruction error at the mesh vertices.
        gt_sdf = getattr(sequence, "scene_sdf", None)
        if gt_sdf is not None:
            from ..utils.evaluate import mesh_abs_sdf_error
            err = mesh_abs_sdf_error(self.mesher.current_mesh(), gt_sdf)
            if not np.isnan(err):
                results["mesh_abs_sdf"] = err
        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            save_tum_trajectory(output_dir / "trajectory.txt", poses)
            self.mesher.save_ply(output_dir / "mesh.ply")
            self.map.save(output_dir / "map.npz")
            with (output_dir / "stats.json").open("w") as f:
                json.dump(results, f, indent=2)
        return results
