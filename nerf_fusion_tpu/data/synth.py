"""Synthetic RGB-D sequence: sphere-traced analytic SDF scene.

The reference can only run on recorded datasets; this sequence renders a
procedurally-textured room (floor, walls, sphere, box) with a known smooth
trajectory so the ENTIRE pipeline — tracking, fusion, meshing, ATE/chamfer
evaluation — runs and benchmarks hermetically on any host (BASELINE.json
configs can't assume ICL-NUIM is on disk).  Rendering is one jitted
sphere-tracing program per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.se3 import Isometry
from .base import FrameData, FrameIntrinsic, RGBDSequence


def scene_sdf(p):
    """Analytic room SDF. p: (..., 3) world points (y up)."""
    floor = p[..., 1]
    wall_z = p[..., 2] + 2.2
    wall_x = p[..., 0] + 2.2
    sph = jnp.linalg.norm(p - jnp.asarray([0.3, 0.6, 0.2]), axis=-1) - 0.6
    q = jnp.abs(p - jnp.asarray([1.3, 0.4, -1.0])) - jnp.asarray([0.4, 0.4, 0.35])
    box = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) \
        + jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return jnp.minimum(jnp.minimum(jnp.minimum(floor, wall_z),
                                   jnp.minimum(wall_x, sph)), box)


def _box_sdf(p, center, half):
    q = jnp.abs(p - jnp.asarray(center)) - jnp.asarray(half)
    return jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) \
        + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def scene_sdf_large(p):
    """ScanNet-scale analytic scene: an 8x8 m two-room apartment (y up).

    Outer walls on all four sides, a dividing wall at z=0 with a 1.6 m
    doorway, and furniture-scale objects in both rooms.  ~10x the surface
    area of the small room — drives the "large voxel count" workload of
    BASELINE.json config #5 with the same exact-SDF mesh oracle.
    """
    floor = p[..., 1]
    walls = jnp.minimum(
        jnp.minimum(p[..., 0] + 4.0, 4.0 - p[..., 0]),
        jnp.minimum(p[..., 2] + 4.0, 4.0 - p[..., 2]))
    div_a = _box_sdf(p, [-2.4, 1.3, 0.0], [1.6, 1.3, 0.08])
    div_b = _box_sdf(p, [2.4, 1.3, 0.0], [1.6, 1.3, 0.08])
    # room A (z < 0)
    sph_a = jnp.linalg.norm(p - jnp.asarray([-2.0, 0.6, -2.0]), axis=-1) - 0.6
    box_a = _box_sdf(p, [2.0, 0.4, -2.4], [0.45, 0.4, 0.35])
    tab_a = _box_sdf(p, [0.2, 0.35, -3.2], [0.8, 0.35, 0.4])
    # room B (z > 0)
    sph_b = jnp.linalg.norm(p - jnp.asarray([2.2, 0.5, 2.4]), axis=-1) - 0.5
    box_b = _box_sdf(p, [-2.2, 0.5, 2.2], [0.5, 0.5, 0.5])
    dxz = jnp.stack([jnp.linalg.norm(
        p[..., ::2] - jnp.asarray([0.4, 3.1]), axis=-1) - 0.45,
        jnp.abs(p[..., 1] - 0.55) - 0.55], -1)
    cyl_b = jnp.minimum(jnp.max(dxz, axis=-1), 0.0) \
        + jnp.linalg.norm(jnp.maximum(dxz, 0.0), axis=-1)
    out = floor
    for s in (walls, div_a, div_b, sph_a, box_a, tab_a, sph_b, box_b, cyl_b):
        out = jnp.minimum(out, s)
    return out


SCENES = {"room": scene_sdf, "large": scene_sdf_large}


def _albedo(p):
    """Procedural texture giving the photometric term real gradients."""
    checker = (jnp.floor(p[..., 0] * 3) + jnp.floor(p[..., 2] * 3)) % 2
    stripes = 0.5 + 0.5 * jnp.sin(7.0 * p[..., 0]) * jnp.sin(5.0 * p[..., 1])
    base = 0.35 + 0.4 * checker[..., None] * jnp.asarray([0.9, 0.6, 0.3]) \
        + 0.25 * stripes[..., None] * jnp.asarray([0.2, 0.5, 0.9])
    return jnp.clip(base, 0.05, 1.0)


@functools.partial(jax.jit, static_argnames=("H", "W", "scene"))
def _render(R, t, fx, fy, cx, cy, H: int, W: int, scene: str = "room"):
    """Sphere-trace one frame. R,t: camera-to-world. Returns (rgb, depth)."""
    scene_sdf = SCENES[scene]
    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    d_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], -1)
    inv_norm = 1.0 / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_cam_n = d_cam * inv_norm
    d_world = jnp.einsum("ij,hwj->hwi", R, d_cam_n)
    origin = t[None, None, :]

    def step(ti, _):
        p = origin + ti[..., None] * d_world
        s = scene_sdf(p)
        return ti + jnp.clip(s, 0.0, 0.4), None

    t_ray = jnp.full((H, W), 0.05)
    t_ray, _ = jax.lax.scan(step, t_ray, None, length=96)
    p_hit = origin + t_ray[..., None] * d_world
    s_final = scene_sdf(p_hit)
    hit = (jnp.abs(s_final) < 5e-3) & (t_ray < 12.0)

    # z-depth (pinhole depth image), not ray length.
    zdepth = t_ray * d_cam_n[..., 2]
    depth = jnp.where(hit, zdepth, jnp.nan)

    eps = 1e-3
    grad = jnp.stack([
        scene_sdf(p_hit + jnp.asarray([eps, 0, 0])) - scene_sdf(p_hit - jnp.asarray([eps, 0, 0])),
        scene_sdf(p_hit + jnp.asarray([0, eps, 0])) - scene_sdf(p_hit - jnp.asarray([0, eps, 0])),
        scene_sdf(p_hit + jnp.asarray([0, 0, eps])) - scene_sdf(p_hit - jnp.asarray([0, 0, eps])),
    ], -1)
    n = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    light = jnp.asarray([0.4, 0.8, 0.45])
    light = light / jnp.linalg.norm(light)
    shade = 0.35 + 0.65 * jnp.maximum(jnp.einsum("hwi,i->hw", n, light), 0.0)
    rgb = _albedo(p_hit) * shade[..., None]
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    return rgb, depth


class SyntheticSequence(RGBDSequence):
    """Jitted sphere-traced RGB-D frames along a smooth orbit trajectory."""

    def __init__(self, n_frames: int = 200, width: int = 640, height: int = 480,
                 radius: float = 1.6, angular_span: float = 1.2,
                 seed: int = 0, load_gt: bool = True, start_frame: int = 0,
                 end_frame: int = -1, scene: str = "room"):
        super().__init__()
        if end_frame == -1:
            end_frame = n_frames
        self.W, self.H = width, height
        self.scene = scene
        f = 481.2 * width / 640.0
        self.calib = FrameIntrinsic(f, f, width / 2.0 - 0.5, height / 2.0 - 0.5, 5000.0)
        poses = []
        if scene == "large":
            # ScanNet-scale walk-through: a figure-eight (Gerono lemniscate)
            # whose crossing point sits in the z=0 doorway, one lobe per
            # room; the camera looks ahead along the path with a slight
            # downward pitch (a hand-held-scanner trajectory).
            for i in range(n_frames):
                th = 2.0 * np.pi * i / max(n_frames - 1, 1)

                def pos(a):
                    return np.array([0.9 * np.sin(2 * a),
                                     1.25 + 0.06 * np.sin(3.1 * a),
                                     2.45 * np.sin(a)])
                cam = pos(th)
                target = pos(th + 0.55)
                target[1] -= 0.45
                poses.append(Isometry.look_at(cam, target,
                                              up=np.array([0.0, -1.0, 0.0])))
        else:
            center = np.array([0.4, 0.5, -0.3])
            for i in range(n_frames):
                a = -0.5 + angular_span * i / max(n_frames - 1, 1)
                cam = center + np.array([radius * np.sin(a) + 0.7,
                                         0.75 + 0.12 * np.sin(2.2 * a),
                                         radius * np.cos(a) + 0.7])
                poses.append(Isometry.look_at(cam, center, up=np.array([0.0, -1.0, 0.0])))
        self.gt_trajectory = poses[start_frame:end_frame] if load_gt else None
        self._poses = poses[start_frame:end_frame]
        self.first_iso = self._poses[0]
        # analytic ground-truth SDF of the rendered scene: consumers
        # (pipeline stats, bench) use it as an exact mesh-quality oracle
        self.scene_sdf = SCENES[scene]

    def __len__(self):
        return len(self._poses)

    def render_frame(self, idx: int) -> FrameData:
        iso = self._poses[idx]
        R = jnp.asarray(iso.q.rotation_matrix, jnp.float32)
        t = jnp.asarray(iso.t, jnp.float32)
        rgb, depth = _render(R, t, self.calib.fx, self.calib.fy,
                             self.calib.cx, self.calib.cy, self.H, self.W,
                             self.scene)
        frame = FrameData()
        # Keep frames on device: the consumer (preprocess_frame) is jitted,
        # so a host round-trip would only add tunnel H2D/D2H traffic.
        frame.rgb = rgb
        frame.depth = depth
        frame.gt_pose = iso if self.gt_trajectory is not None else None
        frame.calib = self.calib
        return frame

    def __next__(self) -> FrameData:
        if self.frame_id >= len(self):
            raise StopIteration
        frame = self.render_frame(self.frame_id)
        self.frame_id += 1
        return frame
