"""Device-resident LIF training data: the whole packed pool lives in HBM.

The host sampling path (`LifDataset.sample_batch`) assembles each batch in
numpy and ships ~4.4 MB/step to the device — on a PCIe host that is ~1 ms,
but through a tunneled chip (1-50 MB/s) it bounds the whole trainer.  The
packed pools of a reference-scale LIF set are well under 1 GB (simple set:
0.75 GB; v5e HBM: 16 GB), so the TPU-native layout is: upload the pools
ONCE, then sample+augment every batch inside a jitted device program whose
only host input is the (B,) LIF index vector of the epoch permutation.

Sampling semantics match `LifDataset.sample_batch` (balanced +/- pools,
per-LIF uniform row choice, Y/X/Z/3D rotation augment, surface noise with
normal-cone perturbation — reference lif_dataset.py:27-116) with the same
distributions; the RNG stream is jax.random rather than numpy, so draws
are not bit-identical to the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _rows(arr, off, idxs, r):
    """Gather per-LIF rows: arr (N,C) pool, off (L+1,) offsets, idxs (B,),
    r (B,k) uniform int draws -> (B,k,C) rows (zeros for empty pools)."""
    starts = off[idxs][:, None]
    cnts = (off[idxs + 1] - off[idxs])[:, None]
    pick = r % jnp.maximum(cnts, 1)
    flat = jnp.minimum(starts + pick, max(arr.shape[0] - 1, 0))
    rows = jnp.take(arr, flat.reshape(-1), axis=0, mode="clip")
    rows = rows.reshape(flat.shape[0], flat.shape[1], arr.shape[1])
    return jnp.where(cnts[..., None] == 0, 0.0, rows)


def _axis_rotations(axis, deg):
    """(B,) degrees around a fixed axis -> (B,3,3) rotation matrices."""
    th = jnp.deg2rad(deg)
    c, s = jnp.cos(th), jnp.sin(th)
    a = jnp.asarray(axis, jnp.float32)
    K = jnp.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]],
                  jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    outer = jnp.outer(a, a)
    return (c[:, None, None] * eye + (1 - c)[:, None, None] * outer
            + s[:, None, None] * K)


def _perturb_normal(normals, theta_range, key):
    """Cone-perturb normals (device twin of lif_dataset.perturb_normal)."""
    n = normals
    nx1 = jnp.stack([-n[..., 1], n[..., 0], jnp.zeros_like(n[..., 0])], -1)
    nx2 = jnp.stack([-n[..., 2], jnp.zeros_like(n[..., 0]), n[..., 0]], -1)
    use1 = jnp.abs(jnp.abs(n[..., 2]) - 1.0) > 0.1
    nx = jnp.where(use1[..., None], nx1, nx2)
    nx = nx / jnp.maximum(jnp.linalg.norm(nx, axis=-1, keepdims=True), 1e-12)
    ny = jnp.cross(n, nx)
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, n.shape[:-1] + (1,)) * 2 * jnp.pi
    phi_dir = jnp.cos(phi) * nx + jnp.sin(phi) * ny
    theta = jax.random.uniform(k2, n.shape[:-1] + (1,)) * theta_range
    return jnp.cos(theta) * n + jnp.sin(theta) * phi_dir


@functools.partial(jax.jit, static_argnames=(
    "half", "M", "aug_mode", "noise_sigma", "noise_theta"))
def _sample_batch(pos, pos_off, neg, neg_off, surf, surf_off,
                  idxs, key, half: int, M: int, aug_mode: str,
                  noise_sigma: float, noise_theta: float):
    B = idxs.shape[0]
    kp, kn, ks, kr, krb, kn1, kn2 = jax.random.split(key, 7)
    rp = jax.random.randint(kp, (B, half), 0, 1 << 30)
    rn = jax.random.randint(kn, (B, half), 0, 1 << 30)
    rs = jax.random.randint(ks, (B, M), 0, 1 << 30)
    samples = jnp.concatenate([_rows(pos, pos_off, idxs, rp),
                               _rows(neg, neg_off, idxs, rn)], axis=1)
    sf = _rows(surf, surf_off, idxs, rs)

    if aug_mode is not None:
        u = jax.random.uniform(kr, (B,))
        if aug_mode == "Y":
            base = jax.random.choice(krb, jnp.asarray([0.0, 90.0, 180.0,
                                                       270.0]), (B,))
            R = _axis_rotations([0.0, 1.0, 0.0], base + 30.0 * u)
        elif aug_mode == "X":
            R = _axis_rotations([1.0, 0.0, 0.0], 360.0 * u)
        elif aug_mode == "3D":
            # uniform via QR of gaussians (host path parity)
            g = jax.random.normal(krb, (B, 3, 3))
            q, r_ = jnp.linalg.qr(g)
            det = jnp.linalg.det(q)
            q = q.at[:, :, 0].multiply(jnp.where(det < 0, -1.0, 1.0)[:, None])
            R = q.astype(jnp.float32)
        else:
            R = _axis_rotations([0.0, 0.0, 1.0], 360.0 * u)
        Rt = jnp.swapaxes(R, 1, 2)
        # f32 precision: the default TPU matmul is bf16 and a 0.4%-rel
        # rotation error would leak into the SDF supervision geometry.
        rot = lambda x: jnp.matmul(x, Rt, precision=jax.lax.Precision.HIGHEST)
        samples = samples.at[..., :3].set(rot(samples[..., :3]))
        sf = sf.at[..., :3].set(rot(sf[..., :3]))
        sf = sf.at[..., 3:6].set(rot(sf[..., 3:6]))

    if noise_sigma > 0:
        sf = sf.at[..., :3].add(
            noise_sigma * jax.random.normal(kn1, sf[..., :3].shape))
        sf = sf.at[..., 3:6].set(
            _perturb_normal(sf[..., 3:6], noise_theta, kn2))
    return samples, sf


class DeviceLifDataset:
    """HBM-resident twin of a (single) LifDataset.

    `sample(key, idxs)` returns committed device arrays; the only per-step
    host->device bytes are the (B,) int32 index vector.
    """

    def __init__(self, base, device=None):
        pk = base._ensure_packed()
        put = lambda x, dt: jax.device_put(jnp.asarray(np.asarray(x), dt),
                                           device)
        self.pos = put(pk["pos"], jnp.float32)
        self.neg = put(pk["neg"], jnp.float32)
        self.surf = put(pk["surf"], jnp.float32)
        self.pos_off = put(pk["pos_off"], jnp.int32)
        self.neg_off = put(pk["neg_off"], jnp.int32)
        self.surf_off = put(pk["surf_off"], jnp.int32)
        self.half = int(base.num_sample // 2)
        self.M = int(base.num_surface_sample)
        self.aug_mode = base.augment_rotation
        self.noise_sigma = float(base.augment_noise[0])
        self.noise_theta = float(np.deg2rad(base.augment_noise[1]))
        self.n = len(base)
        self.hbm_bytes = sum(int(np.asarray(x).nbytes) for x in
                             (pk["pos"], pk["neg"], pk["surf"]))

    def __len__(self):
        return self.n

    @staticmethod
    def from_dataset(dataset, device=None):
        """Wrap a LifDataset (or a single-member combined dataset)."""
        if hasattr(dataset, "datasets"):
            if len(dataset.datasets) != 1:
                raise ValueError(
                    "device-resident sampling supports one dataset "
                    f"(got {len(dataset.datasets)}); pools with different "
                    "augment configs cannot share one jitted sampler")
            dataset = dataset.datasets[0]
        if not hasattr(dataset, "_ensure_packed"):
            raise ValueError("dataset has no packed layout")
        return DeviceLifDataset(dataset, device=device)

    def sample(self, key, idxs):
        """(B,) LIF indices -> (sdf (B,S,4), surface (B,M,6)) on device."""
        return _sample_batch(
            self.pos, self.pos_off, self.neg, self.neg_off,
            self.surf, self.surf_off, jnp.asarray(idxs, jnp.int32), key,
            self.half, self.M, self.aug_mode,
            self.noise_sigma, self.noise_theta)
