"""Pixel-aligned image encoders (pixelNeRF-style family).

Capability parity with the fork's ``trainer/img_encoder.py`` (SURVEY.md
§2.4 — present there but never functional in the pipeline):

  * ``SpatialEncoder``  — multi-stage conv backbone whose stage feature maps
    are bilinearly upsampled to the first stage's resolution and
    concatenated; ``index(latent, uv)`` samples pixel-aligned features.
  * ``ImageEncoder``    — global feature: conv stages + global average pool
    + linear head.
  * ``ConvEncoder``     — small encoder-decoder returning per-pixel features.

Implemented as pure-JAX param pytrees like the rest of the model zoo
(NCHW conv layout, group-norm instead of BN so no running state is
needed).  The reference initialises from torchvision-pretrained ResNets;
offline we initialise randomly — ``import_torch_backbone`` can convert a
torch state dict when one is available.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_init(key, c_in, c_out, k):
    fan_in = c_in * k * k
    bound = math.sqrt(1.0 / fan_in)
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (c_out, c_in, k, k), minval=-bound, maxval=bound)
    b = jax.random.uniform(bk, (c_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def conv2d(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def group_norm(x, groups=8, eps=1e-5):
    N, C, H, W = x.shape
    g = math.gcd(groups, C)
    xr = x.reshape(N, g, C // g, H, W)
    mean = xr.mean(axis=(2, 3, 4), keepdims=True)
    var = xr.var(axis=(2, 3, 4), keepdims=True)
    return ((xr - mean) * jax.lax.rsqrt(var + eps)).reshape(N, C, H, W)


@functools.lru_cache(maxsize=None)
def _align_corners_matrix(n_in: int, n_out: int):
    """1-D align_corners=True bilinear resample as an (n_out, n_in) matrix.

    The reference upsamples latents with ``F.interpolate(...,
    align_corners=True)`` (/root/reference/trainer/img_encoder.py:221,238,
    267-270); jax.image.resize only offers the half-pixel convention, which
    diverges everywhere off the sample grid (~6% of range measured), so the
    resample is built explicitly (and becomes constant-matrix MXU work).
    """
    import numpy as np
    W = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        W[:, 0] = 1.0
        return W
    j = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(j).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    f = (j - lo).astype(np.float32)
    W[np.arange(n_out), lo] += 1.0 - f
    W[np.arange(n_out), hi] += f
    return W


def _resize_bilinear(x, h, w):
    """(N,C,H,W) -> (N,C,h,w) bilinear with align_corners=True semantics."""
    Wh = jnp.asarray(_align_corners_matrix(x.shape[2], h))
    Ww = jnp.asarray(_align_corners_matrix(x.shape[3], w))
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("hH,ncHW->nchW", Wh, x, precision=hi)
    return jnp.einsum("wW,nchW->nchw", Ww, y, precision=hi)


class SpatialEncoderConfig(NamedTuple):
    channels: tuple = (64, 128, 256, 512)
    latent_size: int = 960          # concat of stage channels (64+128+256+512)
    in_channels: int = 3


def init_spatial_encoder(key, cfg: SpatialEncoderConfig = SpatialEncoderConfig()):
    params = {}
    keys = jax.random.split(key, 2 * len(cfg.channels) + 1)
    c_prev = cfg.in_channels
    params["stem"] = _conv_init(keys[0], c_prev, cfg.channels[0], 7)
    c_prev = cfg.channels[0]
    for i, c in enumerate(cfg.channels):
        params[f"conv{i}a"] = _conv_init(keys[2 * i + 1], c_prev, c, 3)
        params[f"conv{i}b"] = _conv_init(keys[2 * i + 2], c, c, 3)
        c_prev = c
    return params


def apply_spatial_encoder(params, cfg: SpatialEncoderConfig, images):
    """(B, 3, H, W) -> (B, sum(channels), H/2, W/2) pixel-aligned latent."""
    x = conv2d(params["stem"], images, stride=2)
    x = jax.nn.relu(group_norm(x))
    feats = []
    for i in range(len(cfg.channels)):
        stride = 1 if i == 0 else 2
        x = conv2d(params[f"conv{i}a"], x, stride=stride)
        x = jax.nn.relu(group_norm(x))
        x = conv2d(params[f"conv{i}b"], x)
        x = jax.nn.relu(group_norm(x))
        feats.append(x)
    h, w = feats[0].shape[2], feats[0].shape[3]
    up = [feats[0]] + [_resize_bilinear(f, h, w) for f in feats[1:]]
    return jnp.concatenate(up, axis=1)


def index_features(latent, uv, image_hw):
    """Pixel-aligned bilinear lookup (img_encoder ``index`` semantics).

    :param latent: (B, C, h, w) feature maps.
    :param uv: (B, N, 2) pixel coords in the ORIGINAL image frame.
    :param image_hw: (H, W) of the original image.
    :return: (B, C, N) sampled features.
    """
    B, C, h, w = latent.shape
    H, W = image_hw
    x = uv[..., 0] * (w - 1) / (W - 1)
    y = uv[..., 1] * (h - 1) / (H - 1)

    def sample_one(feat, xx, yy):
        coords = jnp.stack([jnp.broadcast_to(jnp.arange(C)[:, None], (C, xx.shape[0])),
                            jnp.broadcast_to(yy[None], (C, xx.shape[0])),
                            jnp.broadcast_to(xx[None], (C, xx.shape[0]))])
        return jax.scipy.ndimage.map_coordinates(feat, list(coords), order=1,
                                                 mode="nearest")

    return jax.vmap(sample_one)(latent, x, y)


class ImageEncoderConfig(NamedTuple):
    channels: tuple = (32, 64, 128, 256)
    latent_size: int = 128
    in_channels: int = 3


def init_image_encoder(key, cfg: ImageEncoderConfig = ImageEncoderConfig()):
    params = {}
    keys = jax.random.split(key, len(cfg.channels) + 1)
    c_prev = cfg.in_channels
    for i, c in enumerate(cfg.channels):
        params[f"conv{i}"] = _conv_init(keys[i], c_prev, c, 3)
        c_prev = c
    bound = math.sqrt(1.0 / c_prev)
    wk, bk = jax.random.split(keys[-1])
    params["fc"] = {
        "w": jax.random.uniform(wk, (cfg.latent_size, c_prev), minval=-bound, maxval=bound),
        "b": jax.random.uniform(bk, (cfg.latent_size,), minval=-bound, maxval=bound),
    }
    return params


def apply_image_encoder(params, cfg: ImageEncoderConfig, images):
    """(B, 3, H, W) -> (B, latent_size) global feature."""
    x = images
    for i in range(len(cfg.channels)):
        x = conv2d(params[f"conv{i}"], x, stride=2)
        x = jax.nn.relu(group_norm(x))
    pooled = x.mean(axis=(2, 3))
    return pooled @ params["fc"]["w"].T + params["fc"]["b"]


class ConvEncoderConfig(NamedTuple):
    channels: tuple = (32, 64, 128)
    out_channels: int = 32
    in_channels: int = 3


def init_conv_encoder(key, cfg: ConvEncoderConfig = ConvEncoderConfig()):
    params = {}
    n = len(cfg.channels)
    keys = jax.random.split(key, 2 * n + 1)
    c_prev = cfg.in_channels
    for i, c in enumerate(cfg.channels):
        params[f"down{i}"] = _conv_init(keys[i], c_prev, c, 3)
        c_prev = c
    for i in range(n - 1, -1, -1):
        c_out = cfg.channels[i - 1] if i > 0 else cfg.out_channels
        params[f"up{i}"] = _conv_init(keys[n + i], c_prev, c_out, 3)
        c_prev = c_out + (cfg.channels[i - 1] if i > 0 else 0)
    return params


def apply_conv_encoder(params, cfg: ConvEncoderConfig, images):
    """(B, 3, H, W) -> (B, out_channels, H, W) UNet-ish per-pixel features."""
    skips = []
    x = images
    n = len(cfg.channels)
    for i in range(n):
        x = jax.nn.relu(group_norm(conv2d(params[f"down{i}"], x, stride=2)))
        skips.append(x)
    for i in range(n - 1, -1, -1):
        h, w = x.shape[2] * 2, x.shape[3] * 2
        x = _resize_bilinear(x, h, w)
        x = jax.nn.relu(group_norm(conv2d(params[f"up{i}"], x)))
        if i > 0:
            x = jnp.concatenate([x, _resize_bilinear(skips[i - 1], h, w)], axis=1)
    return x


# -- ResNet-18/34 backbone (reference SpatialEncoder parity) ----------------
# The reference's SpatialEncoder wraps a torchvision ImageNet-pretrained
# ResNet-18/34 (/root/reference/trainer/img_encoder.py:129-293).  This
# environment has no torchvision and no network, so the weights cannot be
# SHIPPED — but the architecture and a torch state-dict importer are:
# `init_resnet_backbone` builds the exact BasicBlock topology (randomly
# initialised) and `import_torch_backbone` loads `resnet18/34.pth` weights
# when the user provides them.  BN runs frozen (eval-mode running stats),
# the standard choice for feature-extraction backbones.


class ResNetBackboneConfig(NamedTuple):
    depth: int = 18                  # 18 or 34 (BasicBlock counts below)
    num_stages: int = 4              # feature stages concatenated (1..4)
    latent_size: int = 512           # 64+64+128+256 at num_stages=4


_RESNET_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn_apply(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return x * inv[None, :, None, None] + (
        p["bias"] - p["mean"] * inv)[None, :, None, None]


def _conv_nobias_init(key, c_in, c_out, k):
    fan_in = c_in * k * k
    w = jax.random.normal(key, (c_out, c_in, k, k)) * math.sqrt(2.0 / fan_in)
    return {"w": w}


def _conv_nobias(p, x, stride=1, pad=1):
    # torch-style SYMMETRIC padding (XLA "SAME" pads asymmetrically under
    # stride 2, which would break imported-weight parity)
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def init_resnet_backbone(key, cfg: ResNetBackboneConfig = ResNetBackboneConfig()):
    blocks = _RESNET_BLOCKS[cfg.depth]
    keys = iter(jax.random.split(key, 64))
    p = {"conv1": _conv_nobias_init(next(keys), 3, 64, 7), "bn1": _bn_init(64)}
    c_in = 64
    for li, (n_blocks, c_out) in enumerate(zip(blocks, (64, 128, 256, 512)),
                                           start=1):
        for bi in range(n_blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            blk = {"conv1": _conv_nobias_init(next(keys), c_in, c_out, 3),
                   "bn1": _bn_init(c_out),
                   "conv2": _conv_nobias_init(next(keys), c_out, c_out, 3),
                   "bn2": _bn_init(c_out)}
            if stride != 1 or c_in != c_out:
                blk["down_conv"] = _conv_nobias_init(next(keys), c_in, c_out, 1)
                blk["down_bn"] = _bn_init(c_out)
            p[f"layer{li}.{bi}"] = blk
            c_in = c_out
    return p


def _basic_block(p, x, stride):
    idt = x
    y = _conv_nobias(p["conv1"], x, stride=stride, pad=1)
    y = jax.nn.relu(_bn_apply(p["bn1"], y))
    y = _conv_nobias(p["conv2"], y, pad=1)
    y = _bn_apply(p["bn2"], y)
    if "down_conv" in p:
        idt = _bn_apply(p["down_bn"],
                        _conv_nobias(p["down_conv"], x, stride=stride, pad=0))
    return jax.nn.relu(y + idt)


def apply_resnet_backbone(params, cfg: ResNetBackboneConfig, images):
    """(B, 3, H, W) -> (B, latent_size, H/2, W/2): per-stage feature maps
    upsampled to the post-stem resolution and concatenated (the reference
    SpatialEncoder's latent construction, img_encoder.py:210-254)."""
    blocks = _RESNET_BLOCKS[cfg.depth]
    x = _conv_nobias(params["conv1"], images, stride=2, pad=3)
    x = jax.nn.relu(_bn_apply(params["bn1"], x))
    feats = [x]
    if cfg.num_stages > 1:
        # stem maxpool precedes layer1 (torch resnet); its /2 is undone by
        # the upsample-concat below.  At num_stages=1 no layer runs, so the
        # pool would be dead compute (reference gates on num_layers > 1).
        x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                   (1, 1, 3, 3), (1, 1, 2, 2),
                                   [(0, 0), (0, 0), (1, 1), (1, 1)])
    for li, n_blocks in enumerate(blocks[:max(cfg.num_stages - 1, 0)],
                                  start=1):
        for bi in range(n_blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _basic_block(params[f"layer{li}.{bi}"], x, stride)
        feats.append(x)
    h, w = feats[0].shape[2], feats[0].shape[3]
    up = [feats[0]] + [_resize_bilinear(f, h, w) for f in feats[1:]]
    return jnp.concatenate(up, axis=1)


def import_torch_backbone(state_dict, depth: int = 18):
    """torch `resnet{18,34}` state dict -> `apply_resnet_backbone` params.

    Accepts a path to a ``.pth`` file or an in-memory mapping of tensors
    (e.g. ``torchvision.models.resnet18(pretrained=True).state_dict()``
    saved on a connected machine).  fc/avgpool entries are ignored.
    """
    if not hasattr(state_dict, "items"):
        import torch
        state_dict = torch.load(state_dict, map_location="cpu",
                                weights_only=True)
    sd = {k: jnp.asarray(np.asarray(v.detach() if hasattr(v, "detach")
                                    else v, dtype=np.float32))
          for k, v in state_dict.items()}

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"]}

    p = {"conv1": {"w": sd["conv1.weight"]}, "bn1": bn("bn1")}
    for li, n_blocks in enumerate(_RESNET_BLOCKS[depth], start=1):
        for bi in range(n_blocks):
            pre = f"layer{li}.{bi}"
            blk = {"conv1": {"w": sd[f"{pre}.conv1.weight"]},
                   "bn1": bn(f"{pre}.bn1"),
                   "conv2": {"w": sd[f"{pre}.conv2.weight"]},
                   "bn2": bn(f"{pre}.bn2")}
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = {"w": sd[f"{pre}.downsample.0.weight"]}
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            p[pre] = blk
    return p


def make_encoder(enc_type: str = "spatial", key=None, **kwargs):
    """Factory (parity: trainer/__init__.py make_encoder)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if enc_type == "spatial":
        cfg = SpatialEncoderConfig(**kwargs)
        return cfg, init_spatial_encoder(key, cfg), apply_spatial_encoder
    if enc_type == "global":
        cfg = ImageEncoderConfig(**kwargs)
        return cfg, init_image_encoder(key, cfg), apply_image_encoder
    if enc_type == "conv":
        cfg = ConvEncoderConfig(**kwargs)
        return cfg, init_conv_encoder(key, cfg), apply_conv_encoder
    if enc_type == "resnet":
        cfg = ResNetBackboneConfig(**kwargs)
        return cfg, init_resnet_backbone(key, cfg), apply_resnet_backbone
    raise NotImplementedError(enc_type)
