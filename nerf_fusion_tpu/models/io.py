"""Model container + checkpoint save/load.

Capability parity with network/utility.py:10-58: ``load_model`` parses a
frozen ``hyper.json`` next to per-epoch checkpoints and rebuilds both nets.

Native checkpoint format: a single ``model_<ep>.npz`` / ``encoder_<ep>.npz``
of flat-keyed arrays (decoder params; encoder params + BN state).  A
compatibility importer converts the reference's torch ``.pth.tar`` weights
(weight-norm g/v decomposition and 1x1-conv squeeze) so the shipped
``ckpt/default`` model runs on TPU unchanged — used by the parity tests.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import parse_config_json
from .decoder import DecoderConfig, init_decoder
from .encoder import EncoderConfig, init_encoder


class Networks:
    """Holds decoder/encoder configs + parameter pytrees."""

    def __init__(self):
        self.decoder_config: DecoderConfig = None
        self.decoder_params = None
        self.encoder_config: EncoderConfig = None
        self.encoder_params = None
        self.encoder_bn = None


# -- flat npz (de)serialisation ---------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(path, tree):
    np.savez(path, **_flatten(tree))


def load_params(path):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


# -- model building & loading -----------------------------------------------

def build_model(args, seed: int = 0) -> Networks:
    """Construct nets from a hyper config namespace (network_specs etc.)."""
    model = Networks()
    model.decoder_config = DecoderConfig(args.code_length, **args.network_specs)
    enc_specs = dict(args.encoder_specs)
    enc_specs.pop("latent_size", None)
    model.encoder_config = EncoderConfig(args.code_length,
                                         enc_specs["per_point_feat"],
                                         bn=enc_specs.get("bn"))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    model.decoder_params = init_decoder(k1, model.decoder_config)
    model.encoder_params, model.encoder_bn = init_encoder(k2, model.encoder_config)
    return model


def load_model(training_hyper_path, use_epoch: int = -1):
    """Load hyper.json + epoch checkpoint (parity: network/utility.py:22-58).

    Accepts either native ``.npz`` checkpoints or the reference's torch
    ``.pth.tar`` files (auto-converted).
    """
    training_hyper_path = Path(training_hyper_path)
    assert training_hyper_path.name.endswith("json"), \
        "load_model expects a frozen hyper.json (as the reference fusion configs do)"
    args = parse_config_json(training_hyper_path)
    exp_dir = training_hyper_path.parent

    candidates = {}
    for pattern, kind in (("model_*.npz", "npz"), ("model_*.pth.tar", "torch")):
        for p in exp_dir.glob(pattern):
            ep = int(p.name.split("model_")[-1].split(".")[0].split(".pth")[0])
            candidates.setdefault(ep, (p, kind))
    if use_epoch == -1 and candidates:
        use_epoch = max(candidates)
    assert use_epoch in candidates, \
        f"epoch {use_epoch} not found in {sorted(candidates)} under {exp_dir}"
    model_path, kind = candidates[use_epoch]

    model = build_model(args)
    if kind == "npz":
        model.decoder_params = load_params(model_path)
        enc = load_params(exp_dir / f"encoder_{use_epoch}.npz")
        model.encoder_params, model.encoder_bn = enc["params"], enc["bn"]
    else:
        import_torch_checkpoint(model, model_path, exp_dir / f"encoder_{use_epoch}.pth.tar")
    return model, args


def save_checkpoint(save_dir, epoch, model: Networks, extra: dict = None):
    save_dir = Path(save_dir)
    save_params(save_dir / f"model_{epoch}.npz", model.decoder_params)
    save_params(save_dir / f"encoder_{epoch}.npz",
                {"params": model.encoder_params, "bn": model.encoder_bn})
    if extra is not None:
        save_params(save_dir / f"training_{epoch}.npz", extra)


def write_hyper_json(save_dir, args):
    def _default(o):
        if isinstance(o, Path):
            return str(o)
        return repr(o)
    with (Path(save_dir) / "hyper.json").open("w") as f:
        json.dump(vars(args) if not isinstance(args, dict) else args, f,
                  indent=2, default=_default)


def export_torch_checkpoint(model: Networks, decoder_path, encoder_path=None,
                            epoch: int = 0):
    """Write our params as reference-format torch ``.pth.tar`` files.

    The inverse of ``import_torch_checkpoint``: lets a reference user take a
    TPU-trained prior back to the CUDA implementation unchanged (weight-norm
    g/v layout, 1x1-conv unsqueeze, BN running stats).
    """
    import torch

    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    dstate = {}
    n_lin = model.decoder_config.num_layers - 1
    for layer in range(n_lin):
        p = model.decoder_params[f"lin{layer}"]
        if "v" in p:
            dstate[f"lin{layer}.weight_v"] = t(p["v"])
            dstate[f"lin{layer}.weight_g"] = t(p["g"]).reshape(-1, 1)
        else:
            dstate[f"lin{layer}.weight"] = t(p["w"])
        dstate[f"lin{layer}.bias"] = t(p["b"])
    dstate["uncertainty_layer.weight"] = t(model.decoder_params["unc"]["w"])
    dstate["uncertainty_layer.bias"] = t(model.decoder_params["unc"]["b"])
    torch.save({"epoch": epoch, "model_state": dstate}, decoder_path)

    if encoder_path is not None:
        estate = {}
        for i in range(model.encoder_config.n_layers):
            p = model.encoder_params[f"layer{i}"]
            estate[f"mlp.layer{i}.conv.weight"] = t(p["w"]).unsqueeze(-1)
            if "b" in p:
                estate[f"mlp.layer{i}.conv.bias"] = t(p["b"])
            if f"layer{i}" in model.encoder_bn:
                s = model.encoder_bn[f"layer{i}"]
                estate[f"mlp.layer{i}.normlayer.bn.weight"] = t(s["scale"])
                estate[f"mlp.layer{i}.normlayer.bn.bias"] = t(s["bias"])
                estate[f"mlp.layer{i}.normlayer.bn.running_mean"] = t(s["mean"])
                estate[f"mlp.layer{i}.normlayer.bn.running_var"] = t(s["var"])
                estate[f"mlp.layer{i}.normlayer.bn.num_batches_tracked"] = \
                    torch.tensor(0)
        torch.save({"epoch": epoch, "model_state": estate}, encoder_path)


# -- torch checkpoint import --------------------------------------------------

def import_torch_checkpoint(model: Networks, decoder_path, encoder_path=None):
    """Convert reference .pth.tar weights into our pytrees (cpu torch only)."""
    import torch

    dstate = torch.load(decoder_path, map_location="cpu", weights_only=False)["model_state"]
    dparams = {}
    n_lin = model.decoder_config.num_layers - 1
    for layer in range(n_lin):
        if f"lin{layer}.weight_v" in dstate:
            dparams[f"lin{layer}"] = {
                "v": jnp.asarray(dstate[f"lin{layer}.weight_v"].numpy()),
                "g": jnp.asarray(dstate[f"lin{layer}.weight_g"].numpy()).reshape(-1),
                "b": jnp.asarray(dstate[f"lin{layer}.bias"].numpy()),
            }
        else:
            dparams[f"lin{layer}"] = {
                "w": jnp.asarray(dstate[f"lin{layer}.weight"].numpy()),
                "b": jnp.asarray(dstate[f"lin{layer}.bias"].numpy()),
            }
    dparams["unc"] = {
        "w": jnp.asarray(dstate["uncertainty_layer.weight"].numpy()),
        "b": jnp.asarray(dstate["uncertainty_layer.bias"].numpy()),
    }
    model.decoder_params = dparams

    if encoder_path is not None and Path(encoder_path).exists():
        estate = torch.load(encoder_path, map_location="cpu", weights_only=False)["model_state"]
        eparams, ebn = {}, {}
        for i in range(model.encoder_config.n_layers):
            w = estate[f"mlp.layer{i}.conv.weight"].numpy()[:, :, 0]  # (out,in,1)->(out,in)
            layer_p = {"w": jnp.asarray(w)}
            if f"mlp.layer{i}.normlayer.bn.weight" in estate:
                ebn[f"layer{i}"] = {
                    "scale": jnp.asarray(estate[f"mlp.layer{i}.normlayer.bn.weight"].numpy()),
                    "bias": jnp.asarray(estate[f"mlp.layer{i}.normlayer.bn.bias"].numpy()),
                    "mean": jnp.asarray(estate[f"mlp.layer{i}.normlayer.bn.running_mean"].numpy()),
                    "var": jnp.asarray(estate[f"mlp.layer{i}.normlayer.bn.running_var"].numpy()),
                }
            if f"mlp.layer{i}.conv.bias" in estate:
                layer_p["b"] = jnp.asarray(estate[f"mlp.layer{i}.conv.bias"].numpy())
            eparams[f"layer{i}"] = layer_p
        model.encoder_params, model.encoder_bn = eparams, ebn
    return model
