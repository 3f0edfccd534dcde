"""Joint encoder-decoder training: jitted step, mesh-sharded batches.

Capability parity with trainer/main.py:40-219 (SURVEY.md §3.2), TPU-first:

  * one jitted ``train_step`` fusing encoder fwd (train-mode BN), latent
    repeat, decoder fwd with dropout, loss registry, backward, and BOTH
    Adam updates — no per-batch host sync beyond the scalar loss fetch;
  * data parallelism by sharding the batch over the mesh's ``dp`` axis
    (replaces torch DataParallel, trainer/main.py:54,59); gradients
    all-reduce over ICI automatically;
  * two optimizer groups with per-epoch Step/Warmup/Constant schedules
    via ``optax.inject_hyperparams`` (lr updated inside the jitted step);
  * ``batch_split`` gradient accumulation as a traced loop;
  * surface |SDF| validation probe, JSONL scalar logging, per-epoch
    snapshots + frozen ``hyper.json`` — and resume support, which the
    reference lacks (SURVEY.md §5.4).
"""

from __future__ import annotations

import functools
import json
import logging
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

# step-progress logging period (0 = off); perf forensics on tunneled chips
_LOG_STEPS = int(os.environ.get("NERF_TRAIN_LOG_STEPS", "0"))

from ..data.lif_dataset import LifCombinedDataset, LifDataset, batch_iterator
from ..models import criterion
from ..models.decoder import apply_decoder
from ..models.encoder import EncoderConfig, apply_encoder
from ..models.io import build_model, save_checkpoint, write_hyper_json
from ..parallel.mesh import replicate, shard_batch
from ..utils.config import dict_to_args
from ..utils.meters import AverageMeter, RunningAverageMeter
from . import lr_schedule


def make_optimizers():
    mk = lambda: optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    return mk(), mk()


def _set_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def make_train_step(dec_cfg, enc_cfg_train: EncoderConfig, loss_names,
                    loss_args, samples_per_lif: int, batch_split: int,
                    dec_opt, enc_opt):
    loss_fns = criterion.get_losses(loss_names)

    def step_core(dec_params, enc_params, enc_bn,
                  dec_opt_state, enc_opt_state,
                  sdf_data, surface_data, rng, epoch, lr_dec, lr_enc):
        B = surface_data.shape[0]
        num_sdf_samples = B * samples_per_lif

        def loss_fn(dp, ep):
            lat, new_bn = apply_encoder(ep, enc_bn, enc_cfg_train,
                                        surface_data, train=True)        # (B, L)
            lat_rep = jnp.repeat(lat, samples_per_lif, axis=0)           # (B*S, L)
            xyz = sdf_data.reshape(-1, 4)[:, :3]
            gt = sdf_data.reshape(-1, 4)[:, 3:]
            total = 0.0
            logs = {}
            # batch_split gradient accumulation (trainer/main.py:139-163)
            chunk = (B * samples_per_lif) // batch_split
            for ci in range(batch_split):
                sl = slice(ci * chunk, (ci + 1) * chunk)
                net_in = jnp.concatenate([lat_rep[sl], xyz[sl]], axis=1)
                pd_sdf, pd_std = apply_decoder(dp, dec_cfg, net_in,
                                               train=True,
                                               rng=jax.random.fold_in(rng, ci))
                for lf in loss_fns:
                    ld = lf(loss_args, {"num_sdf_samples": num_sdf_samples,
                                        "epoch": epoch},
                            pd_sdf=pd_sdf, pd_sdf_std=pd_std, gt_sdf=gt[sl],
                            latent_vecs=lat_rep[sl], coords=xyz[sl])
                    for k, v in ld.items():
                        total = total + v
                        logs[k] = logs.get(k, 0.0) + v
            # validation probe: |SDF| at (clean) surface points
            surf_xyz = surface_data[..., :3].reshape(-1, 3)
            surf_lat = jnp.repeat(lat, surface_data.shape[1], axis=0)
            v_sdf, _ = apply_decoder(dp, dec_cfg,
                                     jnp.concatenate([surf_lat, surf_xyz], axis=1))
            logs["validation"] = jnp.mean(jnp.abs(v_sdf))
            return total, (new_bn, logs, lat)

        (_, (new_bn, logs, lat)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(dec_params, enc_params)

        dec_opt_state = _set_lr(dec_opt_state, lr_dec)
        enc_opt_state = _set_lr(enc_opt_state, lr_enc)
        du, dec_opt_state = dec_opt.update(grads[0], dec_opt_state, dec_params)
        eu, enc_opt_state = enc_opt.update(grads[1], enc_opt_state, enc_params)
        dec_params = optax.apply_updates(dec_params, du)
        enc_params = optax.apply_updates(enc_params, eu)
        return dec_params, enc_params, new_bn, dec_opt_state, enc_opt_state, logs, lat

    jitted = jax.jit(
        step_core,
        donate_argnames=("dec_params", "enc_params", "enc_bn",
                         "dec_opt_state", "enc_opt_state"))

    class _TrainStep:
        """Callable jitted step; `.core` is the un-jitted body, reusable
        inside larger programs (the epoch-in-one-dispatch scan)."""
        core = staticmethod(step_core)

        def __call__(self, *a, **kw):
            return jitted(*a, **kw)

    return _TrainStep()


def make_steps_runner(step_core, sample_fn):
    """Scan `step_core` over a (K, B) index matrix in ONE device program.

    With HBM-resident data (`device_data: true`) the per-step host work is
    only a dispatch — but through a thin/tunneled link even dispatch costs
    tens of ms (measured: the 4096-sample step is 8 ms of device time vs
    ~60 ms/step wall through a loaded tunnel).  Scanning K steps per
    dispatch amortizes it away.  RNG split order matches the per-step host
    loop exactly (sample key first, then step key), so the result is
    trajectory-equivalent to K single-step calls with the same starting
    key.  "Equivalent" is up to last-ulp XLA fusion differences between
    the scanned and standalone step programs, amplified by Adam's
    1/(sqrt(v)+eps) normalization — NOT bit-identical (pinned with a
    justified tolerance by tests/test_device_lif.py).

    A chunk shorter than K (the epoch's tail) is padded and masked via
    `valid`: padded rows run a throwaway step whose outputs (including the
    carried RNG key) are discarded, so every dispatch reuses the ONE
    compiled K-step program and the trajectory matches the unpadded one
    exactly.

    `sample_fn(key, idxs)` -> (sdf (B,S,4), surface (B,M,6)); its pool
    arrays must be CLOSED-OVER DEVICE ARRAYS (jax treats them as
    constants resident on device, not baked into the serialized program).
    """

    @functools.partial(
        jax.jit,
        donate_argnames=("dec_params", "enc_params", "enc_bn",
                         "dec_opt_state", "enc_opt_state"))
    def run_steps(dec_params, enc_params, enc_bn,
                  dec_opt_state, enc_opt_state,
                  idx_mat, valid, rng, epoch, lr_dec, lr_enc):
        def body(carry, xs):
            idxs, v = xs
            dp, ep, bn, dos, eos, key = carry
            nkey, kb = jax.random.split(key)
            sdf_b, surf_b = sample_fn(kb, idxs)
            nkey, ks = jax.random.split(nkey)
            dp, ep, bn, dos, eos, logs, _ = step_core(
                dp, ep, bn, dos, eos, sdf_b, surf_b, ks,
                epoch, lr_dec, lr_enc)
            # padded (invalid) steps: keep the old carry — including the
            # RNG key, so key-consumption order matches the per-step path
            new_carry = jax.tree_util.tree_map(
                lambda n, o: jnp.where(v, n, o),
                (dp, ep, bn, dos, eos, nkey), carry)
            return new_carry, logs

        (dp, ep, bn, dos, eos, key), logs = jax.lax.scan(
            body,
            (dec_params, enc_params, enc_bn, dec_opt_state, enc_opt_state,
             rng), (idx_mat, valid))
        w = valid.astype(jnp.float32)
        n_valid = jnp.sum(valid.astype(jnp.int32))
        last_logs = jax.tree_util.tree_map(
            lambda x: x[n_valid - 1], logs)
        mean_logs = jax.tree_util.tree_map(
            lambda x: jnp.sum(x * w, axis=0) / jnp.sum(w), logs)
        return dp, ep, bn, dos, eos, mean_logs, last_logs, key

    return run_steps


class ScalarLogger:
    """JSONL scalar log + optional TensorBoard if available."""

    def __init__(self, logdir):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self.f = (self.logdir / "scalars.jsonl").open("a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(str(self.logdir / "tensorboard"))
        except Exception:
            pass

    def update(self, tag, step, values: dict):
        self.f.write(json.dumps({"tag": tag, "step": step, **values}) + "\n")
        self.f.flush()
        if self.tb is not None:
            self.tb.add_scalars(tag, values, global_step=step)

    def text(self, text):
        if self.tb is not None:
            self.tb.add_text("Info", text)


def _save_opt_state(path, state):
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state), f)


def _load_opt_state(path, like):
    import pickle

    with open(path, "rb") as f:
        loaded = pickle.load(f)
    leaves, _ = jax.tree_util.tree_flatten(loaded)
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like),
        [jnp.asarray(l) for l in leaves])


def train(args, max_steps_per_epoch: int = None, mesh=None, seed: int = 0,
          dataset=None, resume_epoch: int = None):
    """Run the full training loop. Returns (model, save_dir).

    :param dataset: optional pre-built dataset (e.g. the per-scene
        trainer's in-memory harvest); default builds from args.train_set.
    :param resume_epoch: resume from this snapshot in the run directory
        (params + optimizer states + epoch counter) — a capability the
        reference lacks (start_epoch hardcoded, SURVEY.md §5.4).
    """
    if max_steps_per_epoch is None:
        # also reachable from the CLI/config (--exec "max_steps_per_epoch=N")
        # for capped smoke runs on giant LIF sets
        max_steps_per_epoch = getattr(args, "max_steps_per_epoch", None)
    checkpoints = list(range(args.snapshot_frequency, args.num_epochs + 1,
                             args.snapshot_frequency))
    checkpoints += list(args.additional_snapshots)
    checkpoints.sort()

    schedules = lr_schedule.get_learning_rate_schedules(args)
    model = build_model(args, seed=seed)
    enc_cfg_train = EncoderConfig(args.code_length,
                                  model.encoder_config.dims[:-1],
                                  bn=args.encoder_specs.get("bn"), mode="train")

    if dataset is None:
        datasets = [LifDataset(**t, num_sample=args.samples_per_lif)
                    for t in args.train_set]
        dataset = LifCombinedDataset(*datasets)
    logging.info("dataset: %d LIFs", len(dataset))

    loss_args = dict_to_args(args.training_loss)
    dec_opt, enc_opt = make_optimizers()
    dec_opt_state = dec_opt.init(model.decoder_params)
    enc_opt_state = enc_opt.init(model.encoder_params)

    step_fn = make_train_step(model.decoder_config, enc_cfg_train,
                              loss_args.types, loss_args,
                              args.samples_per_lif, args.batch_split,
                              dec_opt, enc_opt)

    save_dir = Path(getattr(args, "save_dir", "../di-checkpoints")) / args.run_name
    save_dir.mkdir(parents=True, exist_ok=True)
    write_hyper_json(save_dir, args)
    viz = ScalarLogger(save_dir / "logs")

    start_epoch = 1
    if resume_epoch is not None:
        from .. import models
        from ..models.io import load_params
        model.decoder_params = load_params(save_dir / f"model_{resume_epoch}.npz")
        enc = load_params(save_dir / f"encoder_{resume_epoch}.npz")
        model.encoder_params, model.encoder_bn = enc["params"], enc["bn"]
        opt_path = save_dir / f"optimizer_{resume_epoch}.pkl"
        if opt_path.exists():
            dec_opt_state, enc_opt_state = _load_opt_state(
                opt_path, (dec_opt_state, enc_opt_state))
        start_epoch = resume_epoch + 1
        logging.info("resumed from epoch %d", resume_epoch)

    if mesh is not None:
        model.decoder_params = replicate(mesh, model.decoder_params)
        model.encoder_params = replicate(mesh, model.encoder_params)
        model.encoder_bn = replicate(mesh, model.encoder_bn)
        dec_opt_state = jax.tree_util.tree_map(
            lambda x: replicate(mesh, {"x": x})["x"], dec_opt_state)
        enc_opt_state = jax.tree_util.tree_map(
            lambda x: replicate(mesh, {"x": x})["x"], enc_opt_state)

    # Device-resident data path (opt-in `device_data: true`): upload the
    # packed pools to HBM once and sample each batch in a jitted device
    # program — the per-step host->device traffic drops from ~4.4 MB (the
    # assembled batch) to the (B,) index vector.  Single-device only: under
    # a dp mesh the batch must be host-sharded across processes instead.
    dev_ds = None
    steps_runner = None
    steps_per_call = int(getattr(args, "steps_per_call", 1))
    if bool(getattr(args, "device_data", False)):
        if mesh is not None:
            logging.warning("device_data ignored under a device mesh")
        else:
            from ..data.device_lif import DeviceLifDataset
            dev_ds = DeviceLifDataset.from_dataset(dataset)
            logging.info("device-resident LIF pools: %.2f GB in HBM",
                         dev_ds.hbm_bytes / 1e9)
            if steps_per_call > 1:
                # epoch-in-few-dispatches: scan K steps per device call
                # (same batches/RNG order as the per-step path)
                steps_runner = make_steps_runner(step_fn.core, dev_ds.sample)

    rng = jax.random.PRNGKey(seed + (resume_epoch or 0))
    it = (start_epoch - 1) * max(len(dataset) // args.batch_size, 1)
    t0 = time.time()
    t_log = t0   # timestamp of the previous NERF_TRAIN_LOG_STEPS line
    for epoch in range(start_epoch, args.num_epochs + 1):
        lr_dec = schedules[0].get_learning_rate(epoch)
        lr_enc = schedules[1].get_learning_rate(epoch)
        meter = AverageMeter()
        running = RunningAverageMeter(alpha=0.3)
        last_logs = None
        if steps_runner is not None:
            perm = np.random.RandomState(seed + epoch).permutation(len(dataset))
            n_steps = len(dataset) // args.batch_size
            if max_steps_per_epoch is not None:
                n_steps = min(n_steps, max_steps_per_epoch)
            idx_all = perm[:n_steps * args.batch_size].reshape(
                n_steps, args.batch_size).astype(np.int32)
            s = 0
            while s < n_steps:
                k = min(steps_per_call, n_steps - s)
                idx_chunk = idx_all[s:s + k]
                if k < steps_per_call:
                    # pad the tail chunk so the ONE compiled K-step program
                    # serves every dispatch (padded rows are masked out)
                    idx_chunk = np.concatenate(
                        [idx_chunk,
                         np.repeat(idx_chunk[-1:], steps_per_call - k, 0)], 0)
                valid = np.arange(steps_per_call) < k
                (model.decoder_params, model.encoder_params, model.encoder_bn,
                 dec_opt_state, enc_opt_state, mean_logs, last_logs,
                 rng) = steps_runner(
                    model.decoder_params, model.encoder_params,
                    model.encoder_bn, dec_opt_state, enc_opt_state,
                    jnp.asarray(idx_chunk), jnp.asarray(valid), rng,
                    epoch, lr_dec, lr_enc)
                s += k
                it += k
                host_logs = {kk: float(v) for kk, v in mean_logs.items()}
                running.append_loss(host_logs)
                meter.append_loss(host_logs)
                for kk, v in host_logs.items():
                    viz.update(f"train/{kk}", it, {"scalar": v})
                if _LOG_STEPS:
                    now = time.time()
                    logging.info("step %d (%.3f s/step over last call)",
                                 it, (now - t_log) / k)
                    t_log = now
            last_logs = {kk: v for kk, v in last_logs.items()} \
                if n_steps else None
            batch_iter = iter(())     # epoch consumed by the runner
        elif dev_ds is not None:
            perm = np.random.RandomState(seed + epoch).permutation(len(dataset))
            n_steps = len(dataset) // args.batch_size
            def batches():
                nonlocal rng
                for s in range(n_steps):
                    rng, kb = jax.random.split(rng)
                    idxs = perm[s * args.batch_size:(s + 1) * args.batch_size]
                    sdf_b, surf_b = dev_ds.sample(kb, idxs)
                    yield sdf_b, surf_b, idxs
            batch_iter = batches()
        else:
            batch_iter = batch_iterator(dataset, args.batch_size,
                                        seed=seed + epoch)
        for bi, (sdf_b, surf_b, idx_b) in enumerate(batch_iter):
            if max_steps_per_epoch is not None and bi >= max_steps_per_epoch:
                break
            batch = (jnp.asarray(sdf_b), jnp.asarray(surf_b))
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            (model.decoder_params, model.encoder_params, model.encoder_bn,
             dec_opt_state, enc_opt_state, logs, _) = step_fn(
                model.decoder_params, model.encoder_params, model.encoder_bn,
                dec_opt_state, enc_opt_state, batch[0], batch[1], sub,
                epoch, lr_dec, lr_enc)
            it += 1
            last_logs = logs
            if _LOG_STEPS and it % _LOG_STEPS == 0:
                now = time.time()
                # rate over the LAST _LOG_STEPS only (a lifetime average
                # dilutes tunnel slowdowns and early compile time — the
                # exact phases this knob exists to expose)
                logging.info("step %d (%.2f s/step recent)", it,
                             (now - t_log) / _LOG_STEPS)
                t_log = now
            # Fetch loss scalars only every 10 steps: each float() is a
            # device->host sync that would otherwise serialise the step queue.
            if it % 10 == 0:
                host_logs = {k: float(v) for k, v in logs.items()}
                running.append_loss(host_logs)
                meter.append_loss(host_logs)
                for k, v in host_logs.items():
                    viz.update(f"train/{k}", it, {"scalar": v})
        if not meter.loss_dict and last_logs is not None:
            # short epochs (< 10 steps) would otherwise log nothing
            meter.append_loss({k: float(v) for k, v in last_logs.items()})
        train_avg = meter.get_mean_loss_dict()
        for k, v in train_avg.items():
            viz.update(f"epoch_sum/{k}", epoch, {"train": v})
        viz.update("train_stat/lr_0", epoch, {"scalar": lr_dec})
        logging.info("epoch %d (%.1fs): %s", epoch, time.time() - t0,
                     meter.get_printable_mean())
        if epoch in checkpoints:
            save_checkpoint(save_dir, epoch, model,
                            extra={"opt": {"epoch": np.asarray(epoch)}})
            _save_opt_state(save_dir / f"optimizer_{epoch}.pkl",
                            (dec_opt_state, enc_opt_state))
    return model, save_dir
