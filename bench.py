#!/usr/bin/env python3
"""Headline benchmark: online tracking+fusion fps on the flagship lr-kt
workload (640x480 RGB-D, ICL-NUIM disk format, fusion-lr-kt-fast config).

Three workloads run back to back:

1. **lr-kt flagship** (the headline metric): the exported ICL-NUIM-format
   sequence read through the real `ICLNUIMSequence` disk reader, the
   unmodified `configs/fusion-lr-kt-fast.yaml` schedule (70-iter staged GN,
   sparse photometric term, 4M triangle budget, 0.1 m voxel map over the
   lr-kt bounds).  The reference's own demo workload (BASELINE.md:33 target:
   >=10 fps).
2. **lr-kt parity** (recorded + gated every round, VERDICT r4 #2): the
   UNMODIFIED reference-faithful `configs/fusion-lr-kt.yaml` through the
   identical protocol — dense photometric term, reference GN schedule.
3. **synth quick bench** (continuity with BENCH_r01/r02): the hermetic
   synthetic sequence + fusion-synth.yaml.

The timed window is steady-state: a device sync brackets each side, so it
contains exactly the device work of the timed frames (dispatch is async;
un-synced walls undercount).  Frames are pre-decoded and pre-uploaded —
in deployment `PrefetchSequence(upload=True)` overlaps decode+H2D with
device compute, so the loop measures the pipeline, not this host's
tunneled-link bandwidth.

Quality gates (rc != 0 on violation — a regression can't ship green):
ATE, mesh |SDF| error against the scene's analytic SDF, box-filter drop
rate, and an fps floor.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import logging
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
# same machine-fingerprinted cache dir as the entry points/tests (a host
# change invalidates instead of loading foreign CPU AOT artifacts)
from nerf_fusion_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

N_WARMUP = int(os.environ.get("BENCH_WARMUP", 30))
# 120 frames = three 40-frame windows.  Window size is an integer multiple
# of the 20-frame integrate+mesh cadence so every window holds the same
# cadence mix (30-frame windows aliased the cadence: 1 vs 2 extractions
# per window masqueraded as tunnel variance).  Longer windows also
# amortize the two bracket syncs (~30-60 ms tunnel roundtrips) each
# window pays.
N_BENCH = int(os.environ.get("BENCH_FRAMES", 120))
LRKT_DATA = Path(os.environ.get("BENCH_LRKT_DATA",
                                REPO / "output" / "lrkt_data" / "lr-kt"))

# Gates (~2x measured, VERDICT r2 item 4: synth ATE measured 6.0 mm,
# lr-kt tracked ATE measured 3.9-5.7 mm, mesh |SDF| error measured ~5 mm,
# box drop measured <=2.1%).
ATE_GATE = float(os.environ.get("BENCH_ATE_GATE", 0.012))
MESH_ERR_GATE = float(os.environ.get("BENCH_MESH_GATE", 0.02))
DROP_GATE = 0.05
# fps floors: the tunneled chip's wall throughput varies ~10x with tunnel
# load (MEMORY tpu-tunnel-perf-variance), so the floors are set well below
# quiet-state measurements but high enough to catch real regressions.
FPS_FLOOR_LRKT = float(os.environ.get("BENCH_FPS_FLOOR_LRKT", 8.0))
FPS_FLOOR_SYNTH = float(os.environ.get("BENCH_FPS_FLOOR_SYNTH", 20.0))
# The unmodified reference-faithful fusion-lr-kt.yaml runs as a second
# recorded+gated workload every round (VERDICT r4 directive #2).  Floor
# philosophy matches FPS_FLOOR_LRKT: just under the reference's >=10 fps
# BASELINE target, well below quiet-state measurements (>=80 fps, round 5)
# because tunnel load moves wall throughput ~10x.  Quality gates are ~2x
# the quiet-state measurements (ATE 10.1 mm, mesh 14.2 mm, PARITY.md).
FPS_FLOOR_PARITY = float(os.environ.get("BENCH_FPS_FLOOR_PARITY", 8.0))
PARITY_ATE_GATE = float(os.environ.get("BENCH_PARITY_ATE_GATE", 0.02))
PARITY_MESH_GATE = float(os.environ.get("BENCH_PARITY_MESH_GATE", 0.028))
# warm-cache time to the first tracked frame (compile-cache deserialization
# + first execution).  VERDICT r3 weak #2: this regressed 61.5 -> 216.8 s
# between rounds with nothing gating it.  Round-4 measurement: wall time is
# NOT a usable regression signal here — the same warm-cache code read 47.6,
# 111, 280 and 418 s within hours (compile-log timelines show all host-side
# cache work done in ~30 s; the rest is device-side program load through
# the tunnel, which varies ~10x with external load and makes warm-under-load
# slower than cold-on-quiet).  The structural gate below (big-program cache
# MISS count on a warm cache) is the real drift detector; the wall gate
# stays as a generous catch-all only.
# (Observed worst warm-cache wall: 907 s while the tunnel served ~16 MB
# serialized executables at ~dial-up rates; the structural gate stayed
# green through it.)
FIRST_FRAME_GATE_S = float(os.environ.get("BENCH_FIRST_FRAME_GATE", 1800.0))

# The programs whose recompilation IS a first-frame regression: if the
# cache is warm, none of these may miss.  Only default-path programs —
# opt-ins (fused_frame_block under BENCH_FPC, refine_latents under
# BENCH_OPTIMIZE) legitimately miss on their first opt-in run.  (Tiny
# sub-second jits churn with jax internals and are excluded; they cost
# ~0.5 s each, bounded by count.)
BIG_PROGRAMS = ("_frame_step", "integrate_keyframe",
                "fused_extract", "preprocess_frame")


class _MissCounter(logging.Filter):
    """Counts persistent-cache misses of the big per-frame programs.

    jax logs every persistent-cache decision on jax._src.compiler at DEBUG
    ("PERSISTENT COMPILATION CACHE MISS for 'jit_<name>' ...").  Counting
    misses of the named big programs gives a tunnel-independent warm-cache
    regression signal — wall time cannot (see FIRST_FRAME_GATE_S note).
    """

    def __init__(self):
        super().__init__()
        self.misses = []

    def filter(self, record):
        msg = record.getMessage()
        if "CACHE MISS" in msg:
            for name in BIG_PROGRAMS:
                if f"'jit_{name}'" in msg:
                    self.misses.append(name)
                    break
        return True     # observe only; never swallow the record


def _install_miss_counter() -> _MissCounter:
    counter = _MissCounter()
    logger = logging.getLogger("jax._src.compiler")
    logger.setLevel(logging.DEBUG)
    logger.addFilter(counter)
    # keep the DEBUG records out of bench output: filters run in handle()
    # even with propagation off and only a NullHandler attached
    logger.propagate = False
    logger.addHandler(logging.NullHandler())
    return counter


# The export is 170 frames at the SAME per-frame camera motion as the
# historical 120-frame export (angular span scales with frame count), so
# warmup 30 + three 40-frame windows + the drain tail all fit.
LRKT_EXPORT_FRAMES = 170
_LRKT_SPAN = 1.2 * (LRKT_EXPORT_FRAMES - 1) / 119.0


def _ensure_lrkt_data():
    """Export the hermetic ICL-NUIM-format sequence once.

    Returns the TRUE first_tq of the exported trajectory: reading with it
    recovers the original synthetic-scene world frame exactly, which the
    mesh |SDF| oracle requires (the stock config first_tq would shift the
    map by a rigid transform — invisible to ATE, fatal to the oracle).
    """
    from nerf_fusion_tpu.data.synth import SyntheticSequence

    tq_path = LRKT_DATA / "first_tq.json"
    n_have = len(list((LRKT_DATA / "depth").glob("*.png"))) \
        if (LRKT_DATA / "depth").exists() else 0
    if not (LRKT_DATA / "groundtruth.freiburg").exists() \
            or n_have < LRKT_EXPORT_FRAMES:
        from export_icl_format import export_sequence

        logging.warning("exporting lr-kt-format bench sequence to %s",
                        LRKT_DATA)
        seq = SyntheticSequence(n_frames=LRKT_EXPORT_FRAMES,
                                angular_span=_LRKT_SPAN,
                                width=640, height=480)
        first_tq = export_sequence(seq, LRKT_DATA)
        tq_path.write_text(json.dumps([float(x) for x in first_tq]))
    if not tq_path.exists():     # pre-existing export: poses are analytic
        p1 = SyntheticSequence(n_frames=LRKT_EXPORT_FRAMES,
                               angular_span=_LRKT_SPAN)._poses[1]
        tq_path.write_text(json.dumps(
            [float(x) for x in (*p1.t, *p1.q.q)]))
    return json.loads(tq_path.read_text())


def _build(config_path, first_tq=None):
    from nerf_fusion_tpu.models.io import load_model
    from nerf_fusion_tpu.system.pipeline import FusionPipeline
    from nerf_fusion_tpu.utils import config as exp_util
    from nerf_fusion_tpu.utils.se3 import Isometry, Quaternion

    args = exp_util.parse_config_yaml(config_path)
    # prior override for checkpoint-parity evals (e.g. ckpt/full_trained)
    args.training_hypers = os.environ.get("BENCH_HYPERS",
                                          args.training_hypers)
    args.using_epoch = int(os.environ.get("BENCH_EPOCH", args.using_epoch))
    model, margs = load_model(REPO / args.training_hypers, args.using_epoch)
    args.model = margs
    args.mapping = exp_util.dict_to_args(args.mapping)
    args.tracking = exp_util.dict_to_args(args.tracking)
    args.run_async = bool(int(os.environ.get("BENCH_ASYNC", "0")))
    # BENCH_REUSE_EPS: override the latent-reuse re-mesh gate (mesher skips
    # updated voxels whose latent moved < eps since their last meshing) for
    # eps sweeps without editing configs.  Unset = config value.
    if os.environ.get("BENCH_REUSE_EPS"):
        args.mesh_reuse_latent_eps = float(os.environ["BENCH_REUSE_EPS"])
    # BENCH_OPTIMIZE=1: enable the per-keyframe latent refinement (the
    # reference's dormant OptimizeProcess capability) for a capability-on
    # throughput number; OFF matches the reference's shipped behaviour.
    if int(os.environ.get("BENCH_OPTIMIZE", "0")):
        args.do_optimize = True
    # BENCH_FPC=K: scan K tracking-only frames per device dispatch
    # (pipeline frames_per_call); K=19 fills the 20-frame cadence exactly.
    # Pair with BENCH_WARMUP at a multiple of 20 so window brackets land on
    # cadence frames (empty buffer, fully-blocked windows).
    fpc = int(os.environ.get("BENCH_FPC", "0"))
    if fpc:
        args.frames_per_call = fpc
    tq = first_tq if first_tq is not None else (
        args.sequence_kwargs.get("first_tq")
        if hasattr(args, "sequence_kwargs") else None)
    if tq is not None:
        args.first_iso = Isometry(q=Quaternion(array=tq[3:]), t=tq[:3])
    return FusionPipeline(model, args), args


def _drop_max(drops):
    """Max box-filter drop over () scalar and (K,) block entries."""
    import numpy as np
    if not drops:
        return 0.0
    return float(max(float(np.atleast_1d(d).max()) for d in drops))


def _mesh_abs_sdf_error(mesher):
    """Exact mesh-quality metric: mean |scene SDF| at mesh vertices (both
    bench workloads render data/synth.py's "room" analytic SDF — the lr-kt
    export is that scene written in ICL-NUIM disk format; VERDICT r2
    item 3).  One shared implementation with pipeline.run's scene-aware
    stat (utils.evaluate.mesh_abs_sdf_error)."""
    from nerf_fusion_tpu.data.synth import scene_sdf
    from nerf_fusion_tpu.utils.evaluate import mesh_abs_sdf_error

    return mesh_abs_sdf_error(mesher.current_mesh(), scene_sdf)


CADENCE = 20      # integrate+mesh every 20 frames (fusion-lr-kt.yaml:23-24)


def _timed_windows(pipe, frames, start: int, n: int):
    """Time sync-bracketed sub-windows; report the MEDIAN window's fps.

    Window size is an integer multiple of the 20-frame integrate+mesh
    cadence (40 when n allows), so every window holds the same cadence mix.
    Each window contains exactly its frames' device work (sync both
    sides).  The median is the headline: the tunneled chip's wall clock
    varies ~10x with external load (MEMORY tpu-tunnel-perf-variance), so
    the mean benchmarks the tunnel's mood — and the max systematically
    flatters (VERDICT r3 weak #3).  Best/worst ship as aux fields.

    Returns (median_fps, per_window_fps, n_timed) — frames beyond the
    last full window are left to the caller's tail loop."""
    w = 2 * CADENCE if n >= 3 * 2 * CADENCE else CADENCE
    n_windows = max(1, n // w)
    fps_w = []
    i = start
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(w):
            pipe.process_frame(frames[i], i)
            i += 1
        pipe.flush_frames()      # frames_per_call: no buffered work may
        _sync_all(pipe)          # leak across a window bracket
        fps_w.append(w / (time.perf_counter() - t0))
    med = float(np.median(fps_w))
    return med, [round(f, 2) for f in fps_w], n_windows * w


def _sync_all(pipe):
    """Drain the device queue COMPLETELY: the pose log covers every track
    program (donation chain) and the map state covers integrations, but
    cadence mesh extractions are dependency-free — fetch their triangle
    counts too so no extraction work leaks past the timed window."""
    import jax

    pipe.trajectory()
    with pipe.mesher._lock:
        pending = list(pipe.mesher._pending)
    if pending:
        jax.device_get([p.result.n_triangles for p in pending])


def run_lrkt(cfg_name=None):
    import jax

    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence
    from nerf_fusion_tpu.utils.evaluate import ate_rmse

    tq = _ensure_lrkt_data()
    # BENCH_LRKT_CONFIG selects the headline workload config (default: the
    # documented fast variant).  The unmodified reference-faithful
    # "fusion-lr-kt.yaml" parity config ALSO runs every round through the
    # identical protocol as a second recorded+gated workload (VERDICT r4
    # directive #2) — see run-parity in main().
    if cfg_name is None:
        cfg_name = os.environ.get("BENCH_LRKT_CONFIG",
                                  "fusion-lr-kt-fast.yaml")
    pipe, args = _build(REPO / "configs" / cfg_name, first_tq=tq)
    seq = ICLNUIMSequence(path=str(LRKT_DATA), start_frame=0, end_frame=-1,
                          first_tq=tq, load_gt=True)
    n_total = min(len(seq), N_WARMUP + N_BENCH + 10)
    # clamp oversized BENCH_WARMUP/BENCH_FRAMES to the export length
    # instead of indexing past the list
    n_warm = min(N_WARMUP, max(1, n_total - 10))
    n_bench = max(1, min(N_BENCH, n_total - n_warm))
    frames = [next(seq) for _ in range(n_total)]
    # Pre-upload: deployment overlap via PrefetchSequence(upload=True)
    for f in frames:
        f.rgb = jax.device_put(f.rgb)
        f.depth = jax.device_put(f.depth)

    t0 = time.perf_counter()
    pipe.process_frame(frames[0], 0)
    pipe.trajectory()
    first_frame_s = time.perf_counter() - t0

    for i in range(1, n_warm):
        pipe.process_frame(frames[i], i)
    pipe.flush_frames()
    pipe.trajectory()                      # sync: empty the device queue

    _sync_all(pipe)

    fps, fps_windows, n_timed = _timed_windows(pipe, frames, n_warm, n_bench)

    for i in range(n_warm + n_timed, n_total):
        pipe.process_frame(frames[i], i)
    pipe.flush_frames()
    pipe.mesher.extract(args.resolution,
                        max_std=getattr(args, "max_std", 0.15))
    traj = pipe.trajectory()
    gts = [f.gt_pose for f in frames[:len(traj)]]
    ate = ate_rmse(traj, gts)
    mesh_err = _mesh_abs_sdf_error(pipe.mesher)
    drops = jax.device_get(pipe.tracker.drop_fracs)
    return {"fps": fps, "fps_windows": fps_windows, "ate": float(ate),
            "mesh_err": mesh_err,
            "drop_max": _drop_max(drops),
            "first_frame_s": first_frame_s, "n_frames": n_total}


def run_synth():
    import jax

    from nerf_fusion_tpu.data.synth import SyntheticSequence
    from nerf_fusion_tpu.utils.evaluate import ate_rmse

    pipe, args = _build(REPO / "configs" / "fusion-synth.yaml", None)
    n = N_WARMUP + N_BENCH + 1
    # keep per-frame camera motion identical to the historical 121-frame
    # protocol regardless of BENCH_FRAMES (span scales with frame count)
    seq = SyntheticSequence(n_frames=n, angular_span=1.2 * (n - 1) / 120.0,
                            width=640, height=480)
    frames = [next(seq) for _ in range(n)]
    for i in range(N_WARMUP):
        pipe.process_frame(frames[i], i)
    pipe.flush_frames()
    _sync_all(pipe)
    fps, _, n_timed = _timed_windows(pipe, frames, N_WARMUP, N_BENCH)
    for i in range(N_WARMUP + n_timed, n):
        pipe.process_frame(frames[i], i)
    pipe.flush_frames()
    pipe.mesher.extract(args.resolution,
                        max_std=getattr(args, "max_std", 0.15))
    traj = pipe.trajectory()
    gts = [f.gt_pose for f in frames[:len(traj)]]
    ate = ate_rmse(traj, gts)
    mesh_err = _mesh_abs_sdf_error(pipe.mesher)
    drops = jax.device_get(pipe.tracker.drop_fracs)
    return {"fps": fps, "ate": float(ate), "mesh_err": mesh_err,
            "drop_max": _drop_max(drops)}


def run_recheck():
    """Subprocess mode (BENCH_RECHECK=1): verify the persistent cache now
    serves every big program.  A fresh process has an empty in-memory jit
    cache, so any program the on-disk cache cannot serve shows up as a
    PERSISTENT CACHE MISS here.  Runs one full integrate+mesh cadence per
    bench config so all four BIG_PROGRAMS are exercised.  Prints one JSON
    line {"recheck_misses": [...]}."""
    from nerf_fusion_tpu.data.icl_nuim import ICLNUIMSequence

    misses = _install_miss_counter()
    tq = _ensure_lrkt_data()
    cfgs = [os.environ.get("BENCH_LRKT_CONFIG", "fusion-lr-kt-fast.yaml")]
    if int(os.environ.get("BENCH_PARITY", "1")):
        cfgs.append("fusion-lr-kt.yaml")
    for cfg in dict.fromkeys(cfgs):
        pipe, args = _build(REPO / "configs" / cfg, first_tq=tq)
        seq = ICLNUIMSequence(path=str(LRKT_DATA), start_frame=0,
                              end_frame=-1, first_tq=tq, load_gt=True)
        frames = [next(seq) for _ in range(CADENCE + 1)]
        for i, f in enumerate(frames):
            pipe.process_frame(f, i)
        pipe.flush_frames()
        _sync_all(pipe)
    print(json.dumps({"recheck_misses": sorted(set(misses.misses))}))


def _recheck_cache() -> list:
    """Re-verify the persistent cache in a subprocess; returns its miss
    list (or a sentinel on subprocess failure).

    Why: the round-4 driver bench failed rc=5 because the cache had been
    populated BEFORE the round's final commits changed the traced programs
    — every big program missed once, repopulating the cache as a side
    effect, and the gate (correctly) called the run not-warm.  That stale
    state is self-healing: by the time the gate fires, this very process
    has written the fresh entries.  So on a miss we distinguish the two
    causes: a clean subprocess recheck = the cache was merely stale and is
    now repopulated (pass, recorded as cache_was_stale); misses that
    SURVIVE into a fresh process = cache-key instability across processes
    with identical code (the real bug class) = still rc=5."""
    import subprocess

    env = dict(os.environ, BENCH_RECHECK="1")
    try:
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True, timeout=1200)
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)["recheck_misses"]
        return ["<recheck produced no result>"]
    except Exception as e:          # timeout, json, spawn failure
        return [f"<recheck failed: {type(e).__name__}>"]


def main():
    logging.basicConfig(level=logging.ERROR)
    if os.environ.get("BENCH_RECHECK"):
        run_recheck()
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    # "" disables the cache (utils/cache.py); Path("") is "." which would
    # read as a warm cache.  "Warm" means the big per-frame program is
    # cached (any stray entry counted as warm once and mislabeled a cold
    # compile as a 277 s warm first frame).
    # the per-frame tracked program traces as `_frame_step` (fused_frame_step
    # is a functools.partial over it, so the jit name is `jit__frame_step`)
    cache_warm = bool(cache_dir) and Path(cache_dir).exists() \
        and any(p.name.startswith(("jit__frame_step", "jit_fused_frame_step"))
                for p in Path(cache_dir).iterdir())

    misses = _install_miss_counter()
    only = os.environ.get("BENCH_ONLY", "")
    lrkt = run_lrkt() if only in ("", "lrkt") else None
    # parity workload: the unmodified reference-faithful config, same
    # protocol (skipped if it already IS the headline via BENCH_LRKT_CONFIG)
    run_parity = (only in ("", "parity")
                  and int(os.environ.get("BENCH_PARITY", "1"))
                  and os.environ.get("BENCH_LRKT_CONFIG",
                                     "") != "fusion-lr-kt.yaml")
    parity = run_lrkt("fusion-lr-kt.yaml") if run_parity else None
    synth = run_synth() if only in ("", "synth") else None

    head = lrkt or parity or synth
    out = {
        "metric": ("lrkt_online_fusion_fps_640x480" if lrkt
                   else "online_fusion_fps_640x480"),
        "value": round(head["fps"], 3),
        "unit": "frames/sec",
        "vs_baseline": round(head["fps"] / 10.0, 3),
        "ate_rmse_m": round(head["ate"], 5),
        "mesh_abs_sdf_m": round(head["mesh_err"], 5),
        "box_filter_drop_max": round(head["drop_max"], 5),
        "compile_cache": "warm" if cache_warm else "cold",
    }
    if lrkt:
        out["first_frame_s"] = round(lrkt["first_frame_s"], 2)
        out["fps_windows"] = lrkt["fps_windows"]
        out["fps_best"] = round(max(lrkt["fps_windows"]), 2)
        out["fps_worst"] = round(min(lrkt["fps_windows"]), 2)
    if parity:
        out["parity_fps"] = round(parity["fps"], 3)
        out["parity_fps_windows"] = parity["fps_windows"]
        out["parity_ate_rmse_m"] = round(parity["ate"], 5)
        out["parity_mesh_abs_sdf_m"] = round(parity["mesh_err"], 5)
        out["parity_drop_max"] = round(parity["drop_max"], 5)
        out["parity_first_frame_s"] = round(parity["first_frame_s"], 2)
    if cache_warm:
        out["big_program_cache_misses"] = sorted(set(misses.misses))
    if synth and (lrkt or parity):
        out["synth_fps"] = round(synth["fps"], 3)
        out["synth_ate_rmse_m"] = round(synth["ate"], 5)
        out["synth_mesh_abs_sdf_m"] = round(synth["mesh_err"], 5)

    rc = 0
    checks = []
    if lrkt:
        checks += [("lrkt ate", lrkt["ate"], ATE_GATE),
                   ("lrkt mesh_err", lrkt["mesh_err"], MESH_ERR_GATE),
                   ("lrkt drop", lrkt["drop_max"], DROP_GATE)]
        if lrkt["fps"] < FPS_FLOOR_LRKT:
            print(f"FAIL: lrkt fps {lrkt['fps']:.2f} < floor "
                  f"{FPS_FLOOR_LRKT}", file=sys.stderr)
            rc = 4
        if cache_warm and lrkt["first_frame_s"] > FIRST_FRAME_GATE_S:
            print(f"FAIL: warm-cache first_frame_s "
                  f"{lrkt['first_frame_s']:.1f} > gate "
                  f"{FIRST_FRAME_GATE_S}", file=sys.stderr)
            rc = 5
    if parity:
        checks += [("parity ate", parity["ate"], PARITY_ATE_GATE),
                   ("parity mesh_err", parity["mesh_err"], PARITY_MESH_GATE),
                   ("parity drop", parity["drop_max"], DROP_GATE)]
        if parity["fps"] < FPS_FLOOR_PARITY:
            print(f"FAIL: parity fps {parity['fps']:.2f} < floor "
                  f"{FPS_FLOOR_PARITY}", file=sys.stderr)
            rc = 4
    if cache_warm and misses.misses:
        # the structural first-frame gate: a warm cache must serve every
        # big program.  A miss has two possible causes, and a subprocess
        # recheck (fresh in-memory jit cache against the NOW-repopulated
        # persistent cache) distinguishes them:
        #   stale cache (programs changed after the last populating run —
        #   the round-4 rc=5): this run repopulated it; recheck is clean;
        #   record + pass.
        #   cache-key instability (misses survive into a fresh process
        #   with identical code): the real regression; rc=5.
        recheck = _recheck_cache()
        if recheck:
            print(f"FAIL: warm cache missed big programs "
                  f"{sorted(set(misses.misses))}; misses persist after "
                  f"repopulation: {recheck}", file=sys.stderr)
            rc = 5
        else:
            out["cache_was_stale"] = sorted(set(misses.misses))
            out["big_program_cache_misses"] = []
    if synth:
        checks += [("synth ate", synth["ate"], ATE_GATE),
                   ("synth mesh_err", synth["mesh_err"], MESH_ERR_GATE),
                   ("synth drop", synth["drop_max"], DROP_GATE)]
        if synth["fps"] < FPS_FLOOR_SYNTH:
            print(f"FAIL: synth fps {synth['fps']:.2f} < floor "
                  f"{FPS_FLOOR_SYNTH}", file=sys.stderr)
            rc = 4
    for name, val, gate in checks:
        if not (val == val) or val > gate:   # NaN or above gate
            print(f"FAIL: {name} {val:.5f} exceeds gate {gate}",
                  file=sys.stderr)
            rc = 2
    print(json.dumps(out))
    sys.exit(rc)


if __name__ == "__main__":
    main()
