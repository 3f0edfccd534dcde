"""Persistent XLA compile-cache default for the CLI entry points.

The fused per-frame program compiles in minutes on a tunneled TPU (and
tens of seconds locally); without a persistent cache every process pays
it again — the round-2/3 cold-start analysis (PROGRESS.md) found cache
reuse is the whole cold-start story.  Entry points call
``enable_compile_cache()`` so plain ``python main.py …`` benefits;
an explicit ``JAX_COMPILATION_CACHE_DIR`` (or ``=""`` to disable) wins.
"""

from __future__ import annotations

import hashlib
import os
import platform
from pathlib import Path


def _machine_tag() -> str:
    """cpu-model+flags fingerprint: XLA:CPU AOT artifacts bake in host
    machine features, and loading a cache built on a different host spams
    feature-mismatch warnings with SIGILL risk."""
    try:
        cpuinfo = Path("/proc/cpuinfo").read_text()
        lines = [l for l in cpuinfo.splitlines()
                 if l.startswith(("model name", "flags"))]
        return hashlib.sha256(("\n".join(sorted(set(lines)))
                               + platform.machine()).encode()).hexdigest()[:12]
    except OSError:
        return platform.machine()


def _apply_to_jax_config(cache: str | None) -> None:
    """Set the cache dir on the live jax config, not just the env.

    On axon-tunnel hosts a sitecustomize imports jax at interpreter
    start, which FREEZES every env-derived config default before any
    entry point runs — `os.environ["JAX_COMPILATION_CACHE_DIR"] = ...`
    set afterwards is silently dead and no cache entry is ever written
    (root-caused round 4: the fingerprinted dir stayed empty across
    bench runs while first_frame_s read 250-630 s).  config.update works
    at any point before the first compile.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache or None)
    if cache:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 0.0)))


def enable_compile_cache(path: str | None = None) -> str:
    """Set the persistent compile-cache dir if unset; returns the active dir.

    Must run before the first compile.  An empty-string env value
    disables the cache.  The default dir is keyed by a machine
    fingerprint so a host change invalidates the cache instead of
    loading foreign CPU AOT code.  Sets both the env var (for child
    processes) and the live jax config (the env var alone is dead when
    jax was preloaded — see _apply_to_jax_config).
    """
    existing = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if existing is not None:
        _apply_to_jax_config(existing)
        return existing
    cache = path or os.path.join(
        os.environ.get("XDG_CACHE_HOME", str(Path.home() / ".cache")),
        "nerf_fusion_tpu", f"jax-{_machine_tag()}")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        # read-only HOME / sandboxed deploys: run uncached rather than
        # failing at entry-point import time
        return ""
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
    # cache even sub-second compiles: ~38 tiny helper jits sit under the
    # old 0.5 s floor and re-compile every process at ~0.5 s each through
    # the tunnel (measured round 4: ~19 s of a warm first frame)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
    _apply_to_jax_config(cache)
    return cache
