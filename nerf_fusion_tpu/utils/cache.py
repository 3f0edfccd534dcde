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


def enable_compile_cache(path: str | None = None) -> str:
    """Set JAX_COMPILATION_CACHE_DIR if unset; returns the active dir.

    Must run before jax initializes its backends (i.e. at entry-point
    import time).  An empty-string env value disables the cache.  The
    default dir is keyed by a machine fingerprint so a host change
    invalidates the cache instead of loading foreign CPU AOT code.
    """
    existing = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if existing is not None:
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
    # deserialize even quick compiles: the fused programs are many and the
    # default 1s floor skips some of them
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    return cache
