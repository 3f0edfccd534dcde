"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver separately compile-checks the TPU path; tests must be hermetic
and hardware-independent, so we force the CPU backend with 8 virtual
devices for sharding tests (see repo prompt / SURVEY.md §7).

NOTE: on hosts with the axon TPU tunnel, a sitecustomize imports jax at
interpreter start, FREEZING env-derived config defaults (JAX_PLATFORMS,
JAX_COMPILATION_CACHE_DIR) before this file runs.  We therefore force the
CPU backend and the cache dir through ``jax.config.update`` below, which
works any time before backend/first-compile.  Set NERF_TESTS_PLATFORM to
override (e.g. ``NERF_TESTS_PLATFORM=axon`` to run the suite through the
tunnel on the real chip).

NOTE: an explicitly-set JAX_COMPILATION_CACHE_DIR is REWRITTEN below to
`<dir>-<machine_tag>` (XLA:CPU AOT artifacts bake in host CPU features; a
cache moved across hosts can SIGILL).  The effective directory is printed
at collection time — inspect/clean THAT path, not the one you passed.
"""

import hashlib
import os
import platform
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _machine_tag() -> str:
    """XLA:CPU AOT artifacts bake in host machine features; a cache built
    on a different host spams feature-mismatch warnings and can SIGILL
    (same issue __graft_entry__._dryrun_cache_dir fixes for the dryrun).
    Key the test cache by a cpu-model+flags fingerprint."""
    try:
        cpuinfo = Path("/proc/cpuinfo").read_text()
        lines = [l for l in cpuinfo.splitlines()
                 if l.startswith(("model name", "flags"))]
        return hashlib.sha256(("\n".join(sorted(set(lines)))
                               + platform.machine()).encode()).hexdigest()[:12]
    except OSError:
        return platform.machine()


# Persistent compile cache: compiles dominate test time on this host.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = \
        f"/root/.jax_cache_tests-{_machine_tag()}"
elif os.environ.get("JAX_PLATFORMS") == "cpu" \
        and os.environ["JAX_COMPILATION_CACHE_DIR"]:
    # explicit dirs (CI recipes pass /root/.jax_cache_cpu) get keyed too,
    # so a host change invalidates instead of SIGILL-ing
    base = os.environ["JAX_COMPILATION_CACHE_DIR"].rstrip("/")
    tag = _machine_tag()
    if not base.endswith(tag):
        os.environ["JAX_COMPILATION_CACHE_DIR"] = f"{base}-{tag}"
        # make the redirection visible so recipes clean the right dir
        print(f"[conftest] JAX_COMPILATION_CACHE_DIR rewritten to "
              f"{os.environ['JAX_COMPILATION_CACHE_DIR']} (machine-keyed)",
              file=sys.stderr)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be imported (axon sitecustomize preload) with config
# defaults frozen from the pre-pytest environment — push the hermetic
# test configuration onto the LIVE config.  XLA_FLAGS above still works
# because it is read at backend initialization, which hasn't happened.
_platform = os.environ.get("NERF_TESTS_PLATFORM", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
os.environ["JAX_PLATFORMS"] = _platform
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"] or None)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
