"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver separately compile-checks the TPU path; tests must be hermetic
and hardware-independent, so we force the CPU backend with 8 virtual
devices for sharding tests (see repo prompt / SURVEY.md §7).

NOTE: on hosts with the axon TPU tunnel, a sitecustomize force-registers
the TPU platform before this file runs and overrides JAX_PLATFORMS; tests
still pass there (they are platform-agnostic) but run through the tunnel.
For fast genuinely-local runs invoke pytest as:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache_cpu python -m pytest tests/ -q
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compile cache: compiles dominate test time on this host.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
