"""Root pytest config: force the CPU backend with a virtual 8-device mesh.

Tests never touch the real TPU (SURVEY.md §4): sharding logic is validated on
`--xla_force_host_platform_device_count=8` CPU devices; the axon TPU tunnel
(ambient JAX_PLATFORMS=axon) has multi-second per-dispatch latency and must
not be used for unit tests.

IMPORTANT platform quirk: the axon sitecustomize hook imports jax at
interpreter startup, so os.environ tweaks here are TOO LATE for env-read
configs. `jax.config.update` still works because the backend itself is not
initialized until first use — so that is the mechanism we use. XLA_FLAGS is
read at backend init (later), so setting it here is still effective.
"""

import os
import sys

# Opt-in DEVICE test tier: GPSLAM_DEVICE_TESTS=1 keeps the ambient (TPU)
# backend so tests marked `device` can execute compiled Pallas kernels on
# real hardware (§5.2 interpret-vs-compiled sanitizer). Default: CPU pin.
_DEVICE_TESTS = os.environ.get("GPSLAM_DEVICE_TESTS", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup on purpose)

if not _DEVICE_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
    jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the suite: late in a full session the
# jax cache WRITE path (put_executable_and_time -> executable serialization)
# segfaults deterministically (observed twice at the same test with a fresh
# cache dir, 2026-08-21; all four native/ libs ASan-clean on the suite's
# inputs, and the same test+write passes in isolation — a jaxlib
# serialization issue under accumulated process state, not a library bug).
# The suite therefore compiles fresh each run; bench/ and example scripts
# keep their own /tmp/jax_cache (single large programs, no issue observed).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(__file__))
