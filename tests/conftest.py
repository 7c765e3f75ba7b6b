"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip TPU hardware is not available in CI; per SURVEY.md §4.2(5) all
sharding tests run the same SPMD program on a virtual 8-device CPU mesh.
Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize registers the TPU tunnel and overrides
# jax_platforms at import time — env alone is NOT enough; force it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: first runs compile (~minutes on 2 CPUs),
# subsequent test runs reuse the compiled executables.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
