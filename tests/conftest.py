"""Test harness config: run everything on a simulated 8-device CPU mesh
(SURVEY.md §4: multi-device tests use xla_force_host_platform_device_count
so no TPU is needed).

jax is already imported by the jaxtyping pytest plugin before this conftest
runs, and jax binds env-derived config at import — so we must go through
jax.config.update, not os.environ. XLA_FLAGS is still read lazily at
backend init, which has not happened yet at collection time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# BCP_TEST_TPU=1 keeps the real backend so the TPU-gated Pallas
# exactness tests (test_conv3d.py::test_pallas_*_on_tpu,
# test_scatter_pallas.py) actually run on hardware; default is the
# 8-virtual-device CPU mesh.
if os.environ.get("BCP_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

# Persistent compile cache: the 3D-model compiles dominate suite runtime
# (single-core CI hosts especially); cache everything non-trivial.
jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_test_cache")
# Persist nearly everything: deserializing an entry is milliseconds, so
# even 0.1 s compiles are worth caching on this host; only the per-op
# eager dispatches (untraceably many, sub-0.05 s) stay uncached.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
