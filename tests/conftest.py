"""Test harness config: run everything on a simulated 8-device CPU mesh.

Must set the env before jax is imported anywhere (SURVEY.md §4: multi-device
tests use xla_force_host_platform_device_count on CPU so no TPU is needed).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
