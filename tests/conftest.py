"""Test env: force JAX onto CPU with 8 virtual devices so sharding semantics
(data-parallel psum, mesh layouts) are exercised without TPU hardware
(SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
