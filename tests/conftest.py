"""Test env: force JAX onto CPU with 8 virtual devices so sharding semantics
(data-parallel psum, mesh layouts) are exercised without TPU hardware
(SURVEY.md section 4).

Note: this image registers an `axon` TPU platform via sitecustomize and
pins JAX_PLATFORMS=axon in the environment, so the env var alone is not
enough — jax.config.update must override it before any backend is used.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
