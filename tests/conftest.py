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

# Persistent compilation cache: the suite is compile-dominated (tiny models,
# many distinct jitted programs, ONE host core); cached XLA binaries make
# repeat runs start warm (measured 172 s -> 30 s on test_models.py). Safe to
# share — entries are keyed by HLO+flags. Repo-local so it travels with the
# checkout (gitignored).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
