"""Determinism & debugging configuration (SURVEY.md 5.2).

JAX is deterministic by construction (explicit PRNG threading replaces the
reference's `torch.manual_seed` + nondeterministic `cudnn.benchmark=True`,
`src/train.py:74-77`). This module centralizes the debug switches:

  * NaN debugging (`jax_debug_nans`)
  * disabling optimizations for numerical triage
  * x64 escape hatch for CPU-side verification
"""

from __future__ import annotations

import jax


def configure_debug(
    *,
    nan_checks: bool = False,
    disable_jit: bool = False,
    verbose_compiles: bool = False,
) -> None:
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    if verbose_compiles:
        jax.config.update("jax_log_compiles", True)
