"""Exact-to-float32 GELU built from tanh — speed of the tanh
approximation, accuracy of the erf form.

XLA:TPU's `erf` lowering costs ~2 ms per teacher MLP at the Table-1
shape while `tanh` is completely hidden under the surrounding matmuls
(measured: fc1+gelu+fc2 5.30 ms with erf, 3.29 with tanh, 3.28 with no
activation at all — tools/probe_teacher_block.py --gelu). This module
removes the erf without changing the function: over u = x/sqrt(2),

    erf(u) = tanh(u * p(u^2)),   p = arctanh(erf(u))/u,

and p is smooth enough that a degree-6 polynomial in u^2 (fitted by
Lawson-reweighted least squares against the exact transform, evaluation
clamped to the fit domain |u| <= 4.1 where fp32 erf saturates to 1)
reproduces erf to a MAX ABSOLUTE ERROR OF 5.9e-8 over the whole real
line — below fp32 erf's own ~1e-7 contract and far below every
activation-parity tolerance in the test suite (tightest: 2e-6). This is
a reformulation of exact GELU, not the 'tanh approximation'
(`approximate=True` errs by 4.7e-4, breaking torch-twin parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# minimax-weighted fit of arctanh(erf(u))/u in powers of u^2 on (0, 4.1]
_ERF_TANH_COEFFS = (
    1.1283797082e+00,
    1.0276546091e-01,
    -1.8434706149e-04,
    -6.2574204306e-04,
    8.9717479892e-05,
    -5.9858931799e-06,
    1.5893671136e-07,
)
_U_CLAMP = 4.1  # erf(4.1) == 1.0 at fp32; tanh arg at the clamp is 9.8
_INV_SQRT2 = 0.7071067811865476


def erf_via_tanh(u: jax.Array) -> jax.Array:
    """erf(u) to 5.9e-8 absolute, as one tanh + 7-term Horner chain."""
    uc = jnp.clip(u, -_U_CLAMP, _U_CLAMP)
    t = uc * uc
    s = jnp.full_like(uc, _ERF_TANH_COEFFS[-1])
    for c in _ERF_TANH_COEFFS[-2::-1]:
        s = s * t + c
    return jnp.tanh(uc * s)


def gelu(x: jax.Array) -> jax.Array:
    """Exact GELU x * Phi(x) with the erf computed via `erf_via_tanh`.

    Math in fp32, result cast back to the input dtype — identical
    precision contract to `nn.gelu(x, approximate=False)` on a bf16
    tensor, at the cost of a tanh instead of an erf."""
    xf = x.astype(jnp.float32)
    phi = 0.5 * (1.0 + erf_via_tanh(xf * np.float32(_INV_SQRT2)))
    return (xf * phi).astype(x.dtype)
