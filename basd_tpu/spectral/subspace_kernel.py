"""Whole subspace iteration as ONE Pallas kernel (TPU, forward-only).

`spectral.ops.topk_basis_gram` runs g_iters x (one Gram multiply + a
polar-orthonormalization inner loop) as ~170 separate XLA kernels. Each
matmul is tiny ((D, D) @ (D, K) at D=384, K~200, batched over L~13
teacher layers — microseconds of MXU), so the stage is LAUNCH-latency
bound: measured 21 ms of the Table-1 selector forward while the math is
~2 ms of fp32 MXU work. Here the ENTIRE iteration runs VMEM-resident in
one pallas_call: per grid step one layer's Gram (D, D) and iterate
(D, K) stay in VMEM through all g_iters x polar_iters updates; only the
final iterate V and the Rayleigh-Ritz operand R = V^T G V leave the
kernel. The small (K, K) eigh + basis rotation stay on the existing
(Pallas-Jacobi / XLA) path outside.

Scope: GRADIENT-FREE callers only (the teacher-side statistics of the
Grassmannian selector, which the reference computes under `no_grad` —
`/root/reference/src/losses/layer_selector.py:69`). The kernel defines
no VJP; the student-side (differentiated) extraction keeps the XLA
unrolled iteration so autodiff applies unchanged.

Numerics: same recurrence as `topk_basis_gram` (Frobenius-normalized
Gram powers, Newton-Schulz polar inner loop), but matmuls run in full
fp32 inside the kernel where the XLA path uses bf16x3 data-side
precision — strictly tighter, parity-tested against the XLA oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))  # (a, b) @ (b, c)
_TT = (((0,), (0,)), ((), ()))  # contract leading dims: (m, a), (m, b) -> (a, b)


def _frob(a):
    return jnp.sqrt(jnp.sum(a * a))


def _subspace_kernel(g_ref, v0_ref, v_ref, r_ref, *, g_iters, polar_iters):
    g = g_ref[0, :, :]
    tiny = np.float32(np.finfo(np.float32).tiny)
    gn = g / jnp.maximum(_frob(g), tiny)
    v = v0_ref[:, :]
    mm = lambda a, b, dims=_MM: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32
    )
    for _ in range(g_iters):
        v = mm(gn, v)
        # Newton-Schulz polar orthonormalization (ops._polar_orthonormalize)
        x = v / jnp.maximum(_frob(v), tiny)
        for _ in range(polar_iters):
            c = mm(x, x, _TT)
            x = 1.5 * x - 0.5 * mm(x, c)
        v = x
    v_ref[0, :, :] = v
    # Rayleigh-Ritz operand on the ORIGINAL-scale Gram
    r_ref[0, :, :] = mm(v, mm(g, v), _TT)


def subspace_iterate(
    g: jax.Array,  # (L, D, D) fp32 centered Grams
    *,
    k: int,
    g_iters: int = 6,
    polar_iters: int = 14,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused subspace iteration: returns (V (L, D, k) orthonormal iterate,
    R (L, k, k) Rayleigh-Ritz operand V^T G V). Deterministic start: the
    same fixed numpy Gaussian as `topk_basis_gram`."""
    l, d, _ = g.shape
    v0 = np.asarray(
        np.random.default_rng(20_240_601).standard_normal((d, k)),
        np.float32,
    )
    slab = lambda *shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _subspace_kernel, g_iters=g_iters, polar_iters=polar_iters
        ),
        grid=(l,),
        in_specs=[slab(d, d), const],
        out_specs=(slab(d, k), slab(k, k)),
        out_shape=(
            jax.ShapeDtypeStruct((l, d, k), jnp.float32),
            jax.ShapeDtypeStruct((l, k, k), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * l * (
                g_iters * (d * d * k + polar_iters * 2 * d * k * k)
                + d * d * k + d * k * k
            ),
            bytes_accessed=4 * l * (d * d + d * k + k * k) + 4 * d * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g.astype(jnp.float32), v0)
