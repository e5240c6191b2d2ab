"""Fused Newton-Schulz pair square root as ONE Pallas kernel (TPU,
forward-only).

`spectral.ops._nuc_pg_fwd` (the Procrustes nuclear-norm forward on
token-side Grams) runs W = G_t G_s followed by the scheduled quintic
(Y, Z) iteration — ~29 batched (B, N, N) matmuls, each round-tripping a
~40 MB fp32 tensor through HBM at the Table-1 shape (B=256, N=197):
~3.4 GB of pure iteration traffic per extraction point. Here each batch
slab's (N, N) pair stays VMEM-resident through the whole schedule; HBM
sees one read of (G_s, G_t) and one write of (value, Z).

Forward-only: `nuclear_norm_pair_gram`'s custom VJP consumes only the
saved Z (dL/dG_s = g/2 G_t Z^T, dL/dG_t = g/2 Z^T G_s — two matmuls in
XLA), so the kernel needs no gradient rules of its own.

Numerics: matmuls in full fp32 (the XLA path runs bf16x3 `HIGH`, the
schedule's validated floor — see ops._NS); the per-sample Frobenius
scale and the trace-of-Y value are computed exactly as in
`ops._ns_sqrt_pair` / `_nuc_pg_fwd`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BMM = (((2,), (1,)), ((0,), (0,)))  # (G, N, N) @ (G, N, N)


def _ns_pair_kernel(gs_ref, gt_ref, val_ref, z_ref, *, sched):
    gs = gs_ref[:, :, :]
    gt = gt_ref[:, :, :]
    n = gs.shape[-1]
    mm = lambda a, b: jax.lax.dot_general(
        a, b, _BMM, preferred_element_type=jnp.float32
    )
    w = mm(gt, gs)
    tiny = np.float32(np.finfo(np.float32).tiny)
    scale = jnp.maximum(
        jnp.sqrt(jnp.sum(w * w, axis=(1, 2), keepdims=True)), tiny
    )  # (G, 1, 1)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)[None, :, :]
    y = w / scale
    z = jnp.broadcast_to(eye, y.shape)
    for ca, cb, cc in sched:
        m = mm(z, y)
        t = ca * eye + cb * m + cc * mm(m, m)
        y = mm(y, t)
        z = mm(t, z)
    rs = jnp.sqrt(scale)
    val_ref[:, :, :] = rs * jnp.sum(y * eye, axis=(1, 2), keepdims=True)
    z_ref[:, :, :] = z / rs


def _pick_group(b: int, n: int) -> int:
    n_pad = -(-n // 8) * 8 * max(128, -(-n // 128) * 128)
    for g in (16, 8, 4, 2):
        if b % g == 0 and 7 * g * n_pad * 4 <= 48 * 1024 * 1024:
            return g
    return 1


def ns_sqrt_pair_fused(
    g_s: jax.Array,  # (B, N, N) fp32
    g_t: jax.Array,  # (B, N, N) fp32
    sched: tuple,  # scheduled quintic coefficients ((ca, cb, cc), ...)
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused `value, Z = nuclear-norm-pair forward` on token-side Grams.

    Returns (value (B,) = tr((G_t G_s)^1/2) per sample, z_scaled
    (B, N, N) ~ W^-1/2 / sqrt(scale) — exactly the residual
    `ops._nuc_pg_fwd` saves for its VJP)."""
    b, n, _ = g_s.shape
    g = _pick_group(b, n)
    slab = pl.BlockSpec((g, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    one = pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    steps = len(sched)
    val, z = pl.pallas_call(
        functools.partial(_ns_pair_kernel, sched=tuple(sched)),
        grid=(b // g,),
        in_specs=[slab, slab],
        out_specs=(one, slab),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * n * (1 + 4 * steps),
            bytes_accessed=4 * b * n * n * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g_s.astype(jnp.float32), g_t.astype(jnp.float32))
    return val[:, 0, 0], z
