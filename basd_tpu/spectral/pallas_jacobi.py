"""Pallas TPU kernel: VMEM-resident batch-parallel cyclic Jacobi eigh.

The pure-JAX formulation in `basd_tpu.spectral.jacobi` is HBM-bound: every
parallel Jacobi step reads and writes the full (B, n, n) batch from HBM
(~10 passes/step x ~1000 steps). This kernel keeps A and the eigenvector
accumulator V in VMEM for the entire iteration — HBM traffic is one load
and one store — and performs the half-shift pair rotations with VPU
slice/broadcast arithmetic (no gathers, no flips, no MXU).

Shares the step math (`pair_rotations`, `apply_rows`, `apply_cols`,
`rotate_positions`) with `jacobi.py`; validated against it and LAPACK.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basd_tpu.spectral.jacobi import (
    _sort_desc,
    _strip_pad,
    apply_rows,
    diag_of,
    pair_rotations,
    rotate_positions,
)


def _jacobi_kernel(steps: int, a_in_ref, w_ref, vt_ref, a_ref, vs_ref):
    """Mosaic-friendly formulation: lane-dimension splits/concats compile
    pathologically, so every pair operation works on the SUBLANE axis and
    column updates go through transposes (A stays symmetric throughout):

        A'  = J^T A J  = rows(swap(rows(A)))      [rows(X) = J^T X]
        A'' = P A' P^T = rows_perm(swap(rows_perm(A')))

    The eigenvector accumulator is kept TRANSPOSED (VT = V^T), so its
    column update V J and column permutation become row operations."""
    b, n, _ = a_in_ref.shape
    a_ref[:] = a_in_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row == col).astype(jnp.float32)
    vs_ref[:] = jnp.broadcast_to(eye, (b, n, n))

    def body(_, carry):
        a = a_ref[:]
        vt = vs_ref[:]
        c, s = pair_rotations(a)
        a = apply_rows(jnp.swapaxes(apply_rows(a, c, s), 1, 2), c, s)
        a = rotate_positions(
            jnp.swapaxes(rotate_positions(a, 1), 1, 2), 1
        )
        a_ref[:] = a
        # VT' = J^T VT, then row permutation (= column permutation of V)
        vs_ref[:] = rotate_positions(apply_rows(vt, c, s), 1)
        return carry

    jax.lax.fori_loop(0, steps, body, 0)

    w_ref[:] = diag_of(a_ref[:])[:, None, :]  # (chunk, 1, n) block layout
    vt_ref[:] = vs_ref[:]


def _jacobi_eigvals_kernel(steps: int, a_in_ref, w_ref, a_ref):
    """Eigenvalues-only variant (no eigenvector accumulation) — used by the
    Marchenko-Pastur rank, which needs the full spectrum but no basis."""
    a_ref[:] = a_in_ref[:]

    def body(_, carry):
        a = a_ref[:]
        c, s = pair_rotations(a)
        a = apply_rows(jnp.swapaxes(apply_rows(a, c, s), 1, 2), c, s)
        a_ref[:] = rotate_positions(
            jnp.swapaxes(rotate_positions(a, 1), 1, 2), 1
        )
        return carry

    jax.lax.fori_loop(0, steps, body, 0)
    w_ref[:] = diag_of(a_ref[:])[:, None, :]  # (chunk, 1, n) block layout


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def pallas_jacobi_eigvals(
    a: jax.Array, *, sweeps: int = 9, interpret: bool = False
) -> jax.Array:
    """Eigenvalues (ascending, eigvalsh-compatible) of (..., n, n)."""
    batch_shape = a.shape[:-2]
    n0 = a.shape[-1]
    a = a.reshape((-1, n0, n0)).astype(jnp.float32)
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    n = n0 + (n0 % 2)
    if n != n0:
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1)))

    b = a.shape[0]
    chunk = _chunk_batch(b, n)
    pad_b = (-b) % chunk
    if pad_b:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad_b, n, n))]
        )
    bp = a.shape[0]
    kernel = partial(_jacobi_eigvals_kernel, (n - 1) * sweeps)
    w = pl.pallas_call(
        kernel,
        grid=(bp // chunk,),
        out_shape=jax.ShapeDtypeStruct((bp, 1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((chunk, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, n, n), jnp.float32)],
        interpret=interpret,
    )(a)
    w = jnp.sort(w[:b, 0], axis=-1)
    if n != n0:
        # the padded direction contributes exactly one zero eigenvalue;
        # remove one zero (the smallest-|.| entry)
        drop = jnp.argmin(jnp.abs(w), axis=-1)
        keep = jnp.arange(n)[None, :] != drop[:, None]
        order = jnp.argsort(~keep, axis=-1, stable=True)[:, :n0]
        w = jnp.take_along_axis(w, order, axis=-1)
        w = jnp.sort(w, axis=-1)
    return w.reshape(*batch_shape, n0)


# VMEM budget per grid program: ~10 live (chunk, n, n) fp32 buffers —
# DOUBLE-BUFFERED input and eigenvector-output blocks (Mosaic pipelines
# grid steps), 2 scratch accumulators, and ~2 step temporaries (the
# rotated copies of A and V inside the loop body) — must fit the 16 MB
# scoped-vmem stack. The old per-buffer-only budget OOM'd at n=200
# (Table-1 subspace_k): 17.6 MB requested vs the 16 MB limit, and a
# 7-buffer model still left 16.9 MB — the double buffering is real.
_VMEM_BYTES_BUDGET = 12_000_000
_LIVE_BUFFERS = 10


def _chunk_batch(b: int, n: int) -> int:
    max_chunk = max(1, _VMEM_BYTES_BUDGET // (n * n * 4 * _LIVE_BUFFERS))
    if b <= max_chunk:
        return b
    # spread the batch evenly over the fewest grid steps instead of taking
    # max_chunk directly: chunk=46 on a 48-batch would pad to 92 matrices
    # (measured +2.7 ms on the headline step) — chunk=24 pads to zero.
    n_chunks = -(-b // max_chunk)
    return -(-b // n_chunks)


def _pallas_eigh_raw(a: jax.Array, sweeps: int, interpret: bool):
    b, n, _ = a.shape
    chunk = _chunk_batch(b, n)
    pad = (-b) % chunk
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))]
        )
    bp = a.shape[0]
    kernel = partial(_jacobi_kernel, (n - 1) * sweeps)
    w, vt = pl.pallas_call(
        kernel,
        grid=(bp // chunk,),
        out_shape=(
            jax.ShapeDtypeStruct((bp, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n, n), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((chunk, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, n, n), jnp.float32),
            pltpu.VMEM((chunk, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(a)
    return w[:b, 0], vt[:b]


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def pallas_jacobi_eigh(
    a: jax.Array, *, sweeps: int = 9, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """eigh of (..., n, n) symmetric batches, descending eigenvalues.

    Odd n is padded internally; use `interpret=True` for CPU testing.
    """
    batch_shape = a.shape[:-2]
    n0 = a.shape[-1]
    a = a.reshape((-1, n0, n0)).astype(jnp.float32)
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    n = n0 + (n0 % 2)
    if n != n0:
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1)))

    w, vt = _pallas_eigh_raw(a, sweeps, interpret)
    v = jnp.swapaxes(vt, -1, -2)  # kernel returns V^T

    if n != n0:
        w, v = _strip_pad(w, v, n0)
    w, v = _sort_desc(w, v)
    return w.reshape(*batch_shape, n0), v.reshape(*batch_shape, n0, n0)
