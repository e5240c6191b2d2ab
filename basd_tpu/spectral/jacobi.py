"""Batch-vectorized cyclic Jacobi symmetric eigensolver.

XLA's TPU eigh lowers to a QR-style algorithm that serializes over the
batch (~1.1 ms per 192x192 matrix measured on v5e) — it dominated the BASD
step. This solver runs ALL matrices of the batch simultaneously: one
parallel-order Jacobi step rotates n/2 disjoint pairs in every matrix with
pure slice / broadcast arithmetic on the VPU — no gathers, no scatters, no
flips, no matmuls, exact fp32.

Pairing scheme ("half-shift" round-robin): positions are paired (i, i+h)
with h = n/2, so the paired rows/columns are the CONTIGUOUS top and bottom
halves — rotations vectorize as elementwise combinations of the two halves.
The inter-step permutation that makes every pair meet exactly once per
sweep of n-1 steps (the classic circle tournament, relabeled for half-shift
pairing) is

    new = [x_0, x_h, x_1..x_{h-2}, x_{h+1}..x_{n-1}, x_{h-1}]

i.e. five static contiguous slices + concat.

Two backends share this math:
  * `jacobi_eigh` — pure JAX (lax.fori_loop); arrays round-trip HBM.
  * `basd_tpu.spectral.pallas_jacobi.pallas_jacobi_eigh` — Pallas kernel
    that keeps A and V in VMEM across all sweeps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def rotate_positions(x: jax.Array, axis: int) -> jax.Array:
    """Half-shift round-robin permutation along `axis` (see module doc)."""
    n = x.shape[axis]
    h = n // 2
    sl = lambda lo, hi: jax.lax.slice_in_dim(x, lo, hi, axis=axis)
    return jnp.concatenate(
        [sl(0, 1), sl(h, h + 1), sl(1, h - 1), sl(h + 1, n), sl(h - 1, h)],
        axis=axis,
    )


def diag_of(a: jax.Array) -> jax.Array:
    """(B, n, n) -> (B, n) main diagonal via iota-mask reduce."""
    n = a.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(a * (row == col).astype(a.dtype), axis=-1)


def pair_rotations(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Jacobi (c, s) (B, h) for the half-shift pairs (i, i+h)."""
    n = a.shape[-1]
    h = n // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = diag_of(a)
    # a[i, i+h]: the diagonal of the upper-right block
    off = jnp.sum(a * (col - row == h).astype(a.dtype), axis=-1)  # (B, n)
    app = d[:, :h]
    aqq = d[:, h:]
    apq = off[:, :h]

    safe = jnp.abs(apq) > 1e-30
    tau = (aqq - app) / jnp.where(safe, 2.0 * apq, 1.0)
    sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(safe, c, 1.0)
    s = jnp.where(safe, s, 0.0)
    return c, s


def apply_rows(a: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    """row_i' = c row_i - s row_{i+h}; row_{i+h}' = s row_i + c row_{i+h}."""
    h = a.shape[1] // 2
    top = jax.lax.slice_in_dim(a, 0, h, axis=1)
    bot = jax.lax.slice_in_dim(a, h, 2 * h, axis=1)
    cc = c[:, :, None]
    ss = s[:, :, None]
    return jnp.concatenate([cc * top - ss * bot, ss * top + cc * bot], axis=1)


def apply_cols(a: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    h = a.shape[2] // 2
    left = jax.lax.slice_in_dim(a, 0, h, axis=2)
    right = jax.lax.slice_in_dim(a, h, 2 * h, axis=2)
    cc = c[:, None, :]
    ss = s[:, None, :]
    return jnp.concatenate(
        [cc * left - ss * right, ss * left + cc * right], axis=2
    )


def jacobi_step(a: jax.Array, v: jax.Array) -> tuple[jax.Array, jax.Array]:
    c, s = pair_rotations(a)
    a = apply_cols(apply_rows(a, c, s), c, s)
    v = apply_cols(v, c, s)
    a = rotate_positions(rotate_positions(a, 1), 2)
    v = rotate_positions(v, 2)
    return a, v


def _sort_desc(w: jax.Array, v: jax.Array) -> tuple[jax.Array, jax.Array]:
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(
        v, jnp.broadcast_to(order[:, None, :], v.shape), axis=-1
    )
    return w, v


def _strip_pad(w, v, n0):
    """Drop the decoupled padding direction (eigenvalue 0, vector e_n)."""
    n = w.shape[-1]
    pad_idx = jnp.argmax(jnp.abs(v[:, n0, :]), axis=-1)
    keep = jnp.arange(n)[None, :] != pad_idx[:, None]
    order0 = jnp.argsort(~keep, axis=-1, stable=True)[:, :n0]
    w = jnp.take_along_axis(w, order0, axis=-1)
    v = jnp.take_along_axis(
        v[:, :n0, :], order0[:, None, :].repeat(n0, axis=1), axis=-1
    )
    return w, v


@partial(jax.jit, static_argnames=("sweeps", "sort"))
def jacobi_eigh(
    a: jax.Array, *, sweeps: int = 10, sort: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Symmetric eigendecomposition of (..., n, n), batch-parallel.

    Returns (eigvals, eigvecs) with eigvecs[..., :, i] the i-th
    eigenvector; descending eigenvalue order when sort=True. Odd n is
    padded internally (the pad direction decouples exactly).
    """
    batch_shape = a.shape[:-2]
    n0 = a.shape[-1]
    a = a.reshape((-1, n0, n0)).astype(jnp.float32)
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5

    n = n0 + (n0 % 2)
    if n != n0:
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1)))

    b = a.shape[0]
    v = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (b, n, n))

    a, v = jax.lax.fori_loop(
        0, (n - 1) * sweeps, lambda _, carry: jacobi_step(*carry), (a, v)
    )

    w = diag_of(a)
    if n != n0:
        w, v = _strip_pad(w, v, n0)
    if sort:
        w, v = _sort_desc(w, v)
    return (
        w.reshape(*batch_shape, n0),
        v.reshape(*batch_shape, n0, n0),
    )
