"""Eigenvalues-only Marchenko-Pastur rank via Householder tridiagonalization
plus Sturm-sequence bisection.

The MP rank (reference `layer_selector.py:8-20`) needs only two scalar
functions of the spectrum — the median eigenvalue and a count above a
threshold — never the eigenvalues themselves. The cyclic Jacobi eigvals
kernel pays ~(n-1)*sweeps steps of ~9 full n^2 passes (~54 n^3 elementwise
ops at the tuned 6 sweeps); one-shot Householder reduction to tridiagonal
form costs ~4 n^3 (n masked rank-2 updates), after which BOTH scalar
queries are O(n)-per-shift Sturm counts:

  * count(eig < x) = #sign-agreements in d_i = (a_i - x) - b_{i-1}^2/d_{i-1}
  * the median = the ceil(n/2)-th smallest eigenvalue pair, located by
    multi-shift bracketing (S parallel shifts per round, R rounds =>
    interval width (hi-lo)/S^R, fp32-exhaustive in 3 rounds), then
    averaged (numpy median semantics, matching `jnp.median` in
    `spectral/ops.marchenko_pastur_rank`).

Everything is batched over the leading axes and static-shape (masked
full-length Householder vectors), so it jits into one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_F32 = jnp.float32


def householder_tridiag(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched reduction of symmetric (..., n, n) to tridiagonal form.

    Returns (diag (..., n), offdiag (..., n-1)) with the same eigenvalues
    as `a` (orthogonal similarity; backward-stable in fp32).
    """
    batch_shape = a.shape[:-2]
    n = a.shape[-1]
    a = a.reshape((-1, n, n)).astype(_F32)
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    b = a.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def step(k, a):
        # Householder vector for column k, masked to rows > k
        col = a[:, :, k]  # (B, n)
        mask = (idx > k).astype(_F32)  # rows k+1..n-1
        x = col * mask
        xnorm2 = jnp.sum(x * x, axis=-1, keepdims=True)
        xnorm = jnp.sqrt(xnorm2)
        head = jnp.sum(jnp.where(idx == k + 1, col, 0.0), axis=-1,
                       keepdims=True)  # x_{k+1}
        sgn = jnp.where(head >= 0.0, 1.0, -1.0)
        alpha = -sgn * xnorm
        v = x - jnp.where(idx == k + 1, alpha, 0.0)
        vtv = jnp.sum(v * v, axis=-1, keepdims=True)
        tau = jnp.where(vtv > 0.0, 2.0 / jnp.where(vtv > 0.0, vtv, 1.0), 0.0)

        # symmetric rank-2 update: A <- A - v u^T - u v^T
        p = tau * jnp.einsum("bij,bj->bi", a, v,
                             preferred_element_type=_F32)  # (B, n)
        k2 = 0.5 * tau * jnp.sum(p * v, axis=-1, keepdims=True)
        u = p - k2 * v
        return a - v[:, :, None] * u[:, None, :] - u[:, :, None] * v[:, None, :]

    a = jax.lax.fori_loop(0, n - 2, step, a)
    diag = jnp.einsum("bii->bi", a)
    off = jnp.einsum("bii->bi", a[:, 1:, :-1])  # a[i+1, i]
    return (
        diag.reshape(*batch_shape, n),
        off.reshape(*batch_shape, n - 1),
    )


def sturm_count(
    diag: jax.Array,  # (..., n)
    off2: jax.Array,  # (..., n-1) SQUARED off-diagonals
    shifts: jax.Array,  # (..., S)
) -> jax.Array:
    """#eigenvalues < shift for each shift, via the Sturm/LDL^T recurrence
    d_i = (a_i - x) - b_{i-1}^2 / d_{i-1}; count = #(d_i < 0). The division
    is guarded by clamping |d| away from zero at fp32-tiny scale (the
    standard bisection safeguard; measure-zero ties move by <= 1 ulp)."""
    n = diag.shape[-1]
    scale = jnp.maximum(
        jnp.max(jnp.abs(diag), axis=-1, keepdims=True), 1e-30
    )[..., None]  # (..., 1, 1) broadcast over shifts
    tiny = 1.1754944e-38 ** 0.5  # sqrt(fp32 tiny): b^2/d stays finite

    def step(carry, inp):
        d_prev, count = carry
        a_i, b2_prev = inp  # (..., 1) each
        d = (a_i - shifts) - b2_prev / d_prev
        safe = jnp.maximum(jnp.abs(d), tiny * scale[..., 0])
        d = jnp.where(d >= 0.0, safe, -safe)
        return (d, count + (d < 0.0).astype(jnp.int32)), None

    a_seq = jnp.moveaxis(diag[..., None], -2, 0)  # (n, ..., 1)
    b2_seq = jnp.moveaxis(
        jnp.concatenate(
            [jnp.zeros_like(off2[..., :1]), off2], axis=-1
        )[..., None],
        -2,
        0,
    )
    init_d = jnp.ones_like(shifts)
    init_c = jnp.zeros(shifts.shape, jnp.int32)
    (_, count), _ = jax.lax.scan(step, (init_d, init_c), (a_seq, b2_seq))
    return count


def _kth_pair_bracket(
    diag: jax.Array,  # (B, n)
    off2: jax.Array,  # (B, n-1)
    ks: tuple[int, int],
    *,
    num_shifts: int = 128,
    rounds: int = 3,
) -> jax.Array:
    """(B, 2) approximations of the ks[0]-th and ks[1]-th smallest
    eigenvalues (0-indexed), each to (hi-lo)/num_shifts^rounds."""
    b, n = diag.shape
    r = jnp.abs(jnp.sqrt(off2))
    radius = jnp.concatenate(
        [r, jnp.zeros_like(r[:, :1])], axis=-1
    ) + jnp.concatenate([jnp.zeros_like(r[:, :1]), r], axis=-1)
    lo = jnp.min(diag - radius, axis=-1)  # (B,)
    hi = jnp.max(diag + radius, axis=-1)
    span = hi - lo
    lo = lo - 0.01 * span - 1e-30
    hi = hi + 0.01 * span + 1e-30

    k_arr = jnp.asarray(ks, jnp.int32)  # (2,)
    lo = jnp.broadcast_to(lo[:, None], (b, 2))
    hi = jnp.broadcast_to(hi[:, None], (b, 2))

    grid = (jnp.arange(num_shifts, dtype=_F32) + 1.0) / (num_shifts + 1.0)

    for _ in range(rounds):
        # shifts (B, 2, S) inside each target's bracket
        shifts = lo[..., None] + (hi - lo)[..., None] * grid
        counts = sturm_count(
            diag[:, None, :], off2[:, None, :], shifts
        )  # (B, 2, S)
        # λ_k ∈ (x_j, x_{j+1}] where count(x_j) <= k < count(x_{j+1});
        # new lo = largest shift with count <= k, new hi = smallest with
        # count > k (keep old bound when no shift qualifies)
        le = counts <= k_arr[None, :, None]  # (B, 2, S)
        new_lo = jnp.max(jnp.where(le, shifts, lo[..., None]), axis=-1)
        new_hi = jnp.min(jnp.where(~le, shifts, hi[..., None]), axis=-1)
        lo, hi = new_lo, new_hi

    return 0.5 * (lo + hi)  # (B, 2)


@partial(jax.jit, static_argnames=("num_shifts", "rounds"))
def mp_rank_sturm(
    cov: jax.Array, m: int, *, num_shifts: int = 128, rounds: int = 3
) -> jax.Array:
    """MP threshold rank of batched covariance matrices (..., d, d) built
    from M=m samples — same contract as the eigh path in
    `spectral.ops.marchenko_pastur_rank`: sigma^2 = median eigenvalue
    (numpy average-of-middle-pair semantics), lambda_+ = sigma^2
    (1 + sqrt(d/m))^2, rank = #{eig > lambda_+}."""
    batch_shape = cov.shape[:-2]
    d = cov.shape[-1]
    cov2 = cov.reshape((-1, d, d))
    diag, off = householder_tridiag(cov2)
    off2 = off * off

    ks = ((d - 1) // 2, d // 2)  # numpy median = mean of these two
    pair = _kth_pair_bracket(
        diag, off2, ks, num_shifts=num_shifts, rounds=rounds
    )
    sigma2 = 0.5 * (pair[:, 0] + pair[:, 1])  # (B,)
    q = d / m
    lambda_plus = sigma2 * (1.0 + q**0.5) ** 2

    below = sturm_count(diag, off2, lambda_plus[:, None])[:, 0]
    rank = (d - below).astype(jnp.int32)
    return rank.reshape(batch_shape)
