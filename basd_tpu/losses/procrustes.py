"""Attention-weighted Procrustes loss (rectangular, dimension-mismatched).

Reference `geometric_relational_loss` (`src/losses/relational.py:5-50`):
token importance w comes from teacher attention (already reduced to a
(B, N_t) vector by the model — see `basd_tpu.models.vit`), is linearly
interpolated to the student token count and normalized; both token sets are
importance-centered and sqrt(w)-scaled; the loss is

    tr(S^T S) + tr(T^T T) - 2 ||S^T T||_nuc

averaged over the batch. The nuclear norm of the (D_s, D_t) cross-covariance
handles arbitrary dimension mismatch and IS in the gradient graph
(`relational.py:47-48`); here it is `basd_tpu.spectral.nuclear_norm` — an
MXU Gram + batched eigh with a subgradient-safe custom VJP instead of a
host-side rectangular SVD.

All math in fp32 (the reference's `.float()` islands, `relational.py:18-19`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from basd_tpu.losses.interpolate import (
    align_token_count,
    align_vector,
    linear_interp_matrix,
)
from basd_tpu.spectral import (
    nuclear_norm,
    nuclear_norm_gram,
    nuclear_norm_pair_gram,
)

_NS_PREC = jax.lax.Precision.HIGH


def _weighted_centered_gram(x: jax.Array, w: jax.Array) -> jax.Array:
    """(G_w, G_w + ridge) with G_w = D (X_c X_c^T) D for X (B, N, D),
    weights w (B, N) summing to 1, D = diag(sqrt(w)) — via the RAW Gram
    plus (N, N)-sized algebra:

        X_c X_c^T = G - a 1^T - 1 a^T + c 1 1^T,
        a = G w,  c = w^T G w,  G = X X^T.

    One bf16-in/fp32-accumulate MXU pass over X builds G; the centering
    and weighting never touch a (N, D) fp32 tensor. (The former
    feature-side form materialized fp32 centered+weighted copies of both
    token stacks — ~2.4 GB of pure HBM traffic per step at the Table-1
    shape, the dominant cost of the Procrustes stage.)"""
    g = jnp.einsum("bnd,bmd->bnm", x, x,
                   preferred_element_type=jnp.float32, precision=_NS_PREC)
    return _center_scale_gram(g, w)


def _center_scale_gram(g: jax.Array, w: jax.Array) -> jax.Array:
    """The centering/weighting/ridge algebra of `_weighted_centered_gram`
    from an already-built RAW Gram (B, N, N)."""
    a = jnp.einsum("bnm,bm->bn", g, w,
                   preferred_element_type=jnp.float32, precision=_NS_PREC)
    c = jnp.einsum("bn,bn->b", w, a, preferred_element_type=jnp.float32)
    g_c = g - a[:, :, None] - a[:, None, :] + c[:, None, None]
    ws = jnp.sqrt(w)
    g_w = g_c * ws[:, :, None] * ws[:, None, :]
    # Cancellation ridge: when the tokens are (near-)identical — e.g. a
    # CNN teacher's single token interpolated to N_s copies — the exact
    # centered Gram is 0, but the Gram-space subtraction leaves an
    # INDEFINITE roundoff matrix at ~1e-6 of the uncentered magnitude;
    # its negative eigenvalues explode through the square-root schedule
    # (amplification ~ prod(a_k)^2). A diagonal shift at the rounding
    # noise floor (the weighted uncentered trace sets the magnitude the
    # cancellation started from) restores PSD up to far-sub-noise error.
    # The ridge feeds ONLY the nuclear-norm operand; trace terms use the
    # unridged Gram (see caller).
    lam = 1e-6 * jnp.einsum(
        "bn,bn->b", w, jnp.diagonal(g, axis1=-2, axis2=-1))
    eye = jnp.eye(g.shape[-1], dtype=jnp.float32)
    return g_w, g_w + lam[:, None, None] * eye


def procrustes_loss_mixed(
    student_tokens: jax.Array,  # (B, N_s, D_s)
    mixed_tokens: jax.Array,  # (B, N_t, D_t) — NOT token-count aligned
    importance: jax.Array,  # (B, N_w) teacher attention importance
) -> jax.Array:
    """`procrustes_loss` consuming the UNALIGNED mixed teacher tokens:
    on the NS Gram route the token-count alignment happens in Gram space,

        G_aligned = (A M)(A M)^T = A (M M^T) A^T,

    with A the static (N_s, N_t) linear-interpolation matrix — exactly
    `align_token_count` followed by the Gram build, without ever
    materializing the (B, N_s, D_t) aligned token tensor (fp32 write +
    Gram read + VJP re-read per extraction point at the Table-1 shape).
    Shapes outside the NS gate fall back to explicit alignment."""
    n_s = student_tokens.shape[1]
    n_t = mixed_tokens.shape[1]
    if not (n_s <= min(student_tokens.shape[-1], mixed_tokens.shape[-1])):
        return procrustes_loss(
            student_tokens, align_token_count(mixed_tokens, n_s), importance
        )
    w = align_vector(importance.astype(jnp.float32), n_s)  # (B, N_s)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    g_s, g_s_r = _weighted_centered_gram(student_tokens, w)
    g_mix = jnp.einsum("bnd,bmd->bnm", mixed_tokens, mixed_tokens,
                       preferred_element_type=jnp.float32,
                       precision=_NS_PREC)
    if n_t != n_s:
        a = jnp.asarray(linear_interp_matrix(n_s, n_t))
        g_mix = jnp.einsum("on,bnm,pm->bop", a, g_mix, a,
                           preferred_element_type=jnp.float32,
                           precision=_NS_PREC)
    g_t, g_t_r = _center_scale_gram(g_mix, w)
    tr_s = jnp.trace(g_s, axis1=-2, axis2=-1)
    tr_t = jnp.trace(g_t, axis1=-2, axis2=-1)
    nuc = nuclear_norm_pair_gram(g_s_r, g_t_r)
    return jnp.mean(tr_s + tr_t - 2.0 * nuc)


def procrustes_loss(
    student_tokens: jax.Array,  # (B, N_s, D_s)
    teacher_tokens: jax.Array,  # (B, N_s, D_t) — already token-count aligned
    importance: jax.Array,  # (B, N_w) teacher attention importance
    *,
    use_newton_schulz: bool = True,
) -> jax.Array:
    n_s = student_tokens.shape[1]

    w = align_vector(importance.astype(jnp.float32), n_s)  # (B, N_s)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    if use_newton_schulz and n_s <= min(
        student_tokens.shape[-1], teacher_tokens.shape[-1]
    ):
        # token-side Gram form: weighting/centering as (N, N) algebra on
        # the raw Grams, nuclear norm + polar subgradient from the
        # scheduled square-root iteration — the (N, D) fp32
        # centered/weighted features never exist
        g_s, g_s_r = _weighted_centered_gram(student_tokens, w)
        g_t, g_t_r = _weighted_centered_gram(teacher_tokens, w)
        tr_s = jnp.trace(g_s, axis1=-2, axis2=-1)
        tr_t = jnp.trace(g_t, axis1=-2, axis2=-1)
        nuc = nuclear_norm_pair_gram(g_s_r, g_t_r)
        return jnp.mean(tr_s + tr_t - 2.0 * nuc)

    s = student_tokens.astype(jnp.float32)
    t = teacher_tokens.astype(jnp.float32)
    mu_s = jnp.einsum("bn,bnd->bd", w, s)[:, None, :]
    mu_t = jnp.einsum("bn,bnd->bd", w, t)[:, None, :]
    s_c = s - mu_s
    t_c = t - mu_t

    w_sqrt = jnp.sqrt(w)[..., None]
    s_w = w_sqrt * s_c
    t_w = w_sqrt * t_c

    tr_s = jnp.sum(s_w * s_w, axis=(1, 2))
    tr_t = jnp.sum(t_w * t_w, axis=(1, 2))

    cross = jnp.einsum(
        "bnd,bne->bde", s_w, t_w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, D_s, D_t)
    nuc = (
        nuclear_norm_gram(cross) if use_newton_schulz
        else nuclear_norm(cross)  # eigh accuracy oracle
    )

    return jnp.mean(tr_s + tr_t - 2.0 * nuc)
