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

from basd_tpu.losses.interpolate import align_vector
from basd_tpu.spectral import nuclear_norm, nuclear_norm_gram, nuclear_norm_pair


def procrustes_loss(
    student_tokens: jax.Array,  # (B, N_s, D_s)
    teacher_tokens: jax.Array,  # (B, N_s, D_t) — already token-count aligned
    importance: jax.Array,  # (B, N_w) teacher attention importance
    *,
    use_newton_schulz: bool = True,
) -> jax.Array:
    s = student_tokens.astype(jnp.float32)
    t = teacher_tokens.astype(jnp.float32)
    n_s = s.shape[1]

    w = align_vector(importance.astype(jnp.float32), n_s)  # (B, N_s)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    mu_s = jnp.einsum("bn,bnd->bd", w, s)[:, None, :]
    mu_t = jnp.einsum("bn,bnd->bd", w, t)[:, None, :]
    s_c = s - mu_s
    t_c = t - mu_t

    w_sqrt = jnp.sqrt(w)[..., None]
    s_w = w_sqrt * s_c
    t_w = w_sqrt * t_c

    tr_s = jnp.sum(s_w * s_w, axis=(1, 2))
    tr_t = jnp.sum(t_w * t_w, axis=(1, 2))

    if use_newton_schulz and n_s <= min(s.shape[-1], t.shape[-1]):
        # token-side Newton-Schulz: every matmul is (N x N), the cross-
        # covariance is never materialized, gradient = polar subgradient
        nuc = nuclear_norm_pair(s_w, t_w)
    else:
        cross = jnp.einsum(
            "bnd,bne->bde", s_w, t_w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, D_s, D_t)
        nuc = (
            nuclear_norm_gram(cross) if use_newton_schulz
            else nuclear_norm(cross)  # eigh accuracy oracle
        )

    return jnp.mean(tr_s + tr_t - 2.0 * nuc)
