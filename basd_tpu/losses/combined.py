"""Combined BASD objective: CE + mean Procrustes, UW-SO balanced.

Reference `BASDLoss` (`src/losses/combined.py:17-85`): extraction points are
evenly spaced student layers including first and last; the Procrustes term is
averaged over extraction points; CE uses label smoothing over mixup/cutmix
soft targets; the two terms are combined with UW-SO inverse-loss weighting
w_i = (1/L_i.detach()) / sum_j (1/L_j.detach())  (Kirchdorfer et al. 2024).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from basd_tpu.losses.procrustes import procrustes_loss_mixed
from basd_tpu.losses.selector import SelectorState, select_and_mix


def extraction_points(student_depth: int, num_points: int) -> tuple[int, ...]:
    """Evenly-spaced block indices incl. first/last (reference
    `combined.py:34-40`); a single point selects the last block."""
    if num_points == 1:
        return (student_depth - 1,)
    return tuple(
        round(i * (student_depth - 1) / (num_points - 1))
        for i in range(num_points)
    )


def cross_entropy(
    logits: jax.Array,  # (B, C) fp32
    soft_targets: jax.Array,  # (B, C) probabilities (mixup/cutmix output)
    label_smoothing: float = 0.0,
) -> jax.Array:
    """torch `nn.CrossEntropyLoss(label_smoothing=ls)` semantics over
    probability targets: -sum_c [(1-ls) t_c + ls/C] log softmax(z)_c."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = (1.0 - label_smoothing) * soft_targets + label_smoothing / c
    return -jnp.mean(jnp.sum(t * logp, axis=-1))


def uw_so_weights(losses: jax.Array) -> jax.Array:
    """UW-SO: w_i = (1/L_i) / sum(1/L_j) on detached losses (reference
    `combined.py:80-84`)."""
    eps = jnp.finfo(jnp.float32).eps
    inv = 1.0 / jnp.clip(jax.lax.stop_gradient(losses), eps, None)
    return inv / jnp.sum(inv)


def basd_loss(
    selector: SelectorState,
    student_logits: jax.Array,  # (B, C)
    soft_targets: jax.Array,  # (B, C)
    student_tokens: jax.Array,  # (P, B, N_s, D_s)
    teacher_tokens: jax.Array,  # (L, B, N_t, D_t)
    teacher_importance: jax.Array,  # (L, B, N_t)
    *,
    label_smoothing: float,
    subspace_k: int | None = None,
) -> tuple[jax.Array, dict]:
    """Full BASD objective (reference `BASDLoss.forward`,
    `combined.py:48-85`). Returns (scalar loss, aux diagnostics)."""
    ce = cross_entropy(student_logits, soft_targets, label_smoothing)

    mixed_tokens, mixed_importance, aux = select_and_mix(
        selector, student_tokens, teacher_tokens, teacher_importance,
        subspace_k=subspace_k,
    )

    # unrolled over the (static, small) extraction points; the mean
    # matches the reference's stack(...).mean() over per-point losses
    # (combined.py:69-76). A static loop instead of vmap keeps the
    # per-point calls plain 3-D (B, N, N) — the shape the fused
    # Newton-Schulz Pallas path dispatches on (vmap over a shard_map
    # island is the one composition the kernel stack avoids). Token-count
    # alignment (reference combined.py:9-14) happens INSIDE
    # procrustes_loss_mixed — in Gram space on the NS route, explicitly
    # on the fallback route — so the (P, B, N_s, D_t) aligned tensor is
    # never materialized on the hot path.
    p = student_tokens.shape[0]
    geo = jnp.mean(jnp.stack([
        procrustes_loss_mixed(
            student_tokens[i], mixed_tokens[i], mixed_importance[i]
        )
        for i in range(p)
    ]))

    losses = jnp.stack([ce, geo])
    w = uw_so_weights(losses)
    total = jnp.sum(w * losses)

    aux.update({"ce_loss": ce, "geo_loss": geo, "uw_so_weights": w})
    return total, aux
