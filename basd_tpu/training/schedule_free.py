"""Schedule-Free AdamW as a functional optax-style transformation.

The reference trains with `schedulefree.AdamWScheduleFree`
(`src/training/trainer.py:54-58`; Defazio et al., "The Road Less Scheduled",
2024): no LR schedule — instead the optimizer maintains an iterate sequence
z_t and a weighted Polyak average x_t, evaluates gradients at the
interpolation y_t = (1-beta1) z_t + beta1 x_t, and *evaluates the model* at
x_t. The torch API switches the stored params between y (train mode) and x
(eval mode) (`trainer.py:180-184`, `train.py:153`); functionally we keep the
model params = y and expose `eval_params` to compute x when evaluating.

Update rule (AdamW variant):
    sched_t = min(1, t / warmup_steps)
    gamma_t = lr * sched_t * sqrt(1 - beta2^t)           # effective LR
    w_t     = gamma_t ** weight_lr_power ; c_t = w_t / sum_{i<=t} w_i
    v_t     = beta2 v_{t-1} + (1-beta2) g_t^2
    u_t     = g_t / (sqrt(v_t) + eps) + weight_decay * y_t   # decay at y
    z_t     = z_{t-1} - gamma_t u_t
    y_t     = y_{t-1} + c_t (z_t... ) — implemented via the fused form
              y += c_t (z_{t-1} - y) + gamma_t (beta1 (1 - c_t) - 1) u_t
    x_t implicit:  x = (y - (1-beta1) z) / beta1
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScheduleFreeState(NamedTuple):
    step: jax.Array  # () int32
    weight_sum: jax.Array  # () f32, sum of averaging weights
    z: optax.Params  # iterate sequence
    exp_avg_sq: optax.Updates  # second-moment accumulator


def schedule_free_adamw(
    learning_rate: float,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    weight_lr_power: float = 2.0,
) -> optax.GradientTransformation:
    """Returns a GradientTransformation whose `update` consumes gradients
    evaluated at y-params and produces updates to y-params. Use
    `eval_params(state, params)` for evaluation-time weights."""

    def init_fn(params):
        return ScheduleFreeState(
            step=jnp.zeros((), jnp.int32),
            weight_sum=jnp.zeros((), jnp.float32),
            # real copies — z must not alias the param buffers (the train
            # step donates its input state; aliased buffers would be
            # donated twice)
            z=jax.tree_util.tree_map(jnp.copy, params),
            exp_avg_sq=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
            ),
        )

    learning_rate = float(learning_rate)
    weight_decay = float(weight_decay)

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("schedule_free_adamw requires params (y).")
        t = state.step + 1
        tf = t.astype(jnp.float32)
        sched = jnp.minimum(1.0, tf / max(warmup_steps, 1)) if warmup_steps else 1.0
        bias_correction2 = 1.0 - beta2**tf
        gamma = learning_rate * sched * jnp.sqrt(bias_correction2)

        weight = gamma**weight_lr_power
        weight_sum = state.weight_sum + weight
        ckp1 = jnp.where(weight_sum > 0, weight / weight_sum, 0.0)

        def upd(g, v, z, y):
            g = g.astype(jnp.float32)
            y32 = y.astype(jnp.float32)
            v_new = beta2 * v + (1.0 - beta2) * g * g
            # bias correction is folded into gamma (= lr * sqrt(1-beta2^t)),
            # matching the official AdamWScheduleFree: denom = sqrt(v) + eps
            u = g / (jnp.sqrt(v_new) + eps)
            if weight_decay:
                u = u + weight_decay * y32
            z_new = z - gamma * u
            y_new = (
                y32
                + ckp1 * (z - y32)
                + gamma * (beta1 * (1.0 - ckp1) - 1.0) * u
            )
            return v_new, z_new.astype(z.dtype), (y_new - y32).astype(y.dtype)

        tree = jax.tree_util.tree_map(upd, grads, state.exp_avg_sq, state.z, params)
        v_new = jax.tree_util.tree_map(lambda x: x[0], tree, is_leaf=lambda x: isinstance(x, tuple))
        z_new = jax.tree_util.tree_map(lambda x: x[1], tree, is_leaf=lambda x: isinstance(x, tuple))
        updates = jax.tree_util.tree_map(lambda x: x[2], tree, is_leaf=lambda x: isinstance(x, tuple))

        return updates, ScheduleFreeState(
            step=t, weight_sum=weight_sum, z=z_new, exp_avg_sq=v_new
        )

    return optax.GradientTransformation(init_fn, update_fn)


def eval_params(state: ScheduleFreeState, params, beta1: float = 0.9):
    """x = (y - (1-beta1) z) / beta1 — the averaged evaluation point
    (torch `.eval()` mode switch, reference `trainer.py:184`)."""
    return jax.tree_util.tree_map(
        lambda y, z: ((y.astype(jnp.float32) - (1.0 - beta1) * z) / beta1).astype(
            y.dtype
        ),
        params,
        state.z,
    )
