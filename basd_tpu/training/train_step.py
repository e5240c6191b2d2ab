"""The fused BASD train step: one jitted program per optimizer update.

Everything the reference's hot loop does across host-dispatched stages
(`src/training/trainer.py:125-159`, SURVEY.md section 3.2) — dual-view
preprocessing, mixup/cutmix, student forward with intermediate capture,
frozen-teacher forward, Grassmannian selection, Procrustes + CE + UW-SO,
backward, ScheduleFree update — compiles into ONE XLA program with no host
round-trips. Input is a uint8 image batch; augmentation runs on device.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from basd_tpu.losses import basd_loss
from basd_tpu.losses.selector import SelectorState
from basd_tpu.models.teacher import Teacher, extract_intermediates
from basd_tpu.ops.attention import attention_mesh
from basd_tpu.ops.mixup import mixup_cutmix
from basd_tpu.ops.preprocess import dual_view, dual_view_eval
from basd_tpu.ops.warp_kernel import warp_mesh
from basd_tpu.spectral.ops import spectral_mesh
from basd_tpu.training.schedule_free import schedule_free_adamw


class TrainState(NamedTuple):
    params: Any  # student y-params
    selector: SelectorState  # log_temperatures trainable; projections frozen
    opt_state: Any  # ScheduleFreeState over (student, log_temperatures)
    rng: jax.Array
    step: jax.Array


def _trainables(params, selector: SelectorState):
    return {"student": params, "log_temperatures": selector.log_temperatures}


def init_train_state(
    rng: jax.Array,
    student_module,
    selector: SelectorState,
    optimizer,
    img_size: int,
) -> TrainState:
    k_init, k_state = jax.random.split(rng)
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: student_module.init(r, x, train=False)
    )(k_init, dummy)
    params = variables["params"]
    opt_state = jax.jit(optimizer.init)(_trainables(params, selector))
    return TrainState(
        params=params,
        selector=selector,
        opt_state=opt_state,
        rng=k_state,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    student_module,
    teacher: Teacher,
    *,
    learning_rate: float,
    weight_decay: float,
    warmup_steps: int,
    label_smoothing: float,
    img_size: int,
    crop_ratio: float,
    teacher_stats: tuple,
    dataset_stats: tuple,
    num_classes: int,
    subspace_k: int | None = None,
    mesh=None,
    augment: bool = True,
):
    """Build (optimizer, init_fn, step_fn). step_fn is jit-compatible:
    (state, teacher_variables, images_u8 (B,H,W,3), labels (B,))
    -> (state, metrics). `mesh` (when the step runs under a multi-device
    mesh) routes the spectral Pallas kernels through a replicated shard_map
    island — see `basd_tpu.spectral.ops.spectral_mesh`. `augment=False`
    silences every stochastic input stage (RRC/flip/TrivialAugment and
    mixup/cutmix become the deterministic eval transform + one-hot
    targets) so a fixed batch yields a fixed step — the parity/debug
    mode the full-step trajectory test drives."""
    optimizer = schedule_free_adamw(
        learning_rate,
        weight_decay=weight_decay,
        warmup_steps=warmup_steps,
    )

    def step_fn(
        state: TrainState,
        teacher_variables,
        images_u8: jax.Array,
        labels: jax.Array,
    ):
        # ambient-mesh contexts: spectral Pallas kernels run in a
        # replicated island, the fused attention kernel in a
        # (batch, heads)-sharded island (ops/attention.py), the fused
        # augment warp kernel in a batch-sharded island (ops/warp_kernel).
        with spectral_mesh(mesh), attention_mesh(mesh), warp_mesh(mesh):
            return _step_body(state, teacher_variables, images_u8, labels)

    def _step_body(
        state: TrainState,
        teacher_variables,
        images_u8: jax.Array,
        labels: jax.Array,
    ):
        # teacher params are an explicit argument (NOT a closure capture):
        # closed-over arrays become HLO constants, bloating the program and
        # defeating donation/sharding of the frozen teacher weights.
        rng, k_view, k_mix, k_droppath = jax.random.split(state.rng, 4)

        if augment:
            clean, augmented = dual_view(
                images_u8,
                k_view,
                img_size=img_size,
                crop_ratio=crop_ratio,
                teacher_stats=teacher_stats,
                dataset_stats=dataset_stats,
            )
            student_imgs, soft_targets = mixup_cutmix(
                augmented, labels, k_mix, num_classes=num_classes
            )
        else:
            clean, student_imgs = dual_view_eval(
                images_u8,
                img_size=img_size,
                crop_ratio=crop_ratio,
                teacher_stats=teacher_stats,
                dataset_stats=dataset_stats,
            )
            soft_targets = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)

        teacher_tokens, teacher_importance = extract_intermediates(
            teacher._replace(variables=teacher_variables), clean
        )

        def loss_fn(trainable):
            params = trainable["student"]
            selector = state.selector._replace(
                log_temperatures=trainable["log_temperatures"]
            )
            out = student_module.apply(
                {"params": params},
                student_imgs,
                train=True,
                rngs={"droppath": k_droppath},
            )
            loss, aux = basd_loss(
                selector,
                out.logits,
                soft_targets,
                out.tokens,
                teacher_tokens,
                teacher_importance,
                label_smoothing=label_smoothing,
                subspace_k=subspace_k,
            )
            return loss, (aux, out.logits)

        trainable = _trainables(state.params, state.selector)
        (loss, (aux, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)

        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        new_state = TrainState(
            params=new_trainable["student"],
            selector=state.selector._replace(
                log_temperatures=new_trainable["log_temperatures"]
            ),
            opt_state=opt_state,
            rng=rng,
            step=state.step + 1,
        )

        # train accuracy against the ORIGINAL labels (reference
        # trainer.py:163 compares argmax to pre-mixup targets)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        metrics = {
            "loss": loss,
            "ce_loss": aux["ce_loss"],
            "geo_loss": aux["geo_loss"],
            "train_acc": acc,
            "mixing_weights": aux["mixing_weights"],
            "temperatures": aux["temperatures"],
            "mp_ranks": aux["mp_ranks"],
        }
        return new_state, metrics

    def init_fn(rng: jax.Array, selector: SelectorState) -> TrainState:
        return init_train_state(rng, student_module, selector, optimizer, img_size)

    return optimizer, init_fn, step_fn
