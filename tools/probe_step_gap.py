"""Attribute the Table-1 cross-stage gap: isolated stages sum to ~325 ms
(dual_view 12.8 + teacher 121.9 + student f+b 96.7 + loss tail ~84 +
opt) but the production step measures 370.5. This probe times THREE real
train steps (same slope method as bench.py, state donated and chained):

  full        : the production step (bench.py --imagenet; cache-hit)
  ce_sel      : full minus Procrustes — select_and_mix runs for real
                (grads through it) with its outputs epsilon-coupled
  ce_teacher  : same step with the whole BASD tail replaced by CE + an
                epsilon-coupling (1e-30 * sum(teacher outputs)) that
                keeps the teacher forward alive against DCE
  ce_only     : CE step with no teacher at all

Measured 2026-08-19 (v5e, full step 370.8 ms):
  ce_only 108.2 | teacher fwd +121.8 | selector f+b +99.3 |
  procrustes tail +41.6.
The compute-bound stages match their isolated numbers exactly; the
"gap" was entirely the SELECTOR, whose isolated measurements were
understated two ways: the loss-tail probe fed L=4 teacher layers where
production selects over L=12, and slope-timing a latency-bound chain
with independent iterations lets successive calls pipeline, reporting
throughput instead of the serial latency the step pays. In-context
ablation deltas (this probe's method) are the only trustworthy numbers
for latency-bound stages.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import optax

from basd_tpu.losses import (
    calibrate_subspace_k,
    extraction_points,
    init_selector,
)
from basd_tpu.models import create_student, load_teacher
from basd_tpu.models.teacher import extract_intermediates
from basd_tpu.ops.mixup import mixup_cutmix
from basd_tpu.ops.preprocess import dual_view, eval_view
from basd_tpu.training.schedule_free import schedule_free_adamw
from basd_tpu.training.train_step import make_train_step
from basd_tpu.utils.kernel_smoke import validate_kernel_dispatches

SMOKE = os.environ.get("BASD_PROBE_SMOKE") == "1"


def main():
    img_size, batch, num_classes = (56, 8, 16) if SMOKE else (224, 256, 1000)
    n1, n2 = (1, 3) if SMOKE else (4, 24)
    validate_kernel_dispatches(verbose=False)

    teacher = load_teacher("dinov2_vitb14", img_size=img_size,
                           dtype=jnp.bfloat16)
    points = extraction_points(12, 4)
    student, cfg = create_student(
        "vit_small_patch16", num_classes=num_classes, drop_path_rate=0.05,
        img_size=img_size, capture_layers=points, dtype=jnp.bfloat16,
        remat=False,
    )
    selector = init_selector(
        jax.random.PRNGKey(1), len(points), cfg.embed_dim,
        teacher.spec.embed_dim,
    )
    rng = np.random.default_rng(0)
    raw = img_size + 2 * cfg.patch_size
    images = jnp.asarray(
        (rng.random((batch, raw, raw, 3)) * 255).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, batch, dtype=np.int32))

    view_kw = dict(
        img_size=img_size, crop_ratio=img_size / raw,
        teacher_stats=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        dataset_stats=((0.507, 0.487, 0.441), (0.267, 0.256, 0.276)),
    )
    calib = jax.jit(lambda u: eval_view(
        u, img_size=img_size, crop_ratio=img_size / raw,
        mean=view_kw["teacher_stats"][0], std=view_kw["teacher_stats"][1],
    ))(images)
    subspace_k = calibrate_subspace_k(
        teacher, cfg.embed_dim, calib, seed=0, num_extraction_points=4)

    _, init_fn, full_step = make_train_step(
        student, teacher, learning_rate=5e-4, weight_decay=0.05,
        warmup_steps=1000, label_smoothing=0.01, img_size=img_size,
        crop_ratio=img_size / raw,
        teacher_stats=view_kw["teacher_stats"],
        dataset_stats=view_kw["dataset_stats"],
        num_classes=num_classes, subspace_k=subspace_k,
    )
    state0 = init_fn(jax.random.PRNGKey(0), selector)
    teacher_vars = teacher.variables

    optimizer = schedule_free_adamw(5e-4, weight_decay=0.05,
                                    warmup_steps=1000)

    # ablated step bodies mirroring train_step._step_body exactly except
    # for the loss tail (same rng splits, same metrics structure)
    def make_ablated(with_teacher: bool, with_selector: bool = False):
        from basd_tpu.losses.selector import select_and_mix
        def step_fn(state, tvars, images_u8, lab):
            rng_, k_view, k_mix, k_dp = jax.random.split(state.rng, 4)
            clean, augmented = dual_view(images_u8, k_view, **view_kw)
            student_imgs, soft_targets = mixup_cutmix(
                augmented, lab, k_mix, num_classes=num_classes)

            eps_val = 0.0
            if with_teacher:
                t_tok, t_imp = extract_intermediates(
                    teacher._replace(variables=tvars), clean)
                # epsilon-coupling: keeps the teacher forward alive
                # against DCE at negligible cost (two sum reductions)
                eps_val = 1e-30 * (
                    jnp.sum(t_tok.astype(jnp.float32))
                    + jnp.sum(t_imp.astype(jnp.float32)))

            def loss_fn(trainable):
                out = student.apply(
                    {"params": trainable["student"]}, student_imgs,
                    train=True, rngs={"droppath": k_dp})
                logp = jax.nn.log_softmax(out.logits.astype(jnp.float32))
                ce = -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))
                extra = eps_val
                if with_selector:
                    # run select_and_mix for real (grads to tokens AND
                    # log_temps through it) but drop Procrustes: the
                    # mixed outputs are epsilon-coupled into the loss
                    sel = state.selector._replace(
                        log_temperatures=trainable["log_temperatures"])
                    mixed_t, mixed_i, _ = select_and_mix(
                        sel, out.tokens, t_tok, t_imp,
                        subspace_k=subspace_k)
                    extra = extra + 1e-30 * (
                        jnp.sum(mixed_t.astype(jnp.float32))
                        + jnp.sum(mixed_i.astype(jnp.float32)))
                # touch log_temps so the trainable tree matches full
                return ce + extra + 0.0 * jnp.sum(
                    trainable["log_temperatures"]), out.logits

            trainable = {"student": state.params,
                         "log_temperatures": state.selector.log_temperatures}
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_state = state._replace(
                params=new_trainable["student"],
                selector=state.selector._replace(
                    log_temperatures=new_trainable["log_temperatures"]),
                opt_state=opt_state, rng=rng_, step=state.step + 1)
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == lab).astype(jnp.float32))
            return new_state, {"loss": loss, "train_acc": acc}
        return step_fn

    def slope(step_fn, label):
        t0 = time.perf_counter()
        step = (jax.jit(step_fn, donate_argnums=0)
                .lower(state0, teacher_vars, images, labels).compile())
        print(f"[{label}] compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)

        def run(iters, state):
            start = time.perf_counter()
            metrics = None
            for _ in range(iters):
                state, metrics = step(state, teacher_vars, images, labels)
            loss = float(metrics["loss"])
            return time.perf_counter() - start, state, loss

        # fresh copy per variant: the step donates its input state
        _, state, _ = run(5, jax.tree_util.tree_map(jnp.copy, state0))
        if SMOKE:
            print(f"[{label}] smoke ok", flush=True)
            return float("nan")
        t1, state, _ = run(n1, state)
        t2, state, loss = run(n2, state)
        ms = (t2 - t1) / (n2 - n1) * 1e3
        print(f"[{label}] {ms:8.3f} ms/step (loss {loss:.4f})", flush=True)
        return ms

    t_ce = slope(make_ablated(False), "ce_only")
    t_ct = slope(make_ablated(True), "ce_teacher")
    t_cs = slope(make_ablated(True, with_selector=True), "ce_sel")
    t_full = slope(full_step, "full")
    if not SMOKE:
        print(f"in-context teacher fwd: {t_ct - t_ce:8.3f} ms "
              f"(isolated 121.9)", flush=True)
        print(f"in-context selector f+b:{t_cs - t_ct:8.3f} ms "
              f"(isolated fwd ~30)", flush=True)
        print(f"in-context procrustes:  {t_full - t_cs:8.3f} ms "
              f"(isolated tail f+b 84 incl. selector)", flush=True)
        print(f"ce_only residual:       {t_ce:8.3f} ms "
              f"(isolated ~12.8 view + 96.7 student + opt)", flush=True)


if __name__ == "__main__":
    main()
