"""Minimum end-to-end slice (SURVEY.md section 7 milestone 4): tiny ViT
student + frozen tiny ViT teacher, full BASD path in ONE jitted step, loss
decreases, everything finite. Plus the CNN->ViT cross-architecture path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.losses import extraction_points, init_selector
from basd_tpu.models import create_student, load_teacher
from basd_tpu.training.train_step import make_train_step


def _setup(teacher_name="vit_mini_patch4", img_size=16, batch=8, seed=0):
    teacher = load_teacher(teacher_name, img_size=img_size, dtype=jnp.float32)
    points = extraction_points(4, 2)
    student, cfg = create_student(
        "vit_micro_patch4",
        num_classes=10,
        drop_path_rate=0.0,
        img_size=img_size,
        capture_layers=points,
        dtype=jnp.float32,
        remat=False,
    )
    selector = init_selector(
        jax.random.PRNGKey(seed), len(points), cfg.embed_dim,
        teacher.spec.embed_dim,
    )
    optimizer, init_fn, step_fn = make_train_step(
        student,
        teacher,
        learning_rate=3e-3,
        weight_decay=0.01,
        warmup_steps=5,
        label_smoothing=0.1,
        img_size=img_size,
        crop_ratio=16 / 24,
        teacher_stats=((0.5,) * 3, (0.5,) * 3),
        dataset_stats=((0.5,) * 3, (0.25,) * 3),
        num_classes=10,
    )
    state = init_fn(jax.random.PRNGKey(seed), selector)

    rng = np.random.default_rng(seed)
    # raw images slightly larger than img_size (host loader contract)
    images = (rng.random((batch, 20, 20, 3)) * 255).astype(np.uint8)
    # labels correlated with image content so learning is possible
    labels = (images.astype(np.int32).mean(axis=(1, 2, 3)) % 10).astype(np.int32)
    return state, teacher.variables, jax.jit(step_fn), images, labels


class TestTrainStep:
    def test_step_finite_updates_and_frozen_buffers(self):
        # ONE setup + compile covers single-step finiteness, param updates,
        # temperature updates, and frozen-projection invariance (merged
        # from three per-seed tests: each extra _setup costs ~8 s of
        # trace+compile on the 1-core CPU mesh)
        state, tvars, step, images, labels = _setup()
        s1, metrics = step(state, tvars, jnp.asarray(images), jnp.asarray(labels))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["ce_loss"]))
        assert np.isfinite(float(metrics["geo_loss"]))
        w = np.asarray(metrics["mixing_weights"])
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
        assert int(s1.step) == 1

        # params changed and stayed finite
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
            state.params, s1.params,
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0
        finite = jax.tree_util.tree_map(
            lambda a: bool(jnp.all(jnp.isfinite(a.astype(jnp.float32)))), s1.params
        )
        assert all(jax.tree_util.tree_leaves(finite))

        # temperatures move over a few steps; frozen projections must not
        s = s1
        for _ in range(2):
            s, _ = step(s, tvars, jnp.asarray(images), jnp.asarray(labels))
        dt = np.abs(
            np.asarray(s.selector.log_temperatures)
            - np.asarray(state.selector.log_temperatures)
        )
        assert dt.max() > 0
        np.testing.assert_array_equal(
            np.asarray(s.selector.proj_s), np.asarray(state.selector.proj_s)
        )

    @pytest.mark.slow
    def test_loss_decreases_over_50_steps(self):
        state, tvars, step, images, labels = _setup(seed=3, batch=16)
        losses = []
        s = state
        for _ in range(50):
            s, m = step(s, tvars, jnp.asarray(images), jnp.asarray(labels))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_cnn_teacher_cross_arch(self):
        # CNN->ViT path: single teacher layer, uniform attention
        state, tvars, step, images, labels = _setup(
            teacher_name="resnet_micro", img_size=16, seed=4
        )
        s1, metrics = step(state, tvars, jnp.asarray(images), jnp.asarray(labels))
        assert np.isfinite(float(metrics["loss"]))
        w = np.asarray(metrics["mixing_weights"])
        np.testing.assert_allclose(w, 1.0, atol=1e-5)  # L=1 -> weight 1
