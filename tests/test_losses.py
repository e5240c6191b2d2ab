"""Loss layer: interp parity, selector oracle parity, Procrustes properties,
CE/UW-SO semantics, gradient contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.losses import (
    align_token_count,
    basd_loss,
    cross_entropy,
    extraction_points,
    init_selector,
    linear_interp_matrix,
    procrustes_loss,
    select_and_mix,
    uw_so_weights,
)
from basd_tpu.losses.interpolate import align_vector
from basd_tpu.spectral.reference import selector_weights_np


class TestInterp:
    @pytest.mark.parametrize("n_in,n_out", [(9, 16), (16, 9), (256, 196), (5, 5)])
    def test_matches_torch_linear(self, n_in, n_out):
        import torch
        import torch.nn.functional as F

        x = np.random.default_rng(0).normal(size=(2, n_in, 3)).astype(np.float32)
        got = np.asarray(align_token_count(jnp.asarray(x), n_out))
        want = (
            F.interpolate(
                torch.from_numpy(x).transpose(1, 2), size=n_out,
                mode="linear", align_corners=False,
            )
            .transpose(1, 2)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_vector_alignment(self):
        import torch
        import torch.nn.functional as F

        w = np.random.default_rng(1).random((4, 12)).astype(np.float32)
        got = np.asarray(align_vector(jnp.asarray(w), 7))
        want = (
            F.interpolate(
                torch.from_numpy(w).unsqueeze(1), size=7,
                mode="linear", align_corners=False,
            )
            .squeeze(1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_rows_sum_to_one(self):
        w = linear_interp_matrix(17, 31)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


class TestExtractionPoints:
    def test_reference_schedule(self):
        # round(i * (depth-1) / (P-1)) — reference combined.py:34-40
        assert extraction_points(12, 4) == (0, 4, 7, 11)
        assert extraction_points(12, 1) == (11,)
        assert extraction_points(4, 2) == (0, 3)
        assert extraction_points(6, 3) == (0, 2, 5)


class TestCrossEntropy:
    def test_matches_torch_with_smoothing_and_soft_targets(self):
        import torch

        rng = np.random.default_rng(2)
        logits = rng.normal(size=(8, 10)).astype(np.float32)
        t = rng.random((8, 10)).astype(np.float32)
        t = t / t.sum(-1, keepdims=True)
        got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(t), 0.1))
        crit = torch.nn.CrossEntropyLoss(label_smoothing=0.1)
        want = float(crit(torch.from_numpy(logits), torch.from_numpy(t)))
        assert abs(got - want) < 1e-5


class TestUWSO:
    def test_inverse_loss_weighting(self):
        w = np.asarray(uw_so_weights(jnp.asarray([2.0, 0.5])))
        np.testing.assert_allclose(w, [0.2, 0.8], atol=1e-6)
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-7)

    def test_weights_carry_no_gradient(self):
        def f(v):
            return jnp.sum(uw_so_weights(v) * v)

        g = np.asarray(jax.grad(f)(jnp.asarray([2.0, 0.5])))
        # d/dv_i of sum(w * v) with w detached = w
        np.testing.assert_allclose(g, [0.2, 0.8], atol=1e-6)


class TestProcrustes:
    def test_zero_for_rotated_copy(self):
        rng = np.random.default_rng(3)
        s = rng.normal(size=(2, 12, 8)).astype(np.float32)
        q, _ = np.linalg.qr(rng.normal(size=(8, 8)))
        t = s @ q.astype(np.float32)
        imp = rng.random((2, 12)).astype(np.float32)
        loss = float(
            procrustes_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(imp))
        )
        assert abs(loss) < 1e-3

    def test_positive_for_unrelated(self):
        rng = np.random.default_rng(4)
        s = rng.normal(size=(2, 12, 8)).astype(np.float32)
        t = rng.normal(size=(2, 12, 16)).astype(np.float32)
        imp = np.ones((2, 12), dtype=np.float32)
        loss = float(
            procrustes_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(imp))
        )
        assert loss > 0

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(5)
        b, n_s, n_t, d_s, d_t = 3, 10, 14, 6, 9
        s = rng.normal(size=(b, n_s, d_s)).astype(np.float32)
        t = rng.normal(size=(b, n_s, d_t)).astype(np.float32)
        imp = rng.random((b, n_t)).astype(np.float32)

        got = float(procrustes_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(imp)))

        # independent numpy implementation of the math
        w = np.asarray(align_vector(jnp.asarray(imp), n_s))
        w = w / w.sum(-1, keepdims=True)
        vals = []
        for i in range(b):
            mu_s = (w[i, :, None] * s[i]).sum(0, keepdims=True)
            mu_t = (w[i, :, None] * t[i]).sum(0, keepdims=True)
            sw = np.sqrt(w[i])[:, None] * (s[i] - mu_s)
            tw = np.sqrt(w[i])[:, None] * (t[i] - mu_t)
            nuc = np.linalg.svd(sw.T @ tw, compute_uv=False).sum()
            vals.append((sw**2).sum() + (tw**2).sum() - 2 * nuc)
        want = float(np.mean(vals))
        assert abs(got - want) < 5e-3 * max(1.0, abs(want))

    def test_gradient_finite(self):
        rng = np.random.default_rng(6)
        s = rng.normal(size=(2, 8, 6)).astype(np.float32)
        t = rng.normal(size=(2, 8, 6)).astype(np.float32)
        imp = np.ones((2, 8), dtype=np.float32)

        g = jax.grad(
            lambda x: procrustes_loss(x, jnp.asarray(t), jnp.asarray(imp))
        )(jnp.asarray(s))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSelector:
    def _setup(self, seed=0, p=2, l=4, b=2, n_s=12, n_t=16, d_s=8, d_t=12):
        rng = np.random.default_rng(seed)
        student = rng.normal(size=(p, b, n_s, d_s)).astype(np.float32)
        # teacher layers with different planted ranks
        teacher = np.stack(
            [
                _low_rank(rng, b * n_t, d_t, rank).reshape(b, n_t, d_t)
                for rank in (2 + np.arange(l))
            ]
        ).astype(np.float32)
        imp = rng.random((l, b, n_t)).astype(np.float32)
        state = init_selector(jax.random.PRNGKey(seed), p, d_s, d_t)
        return state, student, teacher, imp

    def test_weights_sum_to_one(self):
        state, student, teacher, imp = self._setup()
        # jitted: eager op-by-op selector dispatch costs seconds on the
        # 1-core mesh; one program is persistent-cache-served warm
        _, _, aux = jax.jit(select_and_mix)(
            state, jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(imp)
        )
        w = np.asarray(aux["mixing_weights"])
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        assert (w >= 0).all()

    def test_procrustes_mixed_matches_align_then_loss(self):
        """Gram-space token-count alignment (A G A^T) must equal explicit
        align_token_count + procrustes_loss — values AND gradients wrt
        both student and mixed teacher tokens."""
        from basd_tpu.losses.interpolate import align_token_count
        from basd_tpu.losses.procrustes import (
            procrustes_loss,
            procrustes_loss_mixed,
        )

        rng = np.random.default_rng(21)
        s = jnp.asarray(rng.normal(size=(3, 9, 16)).astype(np.float32))
        m = jnp.asarray(rng.normal(size=(3, 13, 24)).astype(np.float32))
        imp = jnp.asarray(rng.random((3, 13)).astype(np.float32))

        def via_mixed(s, m):
            return procrustes_loss_mixed(s, m, imp)

        def via_align(s, m):
            return procrustes_loss(s, align_token_count(m, 9), imp)

        (l_m, g_m) = jax.jit(jax.value_and_grad(via_mixed, argnums=(0, 1)))(s, m)
        (l_a, g_a) = jax.jit(jax.value_and_grad(via_align, argnums=(0, 1)))(s, m)
        # rtol covers jit-fusion contraction-order drift; an actual algebra
        # error would be O(1) relative
        np.testing.assert_allclose(float(l_m), float(l_a), rtol=1e-4)
        for a, b in zip(g_m, g_a):
            # identical algebra, different fp contraction order — an
            # actual algebra error would be O(1) relative
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                atol=1e-3 * float(jnp.abs(b).max()),
            )

    def test_bf16_teacher_mix_close_to_f32_teacher(self):
        """The mixed tokens inherit the teacher compute dtype (round-5
        measured default — `select_and_mix`), so a bf16 teacher must
        yield a loss within bf16 rounding of the same tokens in fp32
        (the parity suites run fp32 teachers, where the cast is a
        no-op)."""
        from basd_tpu.losses import basd_loss

        state, student, teacher, imp = self._setup(seed=13)
        st = jnp.asarray(student)
        ti = jnp.asarray(imp)
        logits = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 10)).astype(np.float32))
        targets = jax.nn.one_hot(jnp.asarray([1, 3]), 10)

        def run(tt):
            # jitted because eager dispatch costs seconds on the 1-core mesh
            total, aux = jax.jit(
                lambda *a: basd_loss(*a, label_smoothing=0.1)
            )(state, logits, targets, st, tt, ti)
            return float(total), float(aux["geo_loss"])

        t_b, g_b = run(jnp.asarray(teacher).astype(jnp.bfloat16))
        t_f, g_f = run(jnp.asarray(teacher))
        assert abs(t_b - t_f) < 2e-2 * abs(t_f)
        assert abs(g_b - g_f) < 2e-2 * max(abs(g_f), 1e-3)

    def test_matches_numpy_oracle(self):
        state, student, teacher, imp = self._setup(seed=7)
        _, _, aux = jax.jit(select_and_mix)(
            state, jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(imp)
        )
        got = np.asarray(aux["mixing_weights"])

        d_s = student.shape[-1]
        for i in range(student.shape[0]):
            want = selector_weights_np(
                student[i],
                teacher,
                np.asarray(state.proj_s),
                np.asarray(state.proj_t),
                temperature=1.0,  # softplus(log(e-1)) = 1
                max_rank=d_s - 1,
            )
            np.testing.assert_allclose(got[i], want, atol=2e-2)

    def test_mixing_is_convex_combination(self):
        state, student, teacher, imp = self._setup(seed=8)
        mixed, mixed_imp, aux = jax.jit(select_and_mix)(
            state, jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(imp)
        )
        w = np.asarray(aux["mixing_weights"])
        want = np.einsum("pl,lbnd->pbnd", w, teacher)
        np.testing.assert_allclose(np.asarray(mixed), want, atol=1e-4)

    def test_identical_student_teacher_prefers_matching_layer(self):
        # With proj_s == proj_t, student tokens == one teacher layer's
        # tokens means identical projected subspaces -> d^2 = 0 for that
        # layer, which must win the softmax. (With independent random
        # projections — the reference default — distances are only
        # relatively meaningful, so we pin the projections here.)
        rng = np.random.default_rng(9)
        l, b, n, d = 3, 2, 16, 8
        teacher = np.stack(
            [_low_rank(rng, b * n, d, 3).reshape(b, n, d) for _ in range(l)]
        ).astype(np.float32)
        student = teacher[1][None]  # P=1
        imp = np.ones((l, b, n), dtype=np.float32) / n
        state = init_selector(jax.random.PRNGKey(0), 1, d, d)
        state = state._replace(proj_t=state.proj_s)
        _, _, aux = jax.jit(select_and_mix)(
            state, jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(imp)
        )
        d2 = np.asarray(aux["grassmann_d2"])[0]
        w = np.asarray(aux["mixing_weights"])[0]
        assert d2[1] < 1e-3
        assert w.argmax() == 1


class TestBASDLoss:
    def test_end_to_end_and_gradients(self):
        rng = np.random.default_rng(10)
        p, l, b, n_s, n_t, d_s, d_t, c = 2, 3, 4, 9, 16, 8, 12, 5
        state = init_selector(jax.random.PRNGKey(0), p, d_s, d_t)
        logits = rng.normal(size=(b, c)).astype(np.float32)
        targets = np.eye(c, dtype=np.float32)[rng.integers(0, c, b)]
        student = rng.normal(size=(p, b, n_s, d_s)).astype(np.float32)
        teacher = rng.normal(size=(l, b, n_t, d_t)).astype(np.float32)
        imp = rng.random((l, b, n_t)).astype(np.float32)

        def f(sel_state, s_tokens, s_logits):
            loss, _ = basd_loss(
                sel_state, s_logits, jnp.asarray(targets), s_tokens,
                jnp.asarray(teacher), jnp.asarray(imp),
                label_smoothing=0.1,
            )
            return loss

        # jit (the production path): eager op-by-op dispatch of the full
        # loss graph costs ~30 s on the 1-core CPU mesh
        loss = float(
            jax.jit(f)(state, jnp.asarray(student), jnp.asarray(logits))
        )
        assert np.isfinite(loss)

        grads = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(
            state, jnp.asarray(student), jnp.asarray(logits)
        )
        g_temp = np.asarray(grads[0].log_temperatures)
        g_student = np.asarray(grads[1])
        g_logits = np.asarray(grads[2])
        assert np.all(np.isfinite(g_temp)) and np.abs(g_temp).max() > 0
        assert np.all(np.isfinite(g_student)) and np.abs(g_student).max() > 0
        assert np.all(np.isfinite(g_logits)) and np.abs(g_logits).max() > 0
        # frozen projections receive no optimizer updates; their grads exist
        # but are never applied — the trainable selector surface is 4 temps.

    def test_uw_so_composition(self):
        # total = w_ce * ce + w_geo * geo with inverse-loss weights
        rng = np.random.default_rng(11)
        p, l, b, n, d, c = 1, 2, 2, 8, 6, 4
        state = init_selector(jax.random.PRNGKey(1), p, d, d)
        logits = rng.normal(size=(b, c)).astype(np.float32)
        targets = np.eye(c, dtype=np.float32)[rng.integers(0, c, b)]
        student = rng.normal(size=(p, b, n, d)).astype(np.float32)
        teacher = rng.normal(size=(l, b, n, d)).astype(np.float32)
        imp = np.ones((l, b, n), dtype=np.float32) / n

        loss, aux = jax.jit(
            lambda st, lg, tg, su, te, im: basd_loss(
                st, lg, tg, su, te, im, label_smoothing=0.0
            )
        )(
            state, jnp.asarray(logits), jnp.asarray(targets),
            jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(imp),
        )
        ce, geo = float(aux["ce_loss"]), float(aux["geo_loss"])
        w = np.asarray(aux["uw_so_weights"])
        np.testing.assert_allclose(
            float(loss), w[0] * ce + w[1] * geo, rtol=1e-5
        )
        np.testing.assert_allclose(
            w, np.asarray([1 / ce, 1 / geo]) / (1 / ce + 1 / geo), rtol=1e-4
        )


def _low_rank(rng, m, d, rank, noise=0.05):
    u = rng.normal(size=(m, rank))
    v = rng.normal(size=(rank, d))
    return u @ v / np.sqrt(rank) + noise * rng.normal(size=(m, d))
