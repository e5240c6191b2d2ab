"""ScheduleFree AdamW: algorithm invariants + convergence behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.training.schedule_free import (
    eval_params,
    schedule_free_adamw,
)


def _quadratic_problem(d=8, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d)).astype(np.float32)
    h = a @ a.T / d + 0.5 * np.eye(d, dtype=np.float32)
    target = rng.normal(size=(d,)).astype(np.float32)

    def loss(p):
        r = p - jnp.asarray(target)
        return 0.5 * r @ jnp.asarray(h) @ r

    return loss, target


class TestScheduleFree:
    def test_converges_on_quadratic(self):
        loss, target = _quadratic_problem()
        opt = schedule_free_adamw(0.05, warmup_steps=10)
        params = jnp.zeros(8)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(loss)(params)
            updates, state = opt.update(g, state, params)
            import optax

            return optax.apply_updates(params, updates), state

        for _ in range(400):
            params, state = step(params, state)

        x = eval_params(state, params)
        assert float(loss(x)) < 1e-3
        np.testing.assert_allclose(np.asarray(x), target, atol=0.05)

    def test_eval_point_interpolation_identity(self):
        # y = (1-beta1) z + beta1 x must hold for the recovered x
        loss, _ = _quadratic_problem(seed=1)
        opt = schedule_free_adamw(0.02)
        params = jnp.ones(8)
        state = opt.init(params)
        for _ in range(5):
            g = jax.grad(loss)(params)
            updates, state = opt.update(g, state, params)
            import optax

            params = optax.apply_updates(params, updates)
        x = eval_params(state, params)
        y_recon = (1 - 0.9) * state.z + 0.9 * x
        np.testing.assert_allclose(
            np.asarray(y_recon), np.asarray(params), atol=1e-5
        )

    def test_first_step_y_equals_z_average(self):
        # after step 1, ckp1 = 1 so the averaging pulls y fully toward z
        opt = schedule_free_adamw(0.1)
        params = jnp.zeros(4)
        state = opt.init(params)
        g = jnp.ones(4)
        updates, state = opt.update(g, state, params)
        import optax

        y1 = optax.apply_updates(params, updates)
        # x_1 = z_1 when ckp1 == 1  =>  y_1 = (1-b1) z_1 + b1 z_1 = z_1
        np.testing.assert_allclose(np.asarray(y1), np.asarray(state.z), atol=1e-6)

    def test_warmup_scales_first_steps(self):
        opt_w = schedule_free_adamw(0.1, warmup_steps=100)
        opt_n = schedule_free_adamw(0.1, warmup_steps=0)
        params = jnp.zeros(4)
        g = jnp.ones(4)
        sw = opt_w.init(params)
        sn = opt_n.init(params)
        uw, sw = opt_w.update(g, sw, params)
        un, sn = opt_n.update(g, sn, params)
        assert np.abs(np.asarray(uw)).max() < np.abs(np.asarray(un)).max()

    def test_weight_decay_pulls_toward_zero(self):
        opt = schedule_free_adamw(0.05, weight_decay=0.5)
        params = jnp.ones(4) * 10.0
        state = opt.init(params)
        import optax

        for _ in range(50):
            g = jnp.zeros(4)  # no data gradient; only decay acts
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert np.abs(np.asarray(params)).max() < 10.0

    def test_tree_structured_params(self):
        opt = schedule_free_adamw(0.01)
        params = {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros(4)}}
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = opt.update(grads, state, params)
        assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(params)
        x = eval_params(state, params)
        assert x["a"].shape == (2, 3)
