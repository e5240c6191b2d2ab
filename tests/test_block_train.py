"""Fused whole-block TRAIN kernel (`ops/block_train.py`) — interpret-mode
parity against the XLA Block train path and a hand fp32 oracle (values
and gradients, with and without droppath masks), the stop-gradient
importance contract, dispatch gates, the shard_map island, and the full
model-level fwd+bwd dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.models.vit import Block, VisionTransformer, ViTConfig
from basd_tpu.ops.activations import gelu
from basd_tpu.ops.block_train import (
    fused_block_train,
    fused_block_train_sharded,
    train_block_mesh,
    use_fused_train_block,
)

# smallest shapes that still exercise multi-head lane slicing (HD % 16
# == 0), a CLS token, odd N, and per-sample droppath masks — interpret-
# mode kernel cost scales with size, and this file runs 11 kernels
D, HEADS, N, B = 64, 2, 9, 4
HD = D // HEADS


def _block(dtype=jnp.float32, rate=0.0):
    return Block(D, HEADS, 4.0, rate, True, dtype)


def _params_and_x(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.5, dtype)
    params = _block(dtype).init(
        jax.random.PRNGKey(0), jnp.zeros((1, N, D), dtype), True
    )["params"]
    # shift 1-D leaves off their {0, 1} inits so LN/bias grads are generic
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim == 1 else a, params
    )
    return params, x


def _ln_f32(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"]


def _oracle(params, x, m1, m2, keep):
    """Plain fp32 block with injected droppath masks."""
    y1 = _ln_f32(x, params["norm1"])
    qkv = y1 @ params["attn"]["qkv"]["kernel"] + params["attn"]["qkv"]["bias"]
    outs = []
    for lo in range(0, D, HD):
        q = qkv[:, :, lo : lo + HD] * HD**-0.5
        k = qkv[:, :, D + lo : D + lo + HD]
        v = qkv[:, :, 2 * D + lo : 2 * D + lo + HD]
        p = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q, k), axis=-1)
        outs.append(jnp.einsum("bnm,bmd->bnd", p, v))
    y = jnp.concatenate(outs, axis=-1)
    y = y @ params["attn"]["proj"]["kernel"] + params["attn"]["proj"]["bias"]
    if keep < 1.0:
        y = jnp.where(m1[:, None, None] > 0, y / keep, 0.0)
    x1 = x + y
    h = gelu(_ln_f32(x1, params["norm2"]) @ params["mlp"]["fc1"]["kernel"]
             + params["mlp"]["fc1"]["bias"])
    y2 = h @ params["mlp"]["fc2"]["kernel"] + params["mlp"]["fc2"]["bias"]
    if keep < 1.0:
        y2 = jnp.where(m2[:, None, None] > 0, y2 / keep, 0.0)
    return x1 + y2


def _grad_tree_close(got, want, rtol):
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    for kp, leaf in jax.tree_util.tree_leaves_with_path(got):
        a, b = np.asarray(leaf, np.float32), np.asarray(
            flat_w[kp], np.float32)
        tol = rtol * max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, atol=tol, err_msg=jax.tree_util.keystr(kp)
        )


class TestFusedBlockTrain:
    def test_forward_matches_xla_block(self, monkeypatch):
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        params, x = _params_and_x()
        ones = jnp.ones((B,), jnp.float32)
        out_f, imp_f = fused_block_train(x, params, ones, ones, HD,
                                         1.0, 1.0, True)
        out_x, imp_x = _block().apply({"params": params}, x, False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                                   atol=2e-5)
        # importance contract: kernel emits its own CLS softmax rows;
        # the mean-over-heads reduction happens in the Block wrapper
        got_imp = np.asarray(imp_f[:, 1:, :].mean(axis=-1))
        np.testing.assert_allclose(got_imp, np.asarray(imp_x), atol=2e-5)

    def test_gradients_match_xla_block(self, monkeypatch):
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        params, x = _params_and_x(seed=1)
        ones = jnp.ones((B,), jnp.float32)

        def loss_f(p, xx):
            out, _ = fused_block_train(xx, p, ones, ones, HD, 1.0, 1.0, True)
            return jnp.sum(jnp.sin(out))

        def loss_x(p, xx):
            out, _ = _block().apply({"params": p}, xx, False)
            return jnp.sum(jnp.sin(out))

        # jitted grads: eager interpret-mode dispatch costs seconds on the
        # 1-core mesh; jitted programs are persistent-cache-served warm
        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(params, x)
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(params, x)
        _grad_tree_close(gf[0], gx[0], rtol=3e-5)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gx[1]),
                                   atol=3e-5 * np.abs(gx[1]).max())

    def test_droppath_masks_match_oracle(self):
        params, x = _params_and_x(seed=2)
        keep = 0.7
        m1 = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        m2 = jnp.asarray([1.0, 1.0, 0.0, 0.0])

        def loss_f(p, xx):
            out, _ = fused_block_train(xx, p, m1, m2, HD, keep, keep, True)
            return jnp.sum(jnp.sin(out))

        def loss_o(p, xx):
            return jnp.sum(jnp.sin(_oracle(p, xx, m1, m2, keep)))

        out_f, _ = fused_block_train(x, params, m1, m2, HD, keep, keep, True)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(_oracle(params, x, m1, m2, keep)),
            atol=2e-5,
        )
        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(params, x)
        go = jax.jit(jax.grad(loss_o, argnums=(0, 1)))(params, x)
        _grad_tree_close(gf[0], go[0], rtol=3e-5)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(go[1]),
                                   atol=3e-5 * np.abs(go[1]).max())

    def test_importance_is_stop_gradient(self):
        params, x = _params_and_x(seed=3)
        ones = jnp.ones((B,), jnp.float32)

        def loss(xx):
            _, imp = fused_block_train(xx, params, ones, ones, HD,
                                       1.0, 1.0, True)
            return jnp.sum(imp)

        g = jax.jit(jax.grad(loss))(x)
        assert float(jnp.abs(g).max()) == 0.0

    def test_mask_cotangents_are_zero(self):
        params, x = _params_and_x(seed=4)
        m = jnp.ones((B,), jnp.float32)

        def loss(m1, m2):
            out, _ = fused_block_train(x, params, m1, m2, HD, 0.9, 0.9, True)
            return jnp.sum(out)

        g1, g2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(m, m)
        assert float(jnp.abs(g1).max()) == 0.0
        assert float(jnp.abs(g2).max()) == 0.0

    def test_dispatch_gates(self, monkeypatch):
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "fused")
        assert use_fused_train_block(197, 384, 64, True, False)
        assert not use_fused_train_block(197, 384, 64, True, True)  # LS
        assert not use_fused_train_block(197, 384, 64, False, False)  # CLS
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "xla")
        assert not use_fused_train_block(197, 384, 64, True, False)
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "auto")
        # CPU test env: auto falls back to the XLA chain
        assert not use_fused_train_block(197, 384, 64, True, False)

    def test_dispatch_gate_under_tp_mesh(self, monkeypatch):
        from basd_tpu.parallel.mesh import create_mesh

        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "fused")
        with train_block_mesh(create_mesh(data=4, model=2)):
            assert not use_fused_train_block(197, 384, 64, True, False)
        with train_block_mesh(create_mesh(data=8)):
            assert use_fused_train_block(197, 384, 64, True, False)

    def test_island_dispatch_under_mesh(self):
        """Batch-sharded island must match the single-device call,
        forward and backward."""
        from basd_tpu.parallel.mesh import create_mesh

        params, x = _params_and_x(seed=5)
        x = jnp.concatenate([x, x * 0.5], axis=0)  # batch 8 for data=8
        ones = jnp.ones((2 * B,), jnp.float32)

        def loss(p, xx):
            out, _ = fused_block_train_sharded(xx, p, ones, ones, HD,
                                               1.0, 1.0, interpret=True)
            return jnp.sum(jnp.sin(out))

        want = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        with train_block_mesh(create_mesh(data=8)):
            got = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        _grad_tree_close(got[0], want[0], rtol=3e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=3e-5 * np.abs(want[1]).max())

    def test_model_level_train_parity(self, monkeypatch):
        """Full ViT train-mode fwd+bwd with BASD_TPU_TRAIN_BLOCK=
        fused_interpret must match the XLA chain at drop_path 0 (mask
        bits are rng-stream-dependent at rate > 0 — statistical parity
        only, by design)."""
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        cfg = ViTConfig(
            img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=2,
            mlp_ratio=2.0, num_classes=7, dtype=jnp.float32,
        )
        model = VisionTransformer(cfg, capture_layers=(1,))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)), train=False
        )
        x = jnp.asarray(
            np.random.default_rng(6).normal(size=(2, 16, 16, 3)).astype(
                np.float32))

        def loss(params):
            out = model.apply({"params": params}, x, train=True)
            return jnp.sum(jnp.sin(out.logits)) + jnp.sum(jnp.cos(out.tokens))

        # fresh jit per env (dispatch knob is read at trace time)
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "fused_interpret")
        l_f, g_f = jax.jit(jax.value_and_grad(loss))(variables["params"])
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "xla")
        l_x, g_x = jax.jit(jax.value_and_grad(lambda p: loss(p)))(
            variables["params"]
        )
        np.testing.assert_allclose(float(l_f), float(l_x), rtol=5e-6)
        _grad_tree_close(g_f, g_x, rtol=5e-5)

    @pytest.mark.slow  # droppath law is covered by the mask oracle test;
    # model-level kernel composition by test_model_level_train_parity
    def test_model_level_droppath_runs(self, monkeypatch):
        """rate > 0 on the fused path: masks come from the module's own
        droppath rng stream; gradients stay finite and the masked
        bernoulli law is exercised end to end."""
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "fused_interpret")
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        cfg = ViTConfig(
            img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=2,
            mlp_ratio=2.0, num_classes=7, drop_path_rate=0.5,
            dtype=jnp.float32,
        )
        model = VisionTransformer(cfg, capture_layers=())
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)), train=False
        )
        x = jnp.ones((4, 16, 16, 3), jnp.float32)

        def loss(params):
            out = model.apply(
                {"params": params}, x, train=True,
                rngs={"droppath": jax.random.PRNGKey(11)},
            )
            return jnp.sum(jnp.sin(out.logits))

        g = jax.grad(loss)(variables["params"])
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    @pytest.mark.slow
    def test_remat_compatible(self, monkeypatch):
        """nn.remat around the Block re-runs the kernel forward and uses
        the custom backward — gradients must match the non-remat path.

        Slow-marked (suite budget): value/grad parity rides the
        default-selection test_forward/gradients_match_xla_block pair;
        this adds only the remat wiring of a kernel that stays on XLA
        under 'auto' until hardware confirms it (~9 s interpret cost)."""
        monkeypatch.setenv("BASD_TPU_TRAIN_BLOCK", "fused_interpret")
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=(2, 16, 16, 3)).astype(
                np.float32))

        grads = {}
        for remat in (False, True):
            cfg = ViTConfig(
                img_size=16, patch_size=4, embed_dim=24, depth=2,
                num_heads=2, mlp_ratio=2.0, num_classes=7,
                dtype=jnp.float32, remat=remat,
            )
            model = VisionTransformer(cfg, capture_layers=())
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                train=False,
            )

            def loss(params, model=model):
                out = model.apply({"params": params}, x, train=True)
                return jnp.sum(jnp.sin(out.logits))

            grads[remat] = jax.jit(jax.grad(loss))(variables["params"])
        _grad_tree_close(grads[True], grads[False], rtol=1e-6)
