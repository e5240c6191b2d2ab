"""Fused Pallas attention kernel (`ops/attention.py`) — interpreter-mode
parity against a plain fp32 softmax(QK^T)V oracle, forward and backward,
including the lane-aligned split-tail variant and the shard_map island
dispatch under the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.ops.attention import (
    _split_tail,
    attention_mesh,
    fused_attention,
    fused_attention_sharded,
    supports_fused,
    use_fused,
)


def oracle(q, k, v):
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))


def _make(b, n, h, hd, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, n, h, hd)).astype(np.float32), dtype
    )
    return mk(), mk(), mk()


class TestFusedAttention:
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 17, 2, 8),  # single-block, CLS-style odd N
            (4, 32, 3, 16),  # single-block, aligned N
            (2, 129, 2, 8),  # split-tail (N % 128 == 1)
        ],
    )
    def test_forward_matches_oracle(self, shape):
        q, k, v = _make(*shape)
        got = fused_attention(q, k, v, True)
        want = oracle(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )

    @pytest.mark.parametrize("shape", [(2, 17, 2, 8), (2, 129, 2, 8)])
    def test_gradients_match_oracle(self, shape):
        q, k, v = _make(*shape, seed=1)

        def loss_fused(q, k, v):
            return jnp.sum(jnp.sin(fused_attention(q, k, v, True)))

        def loss_oracle(q, k, v):
            return jnp.sum(jnp.sin(oracle(q, k, v)))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g1, g2, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"d{name}",
            )

    def test_split_tail_policy(self):
        assert _split_tail(257)  # ViT-B/14 @ 224: 256 patches + CLS
        assert _split_tail(129)
        assert not _split_tail(197)  # ViT-S/16 @ 224
        assert not _split_tail(65)
        assert not _split_tail(1)

    def test_supports_fused_bounds(self):
        assert supports_fused(257, 64)
        assert supports_fused(512, 128)
        assert not supports_fused(513, 64)
        assert not supports_fused(257, 256)

    def test_use_fused_dispatch(self, monkeypatch):
        monkeypatch.setenv("BASD_TPU_ATTENTION", "fused")
        assert use_fused(257, 64, True)
        assert not use_fused(257, 64, False)  # no-CLS needs full attn
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        assert not use_fused(257, 64, True)
        monkeypatch.setenv("BASD_TPU_ATTENTION", "auto")
        # CPU test env: auto falls back to the XLA chain
        assert not use_fused(257, 64, True)

    def test_island_dispatch_under_mesh(self):
        """The ambient-mesh shard_map island must produce identical values
        to the single-device call with batch sharded over 'data' and heads
        over 'model'."""
        from basd_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=4, model=2)
        q, k, v = _make(8, 17, 4, 8, seed=2)
        want = fused_attention(q, k, v, True)

        with attention_mesh(mesh):
            got = jax.jit(
                lambda q, k, v: fused_attention_sharded(q, k, v, True)
            )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )

    def test_model_level_fused_parity(self, monkeypatch):
        """Full ViT forward with BASD_TPU_ATTENTION=fused_interpret must
        match the XLA chain (logits, captured tokens, importance)."""
        from basd_tpu.models.vit import VisionTransformer, ViTConfig

        cfg = ViTConfig(
            img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=2,
            mlp_ratio=2.0, num_classes=7, dtype=jnp.float32,
        )
        model = VisionTransformer(cfg, capture_layers=(0, 1))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)), train=False
        )
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 16, 16, 3)).astype(
                np.float32
            )
        )
        monkeypatch.setenv("BASD_TPU_ATTENTION", "fused_interpret")
        out_f = model.apply(variables, x, train=False)
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        out_x = model.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out_f.logits), np.asarray(out_x.logits), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_f.tokens), np.asarray(out_x.tokens), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_f.importance),
            np.asarray(out_x.importance),
            atol=5e-6,
        )

    def test_model_level_fused_gradients(self, monkeypatch):
        """Student-style fwd+bwd through the custom VJP must match the XLA
        chain's gradients at the parameter level."""
        from basd_tpu.models.vit import VisionTransformer, ViTConfig

        cfg = ViTConfig(
            img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=2,
            mlp_ratio=2.0, num_classes=7, dtype=jnp.float32,
        )
        model = VisionTransformer(cfg, capture_layers=(1,))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)), train=False
        )
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(2, 16, 16, 3)).astype(
                np.float32
            )
        )

        def loss(params):
            out = model.apply({"params": params}, x, train=False)
            return (
                jnp.sum(jnp.sin(out.logits))
                + jnp.sum(jnp.cos(out.tokens))
            )

        monkeypatch.setenv("BASD_TPU_ATTENTION", "fused_interpret")
        g_f = jax.grad(loss)(variables["params"])
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        g_x = jax.grad(loss)(variables["params"])
        flat_f = jax.tree_util.tree_leaves_with_path(g_f)
        flat_x = dict(jax.tree_util.tree_leaves_with_path(g_x))
        for kp, leaf in flat_f:
            a, b = np.asarray(leaf), np.asarray(flat_x[kp])
            # fp32 accumulation-order noise between the custom VJP and
            # XLA autodiff scales with the gradient magnitude
            tol = 5e-5 + 2e-5 * np.abs(b).max()
            np.testing.assert_allclose(
                a, b, atol=tol, err_msg=jax.tree_util.keystr(kp)
            )
