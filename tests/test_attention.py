"""Fused Pallas attention kernel (`ops/attention.py`, lane-sliced native-
layout design) — interpreter-mode parity against a plain fp32
softmax(QK^T)V oracle, forward and backward (XLA-chain VJP), plus the
shard_map island dispatch under the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.ops.attention import (
    attention_mesh,
    fused_attention,
    fused_attention_sharded,
    supports_fused,
    use_fused,
    xla_attention_ref,
)


def oracle(q, k, v, head_dim):
    b, n, d = q.shape
    h = d // head_dim
    qh = q.astype(jnp.float32).reshape(b, n, h, head_dim)
    kh = k.astype(jnp.float32).reshape(b, n, h, head_dim)
    vh = v.astype(jnp.float32).reshape(b, n, h, head_dim)
    s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, vh)
    return out.reshape(b, n, d)


def _make(b, n, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, n, d)).astype(np.float32), dtype
    )
    return mk(), mk(), mk()


class TestFusedAttention:
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 17, 2, 8),  # CLS-style odd N, 2 heads
            (4, 32, 3, 16),  # aligned N, odd head count
            (2, 129, 2, 8),  # N % 128 == 1 (ViT grid + CLS)
            (3, 9, 1, 16),  # odd batch -> per-element grid programs
        ],
    )
    def test_forward_matches_oracle(self, shape):
        b, n, h, hd = shape
        q, k, v = _make(b, n, h * hd)
        got = fused_attention(q, k, v, hd, True)
        want = oracle(q, k, v, hd)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )

    def test_xla_ref_matches_oracle(self):
        q, k, v = _make(2, 17, 24, seed=5)
        np.testing.assert_allclose(
            np.asarray(xla_attention_ref(q, k, v, 8)),
            np.asarray(oracle(q, k, v, 8)),
            atol=5e-6,
        )

    @pytest.mark.parametrize("shape", [(2, 17, 2, 8), (2, 129, 2, 8)])
    def test_gradients_match_oracle(self, shape):
        b, n, h, hd = shape
        q, k, v = _make(b, n, h * hd, seed=1)

        def loss_fused(q, k, v):
            return jnp.sum(jnp.sin(fused_attention(q, k, v, hd, True)))

        def loss_oracle(q, k, v):
            return jnp.sum(jnp.sin(oracle(q, k, v, hd)))

        g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))(q, k, v)
        for a, b_, name in zip(g1, g2, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5,
                err_msg=f"d{name}",
            )

    def test_supports_fused_bounds(self):
        assert supports_fused(257, 768, 64)
        assert supports_fused(512, 2048, 128)
        assert not supports_fused(513, 768, 64)  # N over cap
        assert not supports_fused(257, 768, 256)  # head_dim over cap
        assert not supports_fused(257, 768, 56)  # 768 % 56 != 0
        assert not supports_fused(257, 4096, 64)  # width over cap

    def test_use_fused_dispatch(self, monkeypatch):
        monkeypatch.setenv("BASD_TPU_ATTENTION", "fused")
        assert use_fused(257, 768, 64, True, train=False)
        assert use_fused(257, 768, 64, True, train=True)  # forced
        assert not use_fused(257, 768, 64, False, train=False)  # no-CLS
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        assert not use_fused(257, 768, 64, True, train=False)
        monkeypatch.setenv("BASD_TPU_ATTENTION", "auto")
        # CPU test env: auto falls back to the XLA chain
        assert not use_fused(257, 768, 64, True, train=False)

    def test_island_dispatch_under_mesh(self):
        """The ambient-mesh shard_map island must produce identical values
        to the single-device call with batch sharded over 'data' and head
        lanes over 'model'."""
        from basd_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=4, model=2)
        q, k, v = _make(8, 17, 4 * 8, seed=2)
        want = fused_attention(q, k, v, 8, True)

        with attention_mesh(mesh):
            got = jax.jit(
                lambda q, k, v: fused_attention_sharded(q, k, v, 8, True)
            )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )

    def test_island_dispatch_tp_indivisible_falls_back(self):
        """tp=2 with 3 heads: a model-axis shard would split a head, so
        fused_attention_sharded must route to the XLA chain (not trace
        the kernel into an out-of-bounds lane slice — ADVICE r3)."""
        from basd_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=4, model=2)
        q, k, v = _make(8, 17, 3 * 8, seed=3)
        want = oracle(q, k, v, 8)

        with attention_mesh(mesh):
            got = jax.jit(
                lambda q, k, v: fused_attention_sharded(q, k, v, 8, True)
            )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
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
        """fwd+bwd through the custom VJP (XLA-chain recompute) must match
        the XLA chain's gradients at the parameter level."""
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

        # fresh jit per env (dispatch knob is read at trace time); jitted
        # because eager dispatch costs seconds on the 1-core mesh
        monkeypatch.setenv("BASD_TPU_ATTENTION", "fused_interpret")
        g_f = jax.jit(jax.grad(loss))(variables["params"])
        monkeypatch.setenv("BASD_TPU_ATTENTION", "xla")
        g_x = jax.jit(jax.grad(lambda p: loss(p)))(variables["params"])
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

    def test_auto_dispatch_off_cpu(self, monkeypatch):
        """'auto' must fall back to the XLA chain off-TPU for both train
        and eval forwards (Mosaic cannot compile on the CPU mesh)."""
        monkeypatch.setenv("BASD_TPU_ATTENTION", "auto")
        assert not use_fused(257, 768, 64, True, train=True)
        assert not use_fused(257, 768, 64, True, train=False)
