"""Model zoo: shapes, intermediates, importance semantics, teacher bundle."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from basd_tpu.models import (
    ConvNeXt,
    ConvNeXtConfig,
    ResNet,
    ResNetConfig,
    VisionTransformer,
    ViTConfig,
    create_student,
    derive_student_arch,
    estimate_intrinsic_dim,
    extract_intermediates,
    load_teacher,
    resolve_preset,
)


def _tiny_vit(**kw):
    defaults = dict(
        img_size=16, patch_size=4, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=2.0, num_classes=5, dtype=jnp.float32,
    )
    defaults.update(kw)
    return ViTConfig(**defaults)


class TestViT:
    def test_output_shapes(self):
        cfg = _tiny_vit()
        model = VisionTransformer(cfg, capture_layers=(0, 2))
        x = jnp.ones((2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.logits.shape == (2, 5)
        assert out.tokens.shape == (2, 2, 16, 32)  # (P, B, N, D)
        assert out.importance.shape == (2, 2, 16)

    def test_importance_is_cls_attention(self):
        # CLS-row importance: nonnegative, sums to <= 1 (CLS->CLS excluded)
        cfg = _tiny_vit()
        model = VisionTransformer(cfg, capture_layers=(1,))
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        imp = np.asarray(out.importance[0])
        assert (imp >= 0).all()
        assert (imp.sum(-1) <= 1.0 + 1e-5).all()

    def test_no_cls_importance_uniform_sum(self):
        cfg = _tiny_vit(has_cls_token=False)
        model = VisionTransformer(cfg, capture_layers=(0,))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        imp = np.asarray(out.importance[0])
        np.testing.assert_allclose(imp.sum(-1), 1.0, atol=1e-5)

    def test_eval_deterministic(self):
        cfg = _tiny_vit(drop_path_rate=0.2)
        model = VisionTransformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a.logits), np.asarray(b.logits))

    def test_drop_path_stochastic_in_train(self):
        cfg = _tiny_vit(drop_path_rate=0.5)
        model = VisionTransformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        a = model.apply(
            variables, x, train=True, rngs={"droppath": jax.random.PRNGKey(2)}
        )
        b = model.apply(
            variables, x, train=True, rngs={"droppath": jax.random.PRNGKey(3)}
        )
        assert np.abs(np.asarray(a.logits) - np.asarray(b.logits)).max() > 1e-6

    def test_remat_matches_no_remat(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        m1 = VisionTransformer(_tiny_vit(remat=False), capture_layers=(2,))
        m2 = VisionTransformer(_tiny_vit(remat=True), capture_layers=(2,))
        v = m1.init(jax.random.PRNGKey(0), x, train=False)
        a = m1.apply(v, x, train=False)
        b = m2.apply(v, x, train=False)
        np.testing.assert_allclose(
            np.asarray(a.logits), np.asarray(b.logits), atol=1e-5
        )

    def test_headless_teacher_mode(self):
        cfg = _tiny_vit(num_classes=0)
        model = VisionTransformer(cfg)
        x = jnp.ones((2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.logits.shape == (2, 32)  # pooled features


class TestCNN:
    def test_resnet_tokens(self):
        model = ResNet(ResNetConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                    dtype=jnp.float32))
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.tokens.shape[0] == 1  # single extraction layer
        assert out.tokens.shape[1] == 2
        n = out.tokens.shape[2]
        np.testing.assert_allclose(
            np.asarray(out.importance), 1.0 / n, atol=1e-7
        )

    def test_convnext_tokens(self):
        model = ConvNeXt(
            ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                           dtype=jnp.float32)
        )
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.tokens.shape == (1, 2, 1, 32)


class TestTeacher:
    def test_load_and_extract(self):
        teacher = load_teacher("vit_mini_patch4", img_size=16, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
        tokens, imp = jax.jit(lambda x: extract_intermediates(teacher, x))(x)
        assert tokens.shape == (6, 2, 16, 96)  # (L, B, N, D)
        assert imp.shape == (6, 2, 16)

    def test_intrinsic_dim(self):
        teacher = load_teacher("vit_mini_patch4", img_size=16, dtype=jnp.float32)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
        d = estimate_intrinsic_dim(teacher, imgs)
        assert isinstance(d, int)
        assert 0 <= d <= 96

    def test_cnn_teacher(self):
        teacher = load_teacher("resnet_micro", img_size=32, dtype=jnp.float32)
        x = jnp.ones((2, 32, 32, 3))
        tokens, imp = jax.jit(lambda x: extract_intermediates(teacher, x))(x)
        assert tokens.shape[0] == 1
        assert imp.shape[:2] == (1, 2)


class TestFactory:
    def test_derive_from_teacher(self):
        # reference train.py:57-66: head_dim inherited, width = ceil to
        # head multiple capped at teacher dim
        spec = resolve_preset("dinov2_vitb14")  # 768 dim, 12 heads -> hd 64
        arch = derive_student_arch(spec, intrinsic_dim=150)
        assert arch["embed_dim"] == 192  # ceil(150/64)*64
        assert arch["num_heads"] == 3
        assert arch["depth"] == 12
        arch2 = derive_student_arch(spec, intrinsic_dim=10_000)
        assert arch2["embed_dim"] == 768  # capped at teacher width

    def test_create_student_with_overrides(self):
        model, cfg = create_student(
            "vit_tiny_patch16",
            num_classes=10,
            drop_path_rate=0.1,
            img_size=32,
            arch_overrides={"embed_dim": 64, "depth": 2, "num_heads": 2,
                            "mlp_ratio": 2.0, "patch_size": 8},
            capture_layers=(0, 1),
            dtype=jnp.float32,
            remat=False,
        )
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.logits.shape == (2, 10)
        assert out.tokens.shape == (2, 2, 16, 64)


class TestFusedMlpBlock:
    """Interpret-mode parity of the fused MLP half-block kernel
    (ops/mlp_kernel.py) against the XLA Block tail, exercising the real
    kernel math on the CPU mesh. The kernel replicates the XLA dtype
    chain, so tolerance is one bf16 rounding."""

    def _block_params(self, d, hidden, ls, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        p = {
            "norm2": {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(d),
                                           jnp.float32),
                      "bias": jnp.asarray(0.1 * rng.standard_normal(d),
                                          jnp.float32)},
            "mlp": {"fc1": {"kernel": jnp.asarray(
                        rng.standard_normal((d, hidden)) * 0.05, jnp.float32),
                        "bias": jnp.asarray(0.02 * rng.standard_normal(hidden),
                                            jnp.float32)},
                    "fc2": {"kernel": jnp.asarray(
                        rng.standard_normal((hidden, d)) * 0.05, jnp.float32),
                        "bias": jnp.asarray(0.02 * rng.standard_normal(d),
                                            jnp.float32)}},
        }
        if ls:
            p["ls2"] = jnp.asarray(
                1e-5 * (1 + rng.standard_normal(d)), jnp.float32)
        return p

    @pytest.mark.parametrize("ls", [False, True])
    def test_matches_xla_tail(self, ls):
        import numpy as np

        from basd_tpu.ops.mlp_kernel import fused_mlp_block

        d, hidden, b, n = 128, 512, 4, 33
        p = self._block_params(d, hidden, ls)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.5, jnp.bfloat16)

        def xla_tail(x):
            import flax.linen as nn_

            from basd_tpu.models.vit import Mlp
            from basd_tpu.ops.activations import gelu as fg

            ln = nn_.LayerNorm(dtype=jnp.bfloat16, name="n")
            y = ln.apply({"params": p["norm2"]}, x)
            mlp = Mlp(d, hidden, jnp.bfloat16)
            y = mlp.apply({"params": p["mlp"]}, y)
            if ls:
                y = y * p["ls2"].astype(jnp.bfloat16)
            return x + y

        want = np.asarray(jax.jit(xla_tail)(x), np.float32)
        got = np.asarray(jax.jit(lambda x: fused_mlp_block(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
            p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
            p["ls2"] if ls else None, interpret=True,
        ))(x), np.float32)
        np.testing.assert_allclose(got, want, atol=0.04, rtol=0.02)

    def test_block_dispatch_parity(self, monkeypatch):
        import numpy as np

        from basd_tpu.models.vit import Block

        d, b, n = 128, 4, 33
        block = Block(d, 4, 4.0, 0.0, True, jnp.bfloat16,
                      layer_scale_init=1e-5)
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((b, n, d)) * 0.5,
            jnp.bfloat16)
        monkeypatch.setenv("BASD_TPU_MLP", "fused_interpret")
        params = jax.jit(lambda: block.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n, d), jnp.bfloat16),
            True)["params"])()
        got = jax.jit(lambda p, x: block.apply({"params": p}, x, True)[0])(
            params, x)
        monkeypatch.setenv("BASD_TPU_MLP", "xla")
        want = jax.jit(lambda p, x: block.apply({"params": p}, x, True)[0])(
            params, x)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.04, rtol=0.02)
        # param structure identical across dispatches (checkpoint compat)
        monkeypatch.setenv("BASD_TPU_MLP", "xla")
        params_xla = jax.jit(lambda: block.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n, d), jnp.bfloat16),
            True)["params"])()
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_xla)


class TestFusedBlockKernel:
    """Interpret-mode parity of the whole-block fused kernel
    (ops/block_kernel.py) against the XLA Block path at model level:
    tokens to bf16 rounding, importance to the bf16-vs-fp32 attention
    matmul gap."""

    @pytest.mark.parametrize("ls", [False, True])
    def test_block_dispatch_parity(self, ls, monkeypatch):
        from basd_tpu.models.vit import Block

        d, heads, b, n = 128, 4, 4, 17
        block = Block(d, heads, 4.0, 0.0, True, jnp.bfloat16,
                      layer_scale_init=1e-2 if ls else None)
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((b, n, d)) * 0.5,
            jnp.bfloat16)
        monkeypatch.setenv("BASD_TPU_BLOCK", "fused_interpret")
        monkeypatch.setenv("BASD_TPU_MLP", "xla")
        params = jax.jit(lambda: block.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n, d), jnp.bfloat16),
            True)["params"])()
        got, imp_got = jax.jit(
            lambda p, x: block.apply({"params": p}, x, True))(params, x)
        monkeypatch.setenv("BASD_TPU_BLOCK", "xla")
        want, imp_want = jax.jit(
            lambda p, x: block.apply({"params": p}, x, True))(params, x)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.04, rtol=0.02)
        # kernel importance uses the attention's own bf16-prescaled-q
        # contract; the XLA side recompute is fp32 — bf16-level gap
        np.testing.assert_allclose(
            np.asarray(imp_got), np.asarray(imp_want), atol=2e-3)
        # param structure identical across dispatches (checkpoint compat)
        monkeypatch.setenv("BASD_TPU_BLOCK", "xla")
        params_xla = jax.jit(lambda: block.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n, d), jnp.bfloat16),
            True)["params"])()
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_xla)
