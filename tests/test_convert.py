"""torch->flax checkpoint conversion: mapping, layouts, grafting."""

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.models import VisionTransformer, ViTConfig
from basd_tpu.models.convert import load_converted_weights, torch_vit_to_flax


def _make_torch_style_state(cfg: ViTConfig, rng) -> dict:
    """Synthesize a timm/DINOv2-style state dict with correct shapes."""
    d, depth = cfg.embed_dim, cfg.depth
    hidden = int(d * cfg.mlp_ratio)
    n = cfg.num_patches + 1
    s = {
        "patch_embed.proj.weight": rng.normal(
            size=(d, 3, cfg.patch_size, cfg.patch_size)
        ).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(d,)).astype(np.float32),
        "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, n, d)).astype(np.float32),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
        "head.weight": rng.normal(size=(cfg.num_classes, d)).astype(np.float32),
        "head.bias": np.zeros(cfg.num_classes, np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        s[b + "norm1.weight"] = np.ones(d, np.float32)
        s[b + "norm1.bias"] = np.zeros(d, np.float32)
        s[b + "attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        s[b + "attn.qkv.bias"] = np.zeros(3 * d, np.float32)
        s[b + "attn.proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        s[b + "attn.proj.bias"] = np.zeros(d, np.float32)
        s[b + "norm2.weight"] = np.ones(d, np.float32)
        s[b + "norm2.bias"] = np.zeros(d, np.float32)
        s[b + "mlp.fc1.weight"] = rng.normal(size=(hidden, d)).astype(np.float32)
        s[b + "mlp.fc1.bias"] = np.zeros(hidden, np.float32)
        s[b + "mlp.fc2.weight"] = rng.normal(size=(d, hidden)).astype(np.float32)
        s[b + "mlp.fc2.bias"] = np.zeros(d, np.float32)
    return s


def _cfg():
    return ViTConfig(
        img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=2,
        mlp_ratio=2.0, num_classes=7, dtype=jnp.float32,
    )


class TestConversion:
    def test_mapping_shapes_and_layouts(self):
        cfg = _cfg()
        rng = np.random.default_rng(0)
        state = _make_torch_style_state(cfg, rng)
        p = torch_vit_to_flax(state, cfg.depth)
        # linear kernels transposed to (in, out)
        assert p["block0"]["attn"]["qkv"]["kernel"].shape == (24, 72)
        np.testing.assert_array_equal(
            p["block0"]["attn"]["qkv"]["kernel"],
            state["blocks.0.attn.qkv.weight"].T,
        )
        # conv kernel to (kh, kw, in, out)
        assert p["patch_embed"]["kernel"].shape == (4, 4, 3, 24)

    def test_npz_round_trip_forward(self, tmp_path):
        cfg = _cfg()
        rng = np.random.default_rng(1)
        state = _make_torch_style_state(cfg, rng)
        path = tmp_path / "teacher.npz"
        np.savez(path, **state)

        model = VisionTransformer(cfg, capture_layers=(0, 1))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
        template = model.init(jax.random.PRNGKey(1), x, train=False)
        variables = load_converted_weights(path, template)

        # imported params actually replace the random init
        qkv = np.asarray(variables["params"]["block0"]["attn"]["qkv"]["kernel"])
        np.testing.assert_array_equal(qkv, state["blocks.0.attn.qkv.weight"].T)

        out = model.apply(variables, x, train=False)
        assert np.all(np.isfinite(np.asarray(out.logits)))
        assert out.tokens.shape == (2, 2, 16, 24)

    def test_shape_mismatch_raises(self, tmp_path):
        cfg = _cfg()
        rng = np.random.default_rng(2)
        state = _make_torch_style_state(cfg, rng)
        state["pos_embed"] = np.zeros((1, 99, 24), np.float32)  # wrong N
        path = tmp_path / "bad.npz"
        np.savez(path, **state)
        model = VisionTransformer(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        template = model.init(jax.random.PRNGKey(0), x, train=False)
        try:
            load_converted_weights(path, template)
            assert False, "expected shape mismatch error"
        except ValueError as e:
            assert "shape" in str(e)
