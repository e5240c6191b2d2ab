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


class TestCNNConversion:
    def test_resnet_round_trip(self, tmp_path):
        from basd_tpu.models.cnn import ResNet, ResNetConfig

        rng = np.random.default_rng(3)
        sizes = (1, 1, 1, 1)
        width = 8
        state = {}
        state["conv1.weight"] = rng.normal(size=(width, 3, 7, 7)).astype(np.float32)
        for tag, c in [("bn1", width)]:
            state[f"{tag}.weight"] = np.ones(c, np.float32)
            state[f"{tag}.bias"] = np.zeros(c, np.float32)
            state[f"{tag}.running_mean"] = rng.normal(size=c).astype(np.float32)
            state[f"{tag}.running_var"] = np.abs(rng.normal(size=c)).astype(np.float32) + 1
        for s in range(4):
            cin = width * (2 ** max(s - 1, 0)) if s else width
            cout = width * (2**s)
            t = f"layer{s + 1}.0."
            state[t + "conv1.weight"] = rng.normal(size=(cout, cin, 3, 3)).astype(np.float32)
            state[t + "conv2.weight"] = rng.normal(size=(cout, cout, 3, 3)).astype(np.float32)
            for bn in ("bn1", "bn2"):
                state[t + bn + ".weight"] = np.ones(cout, np.float32)
                state[t + bn + ".bias"] = np.zeros(cout, np.float32)
                state[t + bn + ".running_mean"] = np.zeros(cout, np.float32)
                state[t + bn + ".running_var"] = np.ones(cout, np.float32)
            if s > 0:
                state[t + "downsample.0.weight"] = rng.normal(
                    size=(cout, cin, 1, 1)
                ).astype(np.float32)
                state[t + "downsample.1.weight"] = np.ones(cout, np.float32)
                state[t + "downsample.1.bias"] = np.zeros(cout, np.float32)
                state[t + "downsample.1.running_mean"] = np.zeros(cout, np.float32)
                state[t + "downsample.1.running_var"] = np.ones(cout, np.float32)
        path = tmp_path / "resnet.npz"
        np.savez(path, **state)

        model = ResNet(ResNetConfig(stage_sizes=sizes, width=width, dtype=jnp.float32))
        x = jnp.zeros((1, 32, 32, 3))
        template = model.init(jax.random.PRNGKey(0), x, train=False)
        variables = load_converted_weights(path, template)

        got = np.asarray(variables["params"]["stem_conv"]["kernel"])
        np.testing.assert_array_equal(
            got, np.transpose(state["conv1.weight"], (2, 3, 1, 0))
        )
        got_bn = np.asarray(variables["batch_stats"]["stem_bn"]["mean"])
        np.testing.assert_array_equal(got_bn, state["bn1.running_mean"])
        out = model.apply(variables, x, train=False)
        assert np.all(np.isfinite(np.asarray(out.tokens)))

    def test_convnext_round_trip(self, tmp_path):
        from basd_tpu.models.cnn import ConvNeXt, ConvNeXtConfig

        rng = np.random.default_rng(4)
        depths, dims = (1, 1, 1, 1), (8, 16, 24, 32)
        state = {
            "stem.0.weight": rng.normal(size=(dims[0], 3, 4, 4)).astype(np.float32),
            "stem.0.bias": np.zeros(dims[0], np.float32),
            "stem.1.weight": np.ones(dims[0], np.float32),
            "stem.1.bias": np.zeros(dims[0], np.float32),
        }
        for s, d in enumerate(dims):
            if s > 0:
                state[f"stages.{s}.downsample.0.weight"] = np.ones(dims[s - 1], np.float32)
                state[f"stages.{s}.downsample.0.bias"] = np.zeros(dims[s - 1], np.float32)
                state[f"stages.{s}.downsample.1.weight"] = rng.normal(
                    size=(d, dims[s - 1], 2, 2)
                ).astype(np.float32)
                state[f"stages.{s}.downsample.1.bias"] = np.zeros(d, np.float32)
            t = f"stages.{s}.blocks.0."
            state[t + "conv_dw.weight"] = rng.normal(size=(d, 1, 7, 7)).astype(np.float32)
            state[t + "conv_dw.bias"] = np.zeros(d, np.float32)
            state[t + "norm.weight"] = np.ones(d, np.float32)
            state[t + "norm.bias"] = np.zeros(d, np.float32)
            state[t + "mlp.fc1.weight"] = rng.normal(size=(4 * d, d)).astype(np.float32)
            state[t + "mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
            state[t + "mlp.fc2.weight"] = rng.normal(size=(d, 4 * d)).astype(np.float32)
            state[t + "mlp.fc2.bias"] = np.zeros(d, np.float32)
            state[t + "gamma"] = np.full(d, 1e-6, np.float32)
        path = tmp_path / "convnext.npz"
        np.savez(path, **state)

        model = ConvNeXt(ConvNeXtConfig(depths=depths, dims=dims, dtype=jnp.float32))
        x = jnp.zeros((1, 32, 32, 3))
        template = model.init(jax.random.PRNGKey(0), x, train=False)
        variables = load_converted_weights(path, template)
        got = np.asarray(variables["params"]["stage1_block0"]["pwconv1"]["kernel"])
        np.testing.assert_array_equal(got, state["stages.1.blocks.0.mlp.fc1.weight"].T)
        out = model.apply(variables, x, train=False)
        assert np.all(np.isfinite(np.asarray(out.tokens)))
