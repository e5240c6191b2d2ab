"""Static model metadata: the TPU-native replacement for runtime reflection.

The reference probes arbitrary timm modules with forward hooks to discover
embed_dim / depth / heads / mlp_ratio / cls-token / feature-format
(`src/models/teacher.py:42-110`). We ship our own model zoo, so all of that
is *static metadata* declared alongside each preset — no probe forward, no
hooks, and the train step can be jitted against fully static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelSpec:
    """Architecture metadata (mirrors the reference probe dict,
    `teacher.py:100-110`)."""

    name: str
    family: str  # "vit" | "resnet" | "convnext"
    embed_dim: int
    depth: int  # number of feature-extraction layers (ViT blocks / CNN stages)
    num_heads: int  # per-layer heads; CNNs report 1 (uniform attention)
    mlp_ratio: float
    has_cls_token: bool
    feature_format: str  # "token" | "nhwc"
    patch_size: int | None = None
    norm_mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: tuple[float, float, float] = (0.229, 0.224, 0.225)
    # LayerScale gamma init (DINOv2 ViTs: 1e-5); None = plain ViT
    layer_scale_init: float | None = None

    def num_tokens(self, img_size: int) -> int:
        """Patch tokens (CLS excluded), reference `teacher.py:94`."""
        if self.family == "vit":
            return (img_size // self.patch_size) ** 2
        # CNNs: final stage stride 32 (resnet/convnext alike)
        return max(img_size // 32, 1) ** 2

    def heads_per_layer(self) -> list[int]:
        return [self.num_heads] * self.depth if self.feature_format == "token" else [1]


_VIT_PRESETS: dict[str, dict] = {
    # DeiT-style students (reference student_preset deit_*_patch16_224)
    "vit_tiny_patch16": dict(embed_dim=192, depth=12, num_heads=3, patch_size=16),
    "vit_small_patch16": dict(embed_dim=384, depth=12, num_heads=6, patch_size=16),
    "vit_base_patch16": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16),
    "vit_large_patch16": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16),
    # DINOv2-style teachers (patch-14 grids; reference teacher_model_name).
    # Real DINOv2 ViTs carry LayerScale with gamma init 1e-5 — modeling
    # them as plain ViTs made real checkpoints convert into wrong teachers
    # (round-2 VERDICT missing #1).
    "dinov2_vits14": dict(
        embed_dim=384, depth=12, num_heads=6, patch_size=14,
        layer_scale_init=1e-5,
    ),
    "dinov2_vitb14": dict(
        embed_dim=768, depth=12, num_heads=12, patch_size=14,
        layer_scale_init=1e-5,
    ),
    "dinov2_vitl14": dict(
        embed_dim=1024, depth=24, num_heads=16, patch_size=14,
        layer_scale_init=1e-5,
    ),
    # tiny configs for tests / smoke runs
    "vit_micro_patch4": dict(embed_dim=64, depth=4, num_heads=2, patch_size=4),
    "vit_mini_patch4": dict(embed_dim=96, depth=6, num_heads=3, patch_size=4),
    # DINOv2-shaped micro teacher (LayerScale path) for offline tests
    "dinov2_micro_patch4": dict(
        embed_dim=64, depth=4, num_heads=2, patch_size=4,
        layer_scale_init=1e-5,
    ),
}

_CNN_PRESETS: dict[str, dict] = {
    "resnet18": dict(family="resnet", embed_dim=512, depth=4, mlp_ratio=0.0),
    "resnet50": dict(family="resnet", embed_dim=2048, depth=4, mlp_ratio=0.0),
    "convnext_tiny": dict(family="convnext", embed_dim=768, depth=4, mlp_ratio=4.0),
    # ConvNeXt-V2 (GRN MLP, no layer scale) — the reference Table-2
    # cross-architecture teacher is `convnextv2_tiny.fcmae`
    # (`configs/experiment/basd_imagenet_cross_arch.yaml:6`)
    "convnextv2_tiny": dict(family="convnext", embed_dim=768, depth=4, mlp_ratio=4.0),
    "resnet_micro": dict(family="resnet", embed_dim=64, depth=4, mlp_ratio=0.0),
    # 4-stage micro ConvNeXt-V2 (GRN path, stride 32 like the full-size
    # family so ModelSpec.num_tokens holds) — offline cross-arch parity
    # tests (Table-2 semantics: nhwc tokens, no CLS, uniform attention)
    "convnextv2_micro": dict(family="convnext", embed_dim=64, depth=4, mlp_ratio=4.0),
}


def resolve_preset(name: str) -> ModelSpec:
    if name not in _VIT_PRESETS and name not in _CNN_PRESETS and "." in name:
        # timm-style pretrained tag (`convnextv2_tiny.fcmae`): the tag names
        # a weight recipe, not an architecture — strip it
        name = name.split(".", 1)[0]
    if name in _VIT_PRESETS:
        p = _VIT_PRESETS[name]
        return ModelSpec(
            name=name,
            family="vit",
            embed_dim=p["embed_dim"],
            depth=p["depth"],
            num_heads=p["num_heads"],
            mlp_ratio=4.0,
            has_cls_token=True,
            feature_format="token",
            patch_size=p["patch_size"],
            layer_scale_init=p.get("layer_scale_init"),
        )
    if name in _CNN_PRESETS:
        p = _CNN_PRESETS[name]
        return ModelSpec(
            name=name,
            family=p["family"],
            embed_dim=p["embed_dim"],
            depth=p["depth"],
            num_heads=1,
            mlp_ratio=p["mlp_ratio"],
            has_cls_token=False,
            feature_format="nhwc",
        )
    raise KeyError(
        f"unknown model preset '{name}'; available: "
        f"{sorted([*_VIT_PRESETS, *_CNN_PRESETS])}"
    )
