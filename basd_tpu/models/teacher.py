"""Teacher construction, intermediate extraction, and intrinsic-dim calibration.

Replaces the reference's hook-and-reflection teacher machinery
(`src/models/teacher.py:113-216`): teachers here are our own Flax modules
whose apply functions return every layer's tokens and attention importance
directly, under `stop_gradient` (the reference runs the teacher in
`no_grad`, `teacher.py:180`).

No timm/torch.hub exists on TPU (SURVEY.md hard part 3): teacher parameters
come from (a) random initialization — sufficient for numerics, tests and
step-time benchmarks — or (b) a converted checkpoint file produced by
`basd_tpu.models.convert` from a PyTorch state dict, when one is available
locally (this environment has no network egress).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from basd_tpu.models.cnn import ConvNeXt, ConvNeXtConfig, ResNet, ResNetConfig
from basd_tpu.models.specs import ModelSpec, resolve_preset
from basd_tpu.models.vit import VisionTransformer, ViTConfig
from basd_tpu.spectral import marchenko_pastur_rank


class Teacher(NamedTuple):
    """Frozen teacher bundle (reference `TeacherModel`, `teacher.py:9-20`)."""

    spec: ModelSpec
    module: Any  # Flax module with capture of every layer
    variables: Any  # frozen params (+ batch_stats for CNNs)
    img_size: int
    num_tokens: int
    mean: tuple[float, float, float]
    std: tuple[float, float, float]


def build_teacher_module(spec: ModelSpec, img_size: int, dtype=jnp.bfloat16):
    if spec.family == "vit":
        cfg = ViTConfig(
            img_size=img_size,
            patch_size=spec.patch_size,
            embed_dim=spec.embed_dim,
            depth=spec.depth,
            num_heads=spec.num_heads,
            mlp_ratio=spec.mlp_ratio,
            num_classes=0,
            drop_path_rate=0.0,
            has_cls_token=spec.has_cls_token,
            layer_scale_init=spec.layer_scale_init,
            dtype=dtype,
        )
        return VisionTransformer(cfg, capture_layers=tuple(range(spec.depth)))
    if spec.family == "resnet":
        stage_sizes = (2, 2, 2, 2) if spec.embed_dim <= 512 else (3, 4, 6, 3)
        width = spec.embed_dim // 8
        return ResNet(ResNetConfig(stage_sizes=stage_sizes, width=width, dtype=dtype))
    if spec.family == "convnext":
        if spec.embed_dim <= 64:  # convnextv2_micro (tests)
            return ConvNeXt(ConvNeXtConfig(
                depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                use_grn=spec.name.startswith("convnextv2"), dtype=dtype,
            ))
        return ConvNeXt(
            ConvNeXtConfig(use_grn=spec.name.startswith("convnextv2"), dtype=dtype)
        )
    raise ValueError(f"unknown teacher family {spec.family}")


def load_teacher(
    model_name: str,
    img_size: int,
    *,
    seed: int = 0,
    weights_path: str | None = None,
    dtype=jnp.bfloat16,
    mean: tuple[float, float, float] | None = None,
    std: tuple[float, float, float] | None = None,
) -> Teacher:
    """Build + initialize a frozen teacher (reference `load_teacher`,
    `teacher.py:113-148`).

    Normalization stats resolve in priority order: explicit `mean`/`std`
    args > metadata recorded with the converted checkpoint (the equivalent
    of the reference reading timm's `pretrained_cfg`,
    `teacher.py:128-134`) > the preset's declared defaults."""
    spec = resolve_preset(model_name)
    module = build_teacher_module(spec, img_size, dtype=dtype)

    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    # jit the init: un-jitted flax init dispatches hundreds of eager ops,
    # each a compile round-trip on the remote TPU relay (~0.5 s apiece)
    variables = jax.jit(lambda r, x: module.init(r, x, train=False))(rng, dummy)

    if weights_path is not None:
        from basd_tpu.models.convert import (
            load_checkpoint_stats,
            load_converted_weights,
        )

        variables = load_converted_weights(weights_path, variables)
        ckpt_stats = load_checkpoint_stats(weights_path)
        if ckpt_stats is not None:
            if mean is None:
                mean = ckpt_stats[0]
            if std is None:
                std = ckpt_stats[1]
    if mean is None:
        mean = spec.norm_mean
    if std is None:
        std = spec.norm_std

    variables = jax.tree_util.tree_map(jax.lax.stop_gradient, variables)

    if spec.family == "vit":
        num_tokens = spec.num_tokens(img_size)
    else:
        out = module.apply(variables, dummy, train=False)
        num_tokens = out.tokens.shape[2]

    print(
        f"teacher_loaded model={model_name} embed_dim={spec.embed_dim} "
        f"depth={spec.depth} heads_per_layer={spec.heads_per_layer()} "
        f"mlp_ratio={spec.mlp_ratio:.1f} feature_format={spec.feature_format} "
        f"has_cls={spec.has_cls_token} num_tokens={num_tokens} "
        f"mean={mean} std={std}"
    )

    return Teacher(
        spec=spec,
        module=module,
        variables=variables,
        img_size=img_size,
        num_tokens=num_tokens,
        mean=tuple(mean),
        std=tuple(std),
    )


def extract_intermediates(
    teacher: Teacher, x: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """All-layer tokens (L, B, N, D) + attention importance (L, B, N).

    Jittable, gradient-stopped (reference `extract_intermediates`,
    `teacher.py:180-216`; CNN path = single layer + uniform importance,
    `teacher.py:184-191`).
    """
    out = teacher.module.apply(teacher.variables, x, train=False)
    tokens = jax.lax.stop_gradient(out.tokens)
    importance = jax.lax.stop_gradient(out.importance)
    return tokens, importance


def estimate_intrinsic_dim(teacher: Teacher, images: jax.Array) -> int:
    """Marchenko-Pastur rank of last-layer calibration tokens — the
    teacher's intrinsic dimensionality, which sizes the derived student
    (reference `estimate_intrinsic_dim`, `teacher.py:161-177`).

    Jitted as one program: eager dispatch costs a compile round-trip per op
    on the remote TPU transport."""

    @jax.jit
    def _rank(variables, x):
        out = teacher.module.apply(variables, x, train=False)
        tokens = jax.lax.stop_gradient(out.tokens)
        flat = tokens[-1].reshape(-1, tokens.shape[-1]).astype(jnp.float32)
        return marchenko_pastur_rank(flat)

    return int(_rank(teacher.variables, images))
