"""Student construction + teacher-derived architecture sizing.

Reference `_create_student` / `_derive_from_teacher` (`src/train.py:35-66`):
the student's width is a runtime function of the teacher's spectrum —
head_dim is inherited from the teacher, embed_dim is the intrinsic dim
rounded up to a head multiple and capped at the teacher width, depth and
mlp_ratio copied. This staging runs *before* the train step is jitted, so
all shapes are static afterwards (SURVEY.md section 3.5).
"""

from __future__ import annotations

import jax.numpy as jnp

from basd_tpu.models.specs import ModelSpec, resolve_preset
from basd_tpu.models.vit import VisionTransformer, ViTConfig


def derive_student_arch(teacher_spec: ModelSpec, intrinsic_dim: int) -> dict:
    """embed_dim = ceil(intrinsic/head_dim)*head_dim capped at teacher dim;
    depth, mlp_ratio, head_dim inherited (reference `train.py:57-66`)."""
    head_dim = teacher_spec.embed_dim // teacher_spec.heads_per_layer()[0]
    d_s = -(-intrinsic_dim // head_dim) * head_dim  # ceil to head multiple
    d_s = min(d_s, teacher_spec.embed_dim)
    return {
        "embed_dim": d_s,
        "depth": teacher_spec.depth,
        "num_heads": d_s // head_dim,
        "mlp_ratio": teacher_spec.mlp_ratio,
    }


def create_student(
    preset: str,
    *,
    num_classes: int,
    drop_path_rate: float,
    img_size: int,
    arch_overrides: dict | None = None,
    capture_layers: tuple[int, ...] = (),
    dtype=jnp.bfloat16,
    remat: bool = True,
) -> tuple[VisionTransformer, ViTConfig]:
    """Build the student module (uninitialized — init happens in the
    trainer with the run's PRNG). Mirrors reference `_create_student`
    (`train.py:35-54`): preset + arch_overrides + fan-in init (built into
    the module's initializers) + gradient checkpointing (remat)."""
    spec = resolve_preset(preset)
    if spec.family != "vit":
        raise ValueError("students are ViTs (reference student_preset=deit_*)")

    overrides = dict(arch_overrides or {})
    cfg = ViTConfig(
        img_size=img_size,
        patch_size=overrides.pop("patch_size", spec.patch_size),
        embed_dim=overrides.pop("embed_dim", spec.embed_dim),
        depth=overrides.pop("depth", spec.depth),
        num_heads=overrides.pop("num_heads", spec.num_heads),
        mlp_ratio=overrides.pop("mlp_ratio", spec.mlp_ratio),
        num_classes=num_classes,
        drop_path_rate=drop_path_rate,
        has_cls_token=True,
        dtype=dtype,
        remat=remat,
    )
    if overrides:
        raise ValueError(f"unsupported arch_overrides: {sorted(overrides)}")
    return VisionTransformer(cfg, capture_layers=capture_layers), cfg
