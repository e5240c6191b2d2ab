"""Dual-view device preprocessing from a single uint8 copy.

The reference ships two fully-transformed fp32 views of every train image
(clean view with the TEACHER's normalization, augmented view with streamed
dataset stats — `src/data/datasets.py:146-156`), doubling host->device
bandwidth. TPU-first: ship uint8 once and derive both views on device
(SURVEY.md hard part 7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from basd_tpu.ops.augment import (
    normalize,
    random_resized_crop,
    resize_bilinear,
    trivial_augment_wide,
)


def to_float(images_u8: jax.Array) -> jax.Array:
    return images_u8.astype(jnp.float32) / 255.0


def center_crop_resize(
    images: jax.Array, img_size: int, crop_ratio: float
) -> jax.Array:
    """Eval transform: Resize(round(img/crop_ratio)) -> CenterCrop(img)
    (reference `build_eval_transform`, `datasets.py:80-94`)."""
    resize_size = round(img_size / crop_ratio)
    # static skip when the host already delivers raw == resize_size (both
    # bench workloads: raw = img + 2*patch with the eval_crop_ratio
    # resolver) — the matmul resampler is not free even at identity
    if images.shape[1] != resize_size or images.shape[2] != resize_size:
        images = resize_bilinear(images, resize_size, resize_size)
    off = (resize_size - img_size) // 2
    return images[:, off : off + img_size, off : off + img_size, :]


def eval_view(
    images_u8: jax.Array, img_size: int, crop_ratio: float, mean, std
) -> jax.Array:
    return normalize(
        center_crop_resize(to_float(images_u8), img_size, crop_ratio), mean, std
    )


def dual_view_eval(
    images_u8: jax.Array,
    *,
    img_size: int,
    crop_ratio: float,
    teacher_stats: tuple,
    dataset_stats: tuple,
) -> tuple[jax.Array, jax.Array]:
    """Deterministic (augmentation-off) dual view: BOTH views are the
    eval transform; only the normalization stats differ. Used by
    `make_train_step(augment=False)` — debugging/parity runs where the
    stochastic train pipeline must be silenced — and by the full-step
    trajectory parity test, which recomputes the identical views for the
    torch reference side."""
    base = center_crop_resize(to_float(images_u8), img_size, crop_ratio)
    return normalize(base, *teacher_stats), normalize(base, *dataset_stats)


def dual_view(
    images_u8: jax.Array,
    rng: jax.Array,
    *,
    img_size: int,
    crop_ratio: float,
    teacher_stats: tuple,
    dataset_stats: tuple,
) -> tuple[jax.Array, jax.Array]:
    """(clean, augmented) training views from one uint8 batch.

    clean: eval transform + teacher normalization (feeds the frozen teacher).
    augmented: RandomResizedCrop + HFlip + TrivialAugmentWide + dataset
    normalization (feeds the student) — reference `datasets.py:137-156`.
    """
    x = to_float(images_u8)

    clean = center_crop_resize(x, img_size, crop_ratio)
    clean = normalize(clean, *teacher_stats)

    k_rrc, k_flip, k_ta = jax.random.split(rng, 3)
    aug = random_resized_crop(x, k_rrc, img_size)
    aug = jnp.clip(aug, 0.0, 1.0)
    # hflip folds into trivial_augment (the fused warp kernel applies it
    # in its first pass; the XLA fallback applies it up front) — same
    # semantics as hflip(aug) THEN trivial_augment_wide(aug)
    flip = jax.random.bernoulli(k_flip, 0.5, (aug.shape[0],))
    aug = trivial_augment_wide(aug, k_ta, flip_mask=flip)
    aug = normalize(aug, *dataset_stats)
    return clean, aug
