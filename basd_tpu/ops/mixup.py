"""On-device MixUp / CutMix with soft targets.

Reference: torchvision v2 `RandomChoice([MixUp(alpha=1), CutMix(alpha=1)])`
applied on-device per batch (`src/training/trainer.py:89-92, 138`): each
step picks ONE of the two transforms, a single lambda ~ Beta(alpha, alpha)
for the whole batch, pairing each sample with its roll-by-1 neighbor, and
returns soft targets lam * y + (1-lam) * y_rolled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup_cutmix(
    images: jax.Array,  # (B, H, W, C) float
    labels: jax.Array,  # (B,) int
    rng: jax.Array,
    *,
    num_classes: int,
    alpha: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    k_choice, k_lam, k_box = jax.random.split(rng, 3)
    use_cutmix = jax.random.bernoulli(k_choice, 0.5)
    lam = jax.random.beta(k_lam, alpha, alpha)

    rolled_images = jnp.roll(images, 1, axis=0)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    rolled_targets = jnp.roll(onehot, 1, axis=0)

    # ---- mixup branch ----
    mixed_mixup = lam * images + (1.0 - lam) * rolled_images

    # ---- cutmix branch: box with area (1 - lam), centered uniformly ----
    h, w = images.shape[1], images.shape[2]
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = cut * h, cut * w
    ky, kx = jax.random.split(k_box)
    cy = jax.random.uniform(ky, (), minval=0.0, maxval=1.0) * h
    cx = jax.random.uniform(kx, (), minval=0.0, maxval=1.0) * w
    y0 = jnp.clip(cy - ch / 2.0, 0.0, h)
    y1 = jnp.clip(cy + ch / 2.0, 0.0, h)
    x0 = jnp.clip(cx - cw / 2.0, 0.0, w)
    x1 = jnp.clip(cx + cw / 2.0, 0.0, w)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
    mixed_cutmix = jnp.where(box, rolled_images, images)
    # effective lambda from clipped box area (torchvision semantics)
    lam_cutmix = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    images_out = jnp.where(use_cutmix, mixed_cutmix, mixed_mixup)
    lam_eff = jnp.where(use_cutmix, lam_cutmix, lam)
    targets = lam_eff * onehot + (1.0 - lam_eff) * rolled_targets
    return images_out, targets
