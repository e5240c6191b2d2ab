"""Flax CNN teachers (ResNet, ConvNeXt) with the unified token interface.

The reference unifies CNN teachers under the ViT interface by treating the
final feature map as single-layer tokens with uniform attention
(`src/models/teacher.py:184-191`, README). Here the CNNs natively emit
(1, B, N, D) token stacks and a uniform importance vector — NHWC layout
throughout (the TPU-preferred conv layout; the reference's NCHW/NHWC
canonicalizer `teacher.py:151-158` disappears by construction).

Teachers are frozen (reference `teacher.py:123-124`), so BatchNorm always
runs with running statistics (eval semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basd_tpu.models.vit import he_conv_init
from basd_tpu.ops.activations import gelu as fast_gelu


class CNNOutput(NamedTuple):
    logits: jax.Array  # (B, num_classes)
    tokens: jax.Array  # (1, B, N, D) final-stage feature-map tokens
    importance: jax.Array  # (1, B, N) uniform 1/N


def _uniform_importance(b: int, n: int) -> jax.Array:
    return jnp.full((1, b, n), 1.0 / n, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: tuple[int, ...] = (2, 2, 2, 2)  # resnet18
    width: int = 64
    num_classes: int = 0
    dtype: Any = jnp.bfloat16


class BasicBlock(nn.Module):
    filters: int
    strides: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            use_bias=False, dtype=self.dtype, kernel_init=he_conv_init,
            name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), use_bias=False, dtype=self.dtype,
            kernel_init=he_conv_init, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, kernel_init=he_conv_init,
                name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=True, dtype=self.dtype, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    config: ResNetConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> CNNOutput:
        cfg = self.config
        x = x.astype(cfg.dtype)
        x = nn.Conv(
            cfg.width, (7, 7), strides=(2, 2), use_bias=False,
            dtype=cfg.dtype, kernel_init=he_conv_init, name="stem_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, dtype=cfg.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for stage, num_blocks in enumerate(cfg.stage_sizes):
            filters = cfg.width * (2**stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(
                    filters, strides, cfg.dtype, name=f"stage{stage}_block{block}"
                )(x)

        b, h, w, d = x.shape
        tokens = x.reshape(b, h * w, d).astype(jnp.float32)[None]

        pooled = x.mean(axis=(1, 2)).astype(jnp.float32)
        if cfg.num_classes > 0:
            logits = nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(pooled)
        else:
            logits = pooled
        return CNNOutput(logits, tokens, _uniform_importance(b, h * w))


# ---------------------------------------------------------------------------
# ConvNeXt
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple[int, ...] = (3, 3, 9, 3)  # convnext-tiny
    dims: tuple[int, ...] = (96, 192, 384, 768)
    num_classes: int = 0
    use_grn: bool = False  # ConvNeXt-V2: GRN in the MLP, no layer scale
    dtype: Any = jnp.bfloat16


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-V2, Woo et al. 2023).

    gx = ||y||_2 over spatial positions per channel; nx = gx / mean_c(gx);
    out = gamma * (y * nx) + beta + y, with gamma/beta zero-initialized so
    the layer starts as identity. fp32 norm arithmetic (a spatial L2 over
    thousands of positions overflows bf16's 8-bit exponent headroom at the
    margins and loses the mean's precision)."""

    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        yf = y.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(yf * yf, axis=(1, 2), keepdims=True))  # (B,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        out = gamma * (yf * nx) + beta + yf
        return out.astype(self.dtype)


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Any
    use_grn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(
            self.dim, (7, 7), feature_group_count=self.dim, dtype=self.dtype,
            kernel_init=he_conv_init, name="dwconv",
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        # exact GELU in tanh form (ops/activations.py) — fp32-ulp match
        # to erf-GELU at tanh speed
        y = fast_gelu(y)
        if self.use_grn:
            # V2 MLP: fc1 -> gelu -> GRN -> fc2 (timm GlobalResponseNormMlp);
            # V2 drops the V1 layer scale entirely
            y = GRN(4 * self.dim, self.dtype, name="grn")(y)
            y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
            return x + y
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,)
        )
        return x + gamma.astype(self.dtype) * y


class ConvNeXt(nn.Module):
    config: ConvNeXtConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> CNNOutput:
        cfg = self.config
        x = x.astype(cfg.dtype)
        x = nn.Conv(
            cfg.dims[0], (4, 4), strides=(4, 4), dtype=cfg.dtype,
            kernel_init=he_conv_init, name="stem_conv",
        )(x)
        x = nn.LayerNorm(dtype=cfg.dtype, name="stem_norm")(x)

        for stage, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if stage > 0:
                x = nn.LayerNorm(dtype=cfg.dtype, name=f"down{stage}_norm")(x)
                x = nn.Conv(
                    dim, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                    kernel_init=he_conv_init, name=f"down{stage}_conv",
                )(x)
            for block in range(depth):
                x = ConvNeXtBlock(
                    dim, cfg.dtype, cfg.use_grn,
                    name=f"stage{stage}_block{block}",
                )(x)

        b, h, w, d = x.shape
        tokens = x.reshape(b, h * w, d).astype(jnp.float32)[None]

        pooled = x.mean(axis=(1, 2)).astype(jnp.float32)
        if cfg.num_classes > 0:
            logits = nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(pooled)
        else:
            logits = pooled
        return CNNOutput(logits, tokens, _uniform_importance(b, h * w))
