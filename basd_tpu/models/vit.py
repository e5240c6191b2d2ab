"""Flax Vision Transformer (DeiT family) that returns its intermediates.

TPU-first design decision (SURVEY.md section 7): instead of the reference's
forward hooks on hidden modules (`src/training/trainer.py:16-37`,
`src/models/teacher.py:180-216`), the model *returns* per-layer tokens and
per-layer attention importance from its apply function, so the whole
distillation step is one jittable pure function.

Attention importance replaces the reference's full attention-map capture
(`teacher.py:27-39`): the downstream Procrustes loss only ever reduces the
attention tensor to a per-token importance vector — CLS row mean over heads
when a CLS token exists (`relational.py:24`), mean over heads x queries
otherwise (`relational.py:27`) — and the selector mixes attention maps
*linearly* (`layer_selector.py:112`), so mixing the reduced importance
vectors is mathematically identical while never materializing the
(L, B, H, N+1, N+1) stack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basd_tpu.ops.activations import gelu as fast_gelu
from basd_tpu.ops.attention import (
    attention_impl,
    fused_attention_sharded,
    use_fused,
)


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    has_cls_token: bool = True
    # DINOv2-family ViTs scale each residual branch by a learned per-channel
    # gamma initialized tiny (`ls1.gamma`/`ls2.gamma`, init 1e-5 — the
    # reference's flagship torch.hub teachers carry these,
    # `/root/reference/src/models/teacher.py:114-116`). None = plain ViT.
    layer_scale_init: float | None = None
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


class ViTOutput(NamedTuple):
    logits: jax.Array  # (B, num_classes)
    tokens: jax.Array  # (P, B, N, D) post-block tokens, CLS stripped
    importance: jax.Array  # (P, B, N) attention importance per captured layer


def fan_in_linear_init(key, shape, dtype=jnp.float32):
    """trunc_normal(std=sqrt(2/fan_in)) — reference `_apply_fan_in_init`
    (`src/train.py:19-24`). Flax Dense kernels are (fan_in, fan_out)."""
    fan_in = shape[0]
    std = (2.0 / fan_in) ** 0.5
    return jax.nn.initializers.truncated_normal(stddev=std)(key, shape, dtype)


def he_conv_init(key, shape, dtype=jnp.float32):
    """normal(std=sqrt(2/fan_out)) for convs — reference `train.py:28-30`.
    Flax conv kernels are (kh, kw, in, out)."""
    fan_out = shape[0] * shape[1] * shape[-1]
    std = (2.0 / fan_out) ** 0.5
    return jax.nn.initializers.normal(stddev=std)(key, shape, dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth on the residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Attention(nn.Module):
    """Multi-head self-attention returning (tokens, importance)."""

    dim: int
    num_heads: int
    has_cls_token: bool
    dtype: Any

    @staticmethod
    def _cls_importance(q, k, scale):
        """CLS-row attention over patch keys, mean over heads (reference
        relational.py:24), recomputed standalone in fp32 — one (B, H, N)
        slice instead of keeping the full attention tensor alive.

        Lowering note: q/k arrive as (B, N, H, hd) or flat (B, N, D) with
        D = H*hd contiguous; the per-(batch, head) matvec einsum form
        lowered to thousands of (1 x hd x N) MXU calls (measured 1.86 ms
        at the teacher shape for ~100 MFLOP). The broadcast-multiply +
        head-group reduction below is one VPU pass over k (~0.4 ms),
        numerically the same bf16-inputs/fp32-accumulate contract."""
        b, _, h, _ = q.shape  # (B, N, H, hd)
        q0 = q[:, 0].reshape(b, 1, -1)  # (B, 1, D)
        kf = k.reshape(b, k.shape[1], -1)  # (B, N, D)
        prod = (kf.astype(jnp.float32) * q0.astype(jnp.float32))
        cls_logits = jnp.swapaxes(
            prod.reshape(b, kf.shape[1], h, -1).sum(axis=-1), 1, 2
        ) * scale  # (B, H, N)
        return jax.nn.softmax(cls_logits, axis=-1)[:, :, 1:].mean(axis=1)

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> tuple[jax.Array, jax.Array]:
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads

        qkv_flat = nn.Dense(
            3 * self.dim, dtype=self.dtype, kernel_init=fan_in_linear_init,
            name="qkv",
        )(x)  # (B, N, 3D)
        qkv = qkv_flat.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)

        scale = head_dim**-0.5

        impl = attention_impl()
        if use_fused(n, self.dim, head_dim, self.has_cls_token,
                     train=not deterministic):
            # fused whole-sequence Pallas kernel (ops/attention.py) in the
            # NATIVE (B, N, D) layout — QK^T, fp32 softmax and AV in one
            # VMEM-resident pass per head; the (B, H, N, N) tensor never
            # exists in HBM and no layout transposes exist anywhere
            # (measured 1.81x over the einsum chain at the teacher shape).
            q_flat = qkv_flat[:, :, : self.dim]
            k_flat = qkv_flat[:, :, self.dim : 2 * self.dim]
            v_flat = qkv_flat[:, :, 2 * self.dim :]
            q_flat = (q_flat.astype(jnp.float32) * scale).astype(self.dtype)
            out = fused_attention_sharded(
                q_flat, k_flat, v_flat, head_dim,
                interpret=(impl == "fused_interpret"),
            )
            out = nn.Dense(
                self.dim, dtype=self.dtype, kernel_init=fan_in_linear_init,
                name="proj",
            )(out)
            importance = self._cls_importance(q, k, scale)
            return out, importance

        q_scaled = (q.astype(jnp.float32) * scale).astype(self.dtype)

        # store logits in the compute dtype and upcast for the softmax
        # arithmetic: the fp32 (B, H, N, N) buffer dominated attention time
        # (measured 15 -> 5 ms/layer at N=257); identical numerics contract
        # to torch bf16 autocast (bf16 matmul output, fp32 softmax math).
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q_scaled, k, preferred_element_type=self.dtype
        )
        # deferred normalization: exp(x - max) runs in fp32 but the 1/sum
        # divide moves from the (B, H, N, N) tensor to the (B, N, H, hd)
        # output of the AV matmul. Isolated A/B (12x a single layer, N=257,
        # b256) measured 98 -> 64 ms, but the IN-CONTEXT teacher forward was
        # unchanged (170 vs 176 ms — XLA's fusion already avoided the pass
        # the isolated benchmark pays; docs/DESIGN.md section 6). Kept
        # because it is numerics-equivalent with no regression: the bf16
        # rounding point just shifts from normalized to unnormalized
        # probabilities, both in [0, 1].
        lf = logits.astype(jnp.float32)
        m = jnp.max(lf, axis=-1, keepdims=True)
        e = jnp.exp(lf - m)
        denom = jnp.sum(e, axis=-1)  # (B, H, N) fp32
        attn_unnorm = e.astype(self.dtype)

        if self.has_cls_token:
            importance = self._cls_importance(q, k, scale)  # (B, N-1)
        else:
            # mean over heads and queries (reference relational.py:27) —
            # needs the normalized attention; materialize it on this rare
            # path only (no-CLS ViTs)
            attn = e / denom[..., None]
            importance = attn.mean(axis=(1, 2))  # (B, N)

        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn_unnorm, v,
            preferred_element_type=jnp.float32,
        ) / jnp.swapaxes(denom, 1, 2)[..., None]
        out = out.astype(self.dtype).reshape(b, n, self.dim)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=fan_in_linear_init,
            name="proj",
        )(out)
        return out, importance


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.hidden, dtype=self.dtype, kernel_init=fan_in_linear_init,
            name="fc1",
        )(x)
        # exact GELU in tanh form: XLA:TPU's erf costs ~2 ms per teacher
        # MLP while tanh hides under the matmuls (ops/activations.py;
        # reproduces erf-GELU to fp32 ulp, NOT the 'tanh approximation')
        x = fast_gelu(x)
        return nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=fan_in_linear_init,
            name="fc2",
        )(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    drop_path: float
    has_cls_token: bool
    dtype: Any
    layer_scale_init: float | None = None

    def _layer_scale(self, name: str, y: jax.Array) -> jax.Array:
        if self.layer_scale_init is None:
            return y
        gamma = self.param(
            name,
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        return y * gamma.astype(self.dtype)

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool
    ) -> tuple[jax.Array, jax.Array]:
        # Round-5 hardware adjudication (docs/DESIGN.md section 9): the
        # whole-block fused kernels (fwd-only, train fwd+bwd) and the
        # norm2->mlp tail kernel all LOST to this XLA chain + the fused
        # attention kernel in-context (teacher fwd 126.1 vs 121.9 ms,
        # student f+b 156.2 vs 113.5 ms, mlp-forced 137.0 vs 121.9 ms on
        # the Table-1 workload) and were deleted per the pre-committed
        # flip-or-delete rule. XLA's own elementwise fusion around the
        # MXU matmuls beats hand-slabbed VMEM residency at these shapes.
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y, importance = Attention(
            self.dim, self.num_heads, self.has_cls_token, self.dtype,
            name="attn",
        )(y, deterministic)
        y = self._layer_scale("ls1", y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp"
        )(y)
        y = self._layer_scale("ls2", y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x, importance


class VisionTransformer(nn.Module):
    """DeiT-style ViT. `capture_layers` selects which post-block token sets
    (CLS-stripped) and attention-importance vectors to return; `()` returns
    empty stacks (classification only)."""

    config: ViTConfig
    capture_layers: tuple[int, ...] = field(default=())

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> ViTOutput:
        cfg = self.config
        b = x.shape[0]

        x = x.astype(cfg.dtype)
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            kernel_init=he_conv_init,
            name="patch_embed",
        )(x)  # (B, H/ps, W/ps, D)
        x = x.reshape(b, -1, cfg.embed_dim)
        n = x.shape[1]

        if cfg.has_cls_token:
            cls = self.param(
                "cls_token",
                jax.nn.initializers.truncated_normal(stddev=0.02),
                (1, 1, cfg.embed_dim),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(cfg.dtype), x],
                axis=1,
            )

        pos = self.param(
            "pos_embed",
            jax.nn.initializers.truncated_normal(stddev=0.02),
            (1, x.shape[1], cfg.embed_dim),
        )
        x = x + pos.astype(cfg.dtype)

        block_cls = Block
        if cfg.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))

        captured_tokens = []
        captured_importance = []
        for i in range(cfg.depth):
            rate = (
                cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                if cfg.drop_path_rate > 0
                else 0.0
            )
            x, importance = block_cls(
                cfg.embed_dim,
                cfg.num_heads,
                cfg.mlp_ratio,
                rate,
                cfg.has_cls_token,
                cfg.dtype,
                cfg.layer_scale_init,
                name=f"block{i}",
            )(x, not train)
            if i in self.capture_layers:
                toks = x[:, 1:, :] if cfg.has_cls_token else x
                captured_tokens.append(toks)
                captured_importance.append(importance)

        x = nn.LayerNorm(dtype=cfg.dtype, name="norm")(x)
        pooled = x[:, 0] if cfg.has_cls_token else x.mean(axis=1)
        if cfg.num_classes > 0:
            logits = nn.Dense(
                cfg.num_classes,
                dtype=jnp.float32,
                kernel_init=fan_in_linear_init,
                name="head",
            )(pooled.astype(jnp.float32))
        else:  # headless feature model (reference timm num_classes=0 teachers)
            logits = pooled.astype(jnp.float32)

        if captured_tokens:
            tokens = jnp.stack(captured_tokens)
            imps = jnp.stack(captured_importance)
        else:
            tokens = jnp.zeros((0, b, n, cfg.embed_dim), cfg.dtype)
            imps = jnp.zeros((0, b, n), jnp.float32)
        return ViTOutput(logits=logits, tokens=tokens, importance=imps)
