"""Timm-faithful torch ViT twin of `basd_tpu.models.vit.VisionTransformer`.

Shared by tests/test_convert.py (golden activation parity) and
tests/test_full_step_parity.py (full-train-step trajectory parity): a
torch module whose state-dict keys follow the timm/DINOv2 layout our
converter consumes, and whose forward reproduces the flax model's math
(erf-exact GELU, pre-norm blocks, CLS pooling, optional LayerScale,
optional classification head).
"""

from __future__ import annotations


def make_torch_twin(cfg):
    """Build a torch twin for a `ViTConfig`. Returns an nn.Module whose
    forward(x_nchw) -> (logits_or_pooled, [per-layer patch tokens],
    [per-layer CLS importance]). With cfg.num_classes > 0 a `head`
    Linear is applied to the pooled post-norm CLS token (same contract
    as the flax model, models/vit.py)."""
    import torch
    import torch.nn as nn_t

    class Attn(nn_t.Module):
        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            self.num_heads = cfg.num_heads
            self.qkv = nn_t.Linear(d, 3 * d)
            self.proj = nn_t.Linear(d, d)

        def forward(self, x):
            b, n, d = x.shape
            h = self.num_heads
            hd = d // h
            qkv = (
                self.qkv(x)
                .reshape(b, n, 3, h, hd)
                .permute(2, 0, 3, 1, 4)
            )
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
            attn = (q @ k.transpose(-2, -1) * hd**-0.5).softmax(-1)
            imp = attn[:, :, 0, 1:].mean(1)  # CLS row, mean over heads
            out = (attn @ v).transpose(1, 2).reshape(b, n, d)
            return self.proj(out), imp

    class LayerScale(nn_t.Module):
        # DINOv2 naming: module `ls1`/`ls2`, parameter `gamma`
        def __init__(self, d, init):
            super().__init__()
            self.gamma = nn_t.Parameter(init * torch.ones(d))

        def forward(self, x):
            return x * self.gamma

    class Block(nn_t.Module):
        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            hidden = int(d * cfg.mlp_ratio)
            self.norm1 = nn_t.LayerNorm(d, eps=1e-6)
            self.attn = Attn()
            if cfg.layer_scale_init is not None:
                self.ls1 = LayerScale(d, cfg.layer_scale_init)
                self.ls2 = LayerScale(d, cfg.layer_scale_init)
            else:
                self.ls1 = self.ls2 = nn_t.Identity()
            self.norm2 = nn_t.LayerNorm(d, eps=1e-6)
            self.mlp = nn_t.Sequential()
            self.mlp.fc1 = nn_t.Linear(d, hidden)
            self.mlp.act = nn_t.GELU()
            self.mlp.fc2 = nn_t.Linear(hidden, d)

        def forward(self, x):
            y, imp = self.attn(self.norm1(x))
            x = x + self.ls1(y)
            x = x + self.ls2(
                self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
            )
            return x, imp

    class ViT(nn_t.Module):
        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            self.patch_embed = nn_t.Sequential()
            self.patch_embed.proj = nn_t.Conv2d(
                3, d, cfg.patch_size, stride=cfg.patch_size
            )
            self.cls_token = nn_t.Parameter(torch.randn(1, 1, d))
            self.pos_embed = nn_t.Parameter(
                torch.randn(1, cfg.num_patches + 1, d) * 0.02
            )
            self.blocks = nn_t.ModuleList(
                Block() for _ in range(cfg.depth)
            )
            self.norm = nn_t.LayerNorm(d, eps=1e-6)
            if cfg.num_classes > 0:
                self.head = nn_t.Linear(d, cfg.num_classes)

        def forward(self, x):
            b = x.shape[0]
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat(
                [self.cls_token.expand(b, -1, -1), x], dim=1
            )
            x = x + self.pos_embed
            tokens, imps = [], []
            for blk in self.blocks:
                x, imp = blk(x)
                tokens.append(x[:, 1:])
                imps.append(imp)
            x = self.norm(x)
            pooled = x[:, 0]
            if cfg.num_classes > 0:
                return self.head(pooled), tokens, imps
            return pooled, tokens, imps

    return ViT()


class TorchScheduleFreeAdamW:
    """Line-for-line torch transcription of
    `basd_tpu.training.schedule_free.schedule_free_adamw` (params = y).

    Shared by tests/test_full_step_parity.py (trajectory parity) and
    tests/test_converged_accuracy.py (endpoint accuracy parity) — the
    exact update rule from Defazio et al. 2024 that the reference runs
    via the `schedulefree` pip package (not in this image, reference
    `src/training/trainer.py:54-58`)."""

    def __init__(self, params, *, lr, weight_decay, warmup_steps,
                 beta1=0.9, beta2=0.999, eps=1e-8):
        import torch

        self.lr, self.wd, self.warmup = lr, weight_decay, warmup_steps
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.params = list(params)
        self.z = [p.detach().clone() for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]
        self.t = 0
        self.weight_sum = 0.0

    def step(self):
        import torch

        self.t += 1
        sched = (min(1.0, self.t / max(self.warmup, 1))
                 if self.warmup else 1.0)
        gamma = self.lr * sched * (1.0 - self.beta2**self.t) ** 0.5
        weight = gamma**2.0  # weight_lr_power = 2
        self.weight_sum += weight
        ckp1 = weight / self.weight_sum if self.weight_sum > 0 else 0.0
        with torch.no_grad():
            for p, z, v in zip(self.params, self.z, self.v):
                g = p.grad
                v.mul_(self.beta2).add_((1.0 - self.beta2) * g * g)
                u = g / (v.sqrt() + self.eps) + self.wd * p
                # y update reads the OLD z; z updates after
                p.add_(ckp1 * (z - p)
                       + gamma * (self.beta1 * (1.0 - ckp1) - 1.0) * u)
                z.sub_(gamma * u)

    def zero_grad(self):
        for p in self.params:
            p.grad = None

    def eval_params(self):
        return [
            ((p.detach() - (1.0 - self.beta1) * z) / self.beta1)
            for p, z in zip(self.params, self.z)
        ]
