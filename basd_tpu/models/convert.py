"""Pretrained-weight import: PyTorch state dicts -> our Flax param trees.

SURVEY.md hard part 3: there is no timm/torch.hub on TPU, so teacher
checkpoints (DINOv2 / DeiT / ConvNeXt) must be converted from locally
available PyTorch state dicts. The mapping below covers timm/DINOv2-style
ViT naming; torch (CPU) is only imported when a `.pth` file is actually
loaded. This environment has no network egress, so conversion is exercised
in tests with synthetic state dicts.

Key layout transforms:
  * torch Linear weight (out, in)      -> flax Dense kernel (in, out): transpose
  * torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)
  * fused qkv stays fused (our Attention uses a fused qkv Dense too)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def torch_vit_to_flax(
    state: Mapping[str, np.ndarray], depth: int
) -> dict[str, Any]:
    """Map a timm/DINOv2-style ViT state dict onto our param tree."""
    p: dict[str, Any] = {}

    p["patch_embed"] = {
        "kernel": _t_conv(state["patch_embed.proj.weight"]),
        "bias": state["patch_embed.proj.bias"],
    }
    p["cls_token"] = state["cls_token"].reshape(1, 1, -1)
    p["pos_embed"] = state["pos_embed"]
    p["norm"] = {"scale": state["norm.weight"], "bias": state["norm.bias"]}

    for i in range(depth):
        b = f"blocks.{i}."
        p[f"block{i}"] = {
            "norm1": {
                "scale": state[b + "norm1.weight"],
                "bias": state[b + "norm1.bias"],
            },
            "attn": {
                "qkv": {
                    "kernel": _t_linear(state[b + "attn.qkv.weight"]),
                    "bias": state[b + "attn.qkv.bias"],
                },
                "proj": {
                    "kernel": _t_linear(state[b + "attn.proj.weight"]),
                    "bias": state[b + "attn.proj.bias"],
                },
            },
            "norm2": {
                "scale": state[b + "norm2.weight"],
                "bias": state[b + "norm2.bias"],
            },
            "mlp": {
                "fc1": {
                    "kernel": _t_linear(state[b + "mlp.fc1.weight"]),
                    "bias": state[b + "mlp.fc1.bias"],
                },
                "fc2": {
                    "kernel": _t_linear(state[b + "mlp.fc2.weight"]),
                    "bias": state[b + "mlp.fc2.bias"],
                },
            },
        }

    if "head.weight" in state:
        p["head"] = {
            "kernel": _t_linear(state["head.weight"]),
            "bias": state["head.bias"],
        }
    return p


def _load_state_file(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    # .pth / .pt: torch CPU load (weights only)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def load_converted_weights(path: str | Path, template_variables: Any) -> Any:
    """Load a state-dict file and graft it onto `template_variables`
    (shape-checked leaf by leaf)."""
    import jax

    state = _load_state_file(path)
    depth = (
        max(
            int(k.split(".")[1])
            for k in state
            if k.startswith("blocks.") and k.split(".")[1].isdigit()
        )
        + 1
    )
    converted = {"params": torch_vit_to_flax(state, depth)}

    def graft(template, new):
        if new is None:
            return template
        t, n = np.asarray(template), np.asarray(new)
        if t.shape != n.shape:
            raise ValueError(f"shape mismatch: template {t.shape} vs import {n.shape}")
        return np.asarray(new, dtype=t.dtype)

    flat_t = jax.tree_util.tree_flatten_with_path(template_variables)[0]
    flat_n = dict(
        jax.tree_util.tree_flatten_with_path(converted)[0]
    )
    out = {}
    for kp, leaf in flat_t:
        out[kp] = graft(leaf, flat_n.get(kp))
    treedef = jax.tree_util.tree_structure(template_variables)
    return jax.tree_util.tree_unflatten(treedef, [out[kp] for kp, _ in flat_t])
