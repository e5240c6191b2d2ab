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


def _bn(state: Mapping[str, np.ndarray], prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": state[prefix + ".weight"],
        "bias": state[prefix + ".bias"],
    }
    stats = {
        "mean": state[prefix + ".running_mean"],
        "var": state[prefix + ".running_var"],
    }
    return params, stats


def torch_resnet_to_flax(
    state: Mapping[str, np.ndarray], stage_sizes: tuple[int, ...]
) -> dict[str, Any]:
    """Map a torchvision/timm BasicBlock ResNet state dict onto our tree.

    Returns {"params": ..., "batch_stats": ...} matching
    `basd_tpu.models.cnn.ResNet` naming (stem_conv/stem_bn,
    stage{s}_block{b}.{conv1,bn1,conv2,bn2,downsample_conv,downsample_bn}).
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["stem_conv"] = {"kernel": _t_conv(state["conv1.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn(state, "bn1")

    for s, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            t = f"layer{s + 1}.{b}."
            name = f"stage{s}_block{b}"
            p: dict[str, Any] = {
                "conv1": {"kernel": _t_conv(state[t + "conv1.weight"])},
                "conv2": {"kernel": _t_conv(state[t + "conv2.weight"])},
            }
            st: dict[str, Any] = {}
            p["bn1"], st["bn1"] = _bn(state, t + "bn1")
            p["bn2"], st["bn2"] = _bn(state, t + "bn2")
            if t + "downsample.0.weight" in state:
                p["downsample_conv"] = {
                    "kernel": _t_conv(state[t + "downsample.0.weight"])
                }
                p["downsample_bn"], st["downsample_bn"] = _bn(
                    state, t + "downsample.1"
                )
            params[name] = p
            stats[name] = st

    if "fc.weight" in state:
        params["head"] = {
            "kernel": _t_linear(state["fc.weight"]),
            "bias": state["fc.bias"],
        }
    return {"params": params, "batch_stats": stats}


def torch_convnext_to_flax(
    state: Mapping[str, np.ndarray], depths: tuple[int, ...]
) -> dict[str, Any]:
    """Map a timm ConvNeXt state dict (stem.0/1,
    stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma},
    stages.{s}.downsample.0/1) onto `basd_tpu.models.cnn.ConvNeXt`.

    ConvNeXt-V2 blocks (timm `convnextv2_*`) carry `mlp.grn.{weight,bias}`
    instead of the `gamma` layer scale; both layouts are handled (V2 GRN
    params land on the block's `grn` submodule)."""
    p: dict[str, Any] = {
        "stem_conv": {
            "kernel": _t_conv(state["stem.0.weight"]),
            "bias": state["stem.0.bias"],
        },
        "stem_norm": {
            "scale": state["stem.1.weight"],
            "bias": state["stem.1.bias"],
        },
    }
    for s, depth in enumerate(depths):
        if s > 0:
            d = f"stages.{s}.downsample."
            p[f"down{s}_norm"] = {
                "scale": state[d + "0.weight"],
                "bias": state[d + "0.bias"],
            }
            p[f"down{s}_conv"] = {
                "kernel": _t_conv(state[d + "1.weight"]),
                "bias": state[d + "1.bias"],
            }
        for b in range(depth):
            t = f"stages.{s}.blocks.{b}."
            block = {
                "dwconv": {
                    "kernel": _t_conv(state[t + "conv_dw.weight"]),
                    "bias": state[t + "conv_dw.bias"],
                },
                "norm": {
                    "scale": state[t + "norm.weight"],
                    "bias": state[t + "norm.bias"],
                },
                "pwconv1": {
                    "kernel": _t_linear(state[t + "mlp.fc1.weight"]),
                    "bias": state[t + "mlp.fc1.bias"],
                },
                "pwconv2": {
                    "kernel": _t_linear(state[t + "mlp.fc2.weight"]),
                    "bias": state[t + "mlp.fc2.bias"],
                },
            }
            if t + "mlp.grn.weight" in state:  # ConvNeXt-V2
                block["grn"] = {
                    "gamma": state[t + "mlp.grn.weight"].reshape(-1),
                    "beta": state[t + "mlp.grn.bias"].reshape(-1),
                }
            else:
                block["gamma"] = state[t + "gamma"].reshape(-1)
            p[f"stage{s}_block{b}"] = block
    return {"params": p}


def _detect_and_convert(state: dict[str, np.ndarray]) -> dict[str, Any]:
    """Route a state dict to the right converter by its key signature."""
    if any(k.startswith("blocks.") for k in state):
        depth = 1 + max(
            int(k.split(".")[1])
            for k in state
            if k.startswith("blocks.") and k.split(".")[1].isdigit()
        )
        return {"params": torch_vit_to_flax(state, depth)}
    if any(k.startswith("layer1.") for k in state):
        sizes = []
        for s in range(1, 5):
            blocks = {
                int(k.split(".")[1])
                for k in state
                if k.startswith(f"layer{s}.")
            }
            if blocks:
                sizes.append(max(blocks) + 1)
        return torch_resnet_to_flax(state, tuple(sizes))
    if any(k.startswith("stages.") for k in state):
        depths = []
        for s in range(8):
            blocks = {
                int(k.split(".")[3])
                for k in state
                if k.startswith(f"stages.{s}.blocks.")
            }
            if blocks:
                depths.append(max(blocks) + 1)
        return torch_convnext_to_flax(state, tuple(depths))
    raise ValueError(
        "unrecognized checkpoint layout (expected timm/DINOv2 ViT, "
        "torchvision/timm ResNet, or timm ConvNeXt keys)"
    )


def _load_state_file(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            # "__*__" keys carry normalization metadata, not weights
            return {k: z[k] for k in z.files if not k.startswith("__")}
    # .pth / .pt: torch CPU load (weights only)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {
        k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")
    }


def load_checkpoint_stats(
    path: str | Path,
) -> tuple[tuple[float, ...], tuple[float, ...]] | None:
    """Normalization (mean, std) recorded with a converted checkpoint.

    The reference reads these from the timm `pretrained_cfg`
    (`/root/reference/src/models/teacher.py:128-134`); our checkpoint files
    carry the same metadata so teachers are normalized with THEIR stats, not
    a hardcoded ImageNet default. Sources, in order:

      * `.npz` exports: `__norm_mean__` / `__norm_std__` arrays
        (written by `export_teacher_npz`),
      * `.pth` bundles: a `pretrained_cfg` dict entry (timm full saves),
      * a `<file>.stats.json` sidecar: {"mean": [...], "std": [...]}.

    Returns None when no metadata exists (caller falls back to the model
    spec's defaults).
    """
    path = Path(path)
    sidecar = path.with_name(path.name + ".stats.json")
    if sidecar.exists():
        import json

        meta = json.loads(sidecar.read_text())
        return tuple(meta["mean"]), tuple(meta["std"])
    if path.suffix == ".npz":
        with np.load(path) as z:
            if "__norm_mean__" in z.files and "__norm_std__" in z.files:
                return (
                    tuple(float(v) for v in z["__norm_mean__"]),
                    tuple(float(v) for v in z["__norm_std__"]),
                )
        return None
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        cfg = obj.get("pretrained_cfg")
        if isinstance(cfg, dict) and "mean" in cfg and "std" in cfg:
            return tuple(cfg["mean"]), tuple(cfg["std"])
    return None


def export_teacher_npz(
    path: str | Path,
    state: Mapping[str, np.ndarray],
    *,
    mean: tuple[float, ...] | None = None,
    std: tuple[float, ...] | None = None,
) -> None:
    """Write a torch-layout state dict to `.npz`, embedding normalization
    stats as `__norm_mean__`/`__norm_std__` metadata arrays."""
    arrays = {k: np.asarray(v) for k, v in state.items()}
    if mean is not None and std is not None:
        arrays["__norm_mean__"] = np.asarray(mean, np.float64)
        arrays["__norm_std__"] = np.asarray(std, np.float64)
    np.savez(path, **arrays)


def load_converted_weights(path: str | Path, template_variables: Any) -> Any:
    """Load a state-dict file and graft it onto `template_variables`
    (shape-checked leaf by leaf)."""
    import jax

    state = _load_state_file(path)
    converted = _detect_and_convert(state)

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
