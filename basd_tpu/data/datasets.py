"""Data layer: dataset metadata, channel statistics, and host-side arrays.

TPU-first re-design of the reference data layer (reference
`src/data/datasets.py`). The reference keeps decode + geometric transforms +
augmentation on 8 host worker processes and ships two fully-normalized fp32
views of every image to the device (`datasets.py:137-166`). Here the host
only produces **one uint8 array per image** (resized to the raw loader size);
everything else — dual-view normalization, random-resized-crop, flips,
TrivialAugment, mixup/cutmix — runs as jitted device ops
(`basd_tpu.ops.augment` / `basd_tpu.ops.preprocess`), halving host->HBM
bandwidth and removing the host worker pool from the hot path.

Components mirrored from the reference:
  * ``dataset_info``        — metadata introspection (`datasets.py:24-43`)
  * ``get_channel_stats``   — streaming Welford mean/std over the first 5000
                              train images (`datasets.py:46-68`)
  * ``get_subset_indices``  — OOD class-subset -> parent logit mapping
                              (`datasets.py:71-77`)

Network-free operation: a builtin registry serves metadata for the datasets
named by the reference configs, and a ``synthetic/*`` family provides
procedurally-generated, learnable datasets for tests and benchmarks. When
HuggingFace `datasets` has a local cache for a real dataset, it is used;
otherwise loading raises with a clear message (this environment has no
network egress).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_CHANNEL_STATS_SAMPLES = 5000

# ---------------------------------------------------------------------------
# Builtin metadata registry (replaces HF builder introspection when offline).
# ---------------------------------------------------------------------------

_BUILTIN_INFO: dict[str, dict] = {
    "uoft-cs/cifar100": {
        "image_key": "img",
        "label_key": "fine_label",
        "num_classes": 100,
        "train_split": "train",
        "eval_split": "test",
        "img_size": 32,
    },
    "uoft-cs/cifar10": {
        "image_key": "img",
        "label_key": "label",
        "num_classes": 10,
        "train_split": "train",
        "eval_split": "test",
        "img_size": 32,
    },
    "ILSVRC/imagenet-1k": {
        "image_key": "image",
        "label_key": "label",
        "num_classes": 1000,
        "train_split": "train",
        "eval_split": "validation",
        "img_size": 224,
    },
    "barkermrl/imagenet-a": {
        "image_key": "image",
        "label_key": "label",
        "num_classes": 200,
        "train_split": "train",
        "eval_split": "test",
        "img_size": 224,
        "subset_of": "ILSVRC/imagenet-1k",
    },
    "songweig/imagenet_sketch": {
        "image_key": "image",
        "label_key": "label",
        "num_classes": 1000,
        "train_split": "train",
        "eval_split": "train",
        "img_size": 224,
    },
}


def _is_synthetic(name: str) -> bool:
    return name.startswith("synthetic/")


def _parse_synthetic(name: str) -> dict:
    """synthetic/<tag>[-<C>c][-<S>px] e.g. synthetic/cifar10-like."""
    spec = {
        "num_classes": 10,
        "img_size": 16,
        "train_size": 512,
        "eval_size": 128,
    }
    tag = name.split("/", 1)[1]
    if "cifar100" in tag:
        spec.update(num_classes=100, img_size=32)
    elif "cifar10" in tag:
        spec.update(num_classes=10, img_size=32 if "32" in tag else 16)
    for part in tag.split("-"):
        if part.endswith("c") and part[:-1].isdigit():
            spec["num_classes"] = int(part[:-1])
        if part.endswith("px") and part[:-2].isdigit():
            spec["img_size"] = int(part[:-2])
    return spec


@lru_cache(maxsize=None)
def dataset_info(dataset_name: str) -> dict:
    """Metadata: image/label keys, class count+names, splits.

    Mirrors reference `dataset_info` (`src/data/datasets.py:24-43`): eval
    split preference validation -> test -> train.
    """
    if _is_synthetic(dataset_name):
        spec = _parse_synthetic(dataset_name)
        return {
            "image_key": "image",
            "label_key": "label",
            "num_classes": spec["num_classes"],
            "class_names": tuple(f"class_{i}" for i in range(spec["num_classes"])),
            "train_split": "train",
            "eval_split": "test",
            "img_size": spec["img_size"],
            "synthetic": spec,
        }

    if dataset_name in _BUILTIN_INFO:
        base = dict(_BUILTIN_INFO[dataset_name])
        n = base["num_classes"]
        if "class_names" not in base:
            # Real class names come from HF metadata when cached; the
            # builtin fallback uses the subset_of convention for OOD sets.
            if "subset_of" in base:
                parent = base["subset_of"]
                parent_n = _BUILTIN_INFO[parent]["num_classes"]
                # deterministic subset: first n parent classes
                base["class_names"] = tuple(
                    f"{parent}:class_{i}" for i in range(n)
                )
            else:
                base["class_names"] = tuple(f"{dataset_name}:class_{i}" for i in range(n))
        base.setdefault("synthetic", None)
        return base

    # Last resort: HF builder introspection (works only with a local cache).
    try:
        from datasets import ClassLabel, Image, load_dataset_builder

        builder = load_dataset_builder(dataset_name, trust_remote_code=True)
        features = builder.info.features
        splits = set(builder.info.splits.keys())
        image_key = next(n for n, f in features.items() if isinstance(f, Image))
        label_key = next(n for n, f in features.items() if isinstance(f, ClassLabel))
        feat = features[label_key]
        eval_split = (
            "validation" if "validation" in splits
            else "test" if "test" in splits
            else "train"
        )
        return {
            "image_key": image_key,
            "label_key": label_key,
            "num_classes": feat.num_classes,
            "class_names": tuple(feat.names),
            "train_split": "train",
            "eval_split": eval_split,
            "img_size": None,
            "synthetic": None,
        }
    except Exception as e:  # pragma: no cover - network-free env
        raise RuntimeError(
            f"dataset '{dataset_name}' is not in the builtin registry and "
            f"could not be introspected via a local HuggingFace cache: {e}"
        ) from e


def get_subset_indices(dataset_name: str, parent_name: str) -> tuple[int, ...] | None:
    """Map OOD-subset class names to parent logit indices (logit masking).

    Mirrors reference `get_subset_indices` (`src/data/datasets.py:71-77`).
    Returns None when the class sets are identical.
    """
    child_names = dataset_info(dataset_name)["class_names"]
    parent_names = dataset_info(parent_name)["class_names"]
    if set(child_names) == set(parent_names):
        return None
    parent_map = {name: idx for idx, name in enumerate(parent_names)}
    try:
        return tuple(parent_map[name] for name in child_names)
    except KeyError:
        # Builtin fallback naming: "<parent>:class_i" -> index i.
        idxs = []
        for name in child_names:
            if ":" in name and name.split(":", 1)[0] == parent_name:
                idxs.append(int(name.rsplit("_", 1)[1]))
            else:
                raise
        return tuple(idxs)


# ---------------------------------------------------------------------------
# Synthetic data generation (learnable, deterministic)
# ---------------------------------------------------------------------------


def _synthetic_arrays(
    dataset_name: str, split: str
) -> tuple[np.ndarray, np.ndarray]:
    """Class-conditional structured uint8 images: each class has a distinct
    spatial frequency/phase pattern plus noise, so a small model can learn it
    and smoke tests can observe a decreasing loss."""
    spec = dataset_info(dataset_name)["synthetic"]
    n = spec["train_size"] if split == "train" else spec["eval_size"]
    c, s = spec["num_classes"], spec["img_size"]
    seed = 0 if split == "train" else 1
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, size=(n,))
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    images = np.empty((n, s, s, 3), dtype=np.uint8)
    for i in range(n):
        k = int(labels[i])
        fx, fy = 1 + (k % 5), 1 + (k // 5) % 5
        phase = 2 * np.pi * (k / max(c, 1))
        base = 0.5 + 0.5 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
        img = np.stack(
            [base, np.roll(base, k % s, axis=0), np.roll(base, (2 * k) % s, axis=1)],
            axis=-1,
        )
        img = img + rng.normal(0, 0.08, size=img.shape)
        images[i] = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return images, labels.astype(np.int32)


# ---------------------------------------------------------------------------
# Array loading (host side). Returns HWC uint8 numpy arrays.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def load_split_arrays(
    dataset_name: str, split: str, img_size: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Load a full split as (images_u8 (N,H,W,3), labels (N,)) host arrays.

    The device input path starts from uint8 (see module docstring); images
    are host-resized once to ``raw size = round(img_size / 0.875)`` rounded
    up to a multiple of 4 so the on-device crop ops have margin to work with.
    """
    if _is_synthetic(dataset_name):
        return _synthetic_arrays(dataset_name, split)

    info = dataset_info(dataset_name)
    from datasets import load_dataset  # local cache only in this env

    ds = load_dataset(dataset_name, split=split, trust_remote_code=True)
    image_key, label_key = info["image_key"], info["label_key"]

    target = img_size or info.get("img_size") or 224
    raw = int(round(target / 0.875 / 4.0) * 4)

    from PIL import Image as PILImage

    n = len(ds)
    images = np.empty((n, raw, raw, 3), dtype=np.uint8)
    labels = np.empty((n,), dtype=np.int32)
    for i, ex in enumerate(ds):
        img = ex[image_key]
        if not isinstance(img, PILImage.Image):
            img = PILImage.fromarray(np.asarray(img))
        img = img.convert("RGB").resize((raw, raw), PILImage.BILINEAR)
        images[i] = np.asarray(img, dtype=np.uint8)
        labels[i] = int(ex[label_key])
    return images, labels


@lru_cache(maxsize=None)
def get_channel_stats(
    dataset_name: str,
) -> tuple[tuple[float, ...], tuple[float, ...]]:
    """Per-channel mean/std over the first 5000 train images via Welford
    parallel merge (reference `src/data/datasets.py:46-68` semantics; the
    inner loop runs in the native C++ kernel when available)."""
    from basd_tpu.data.native import WelfordStats

    images, _ = load_split_arrays(dataset_name, "train")
    images = images[:_CHANNEL_STATS_SAMPLES]

    stats = WelfordStats(3)
    for img in images:
        stats.update(img)
    return stats.result()
