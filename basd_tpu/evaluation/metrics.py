"""Evaluation suite: in-distribution accuracy, OOD robustness transfer with
class-subset logit masking, and an efficiency micro-benchmark.

Mirrors reference `src/evaluation/metrics.py`:
  * `evaluate_model`     — top-1/top-5 (micro) + mean CE loss, optional
                           logit masking to a class subset (`:19-55`)
  * `measure_efficiency` — params / GFLOPs / throughput img/s (`:58-97`);
                           FLOPs come from XLA `cost_analysis()` instead of
                           torch FlopCounterMode, throughput from
                           `block_until_ready`-bracketed timing
  * `run_eval_suite`     — primary + eval_datasets, OOD sets normalized
                           with the PRIMARY dataset's stats (`:100-164`)
  * `save_metrics`       — metrics.json with the same schema (`:167-171`)
"""

from __future__ import annotations

import json
import time
import weakref
from collections import OrderedDict
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.data.datasets import (
    dataset_info,
    get_channel_stats,
    get_subset_indices,
    load_split_arrays,
)
from basd_tpu.ops.attention import attention_mesh
from basd_tpu.ops.preprocess import eval_view


def _batches(n: int, batch_size: int):
    for i in range(0, n, batch_size):
        yield i, min(i + batch_size, n)


# Jitted eval steps cached across calls (the trainer evaluates every epoch;
# a fresh closure per call would recompile every time). Keyed on
# weakref.ref(model) — NOT id(apply_fn), whose values can be reused after GC
# and cross-serve a stale jitted step for a different model: a dead ref
# never compares equal to a new one. LRU-bounded because the jitted closure
# itself keeps the model alive while the entry exists.
_EVAL_STEP_CACHE: OrderedDict = OrderedDict()
_EVAL_CACHE_MAX = 8


def _cache_owner(apply_fn, model):
    """The cache-key owner: the model when given, else the bound method's
    module, else the function object."""
    if model is not None:
        return model
    return getattr(apply_fn, "__self__", apply_fn)


def _cached_eval_step(owner, cache_key, build):
    key = (weakref.ref(owner), cache_key)
    step = _EVAL_STEP_CACHE.get(key)
    if step is None:
        step = build()
        _EVAL_STEP_CACHE[key] = step
        while len(_EVAL_STEP_CACHE) > _EVAL_CACHE_MAX:
            _EVAL_STEP_CACHE.popitem(last=False)
    else:
        _EVAL_STEP_CACHE.move_to_end(key)
    return step


def evaluate_model(
    apply_fn,
    params,
    images_u8: np.ndarray,
    labels: np.ndarray,
    *,
    img_size: int,
    crop_ratio: float,
    mean,
    std,
    batch_size: int,
    valid_indices: tuple[int, ...] | None = None,
    label_smoothing: float = 0.0,
    model=None,
    sharding=None,
) -> dict[str, Any]:
    """top-1/top-5 accuracy (micro) + mean CE loss over a split.

    With `sharding` (a batch NamedSharding along the 'data' mesh axis) the
    eval batches are placed sharded so the jitted step runs data-parallel
    across the mesh instead of bottlenecking one chip.
    """
    mean = tuple(float(m) for m in mean)
    std = tuple(float(s) for s in std)
    cache_key = (
        img_size, crop_ratio, mean, std, valid_indices, label_smoothing,
    )
    valid = (
        jnp.asarray(valid_indices, jnp.int32) if valid_indices is not None else None
    )

    def eval_step(carry, params, imgs_u8, labels, mask):
        x = eval_view(imgs_u8, img_size, crop_ratio, mean, std)
        logits = apply_fn({"params": params}, x, train=False).logits
        if valid is not None:
            logits = logits[:, valid]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        c = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, c)
        smoothed = (1.0 - label_smoothing) * onehot + label_smoothing / c
        loss_sum = -jnp.sum(mask * jnp.sum(smoothed * logp, axis=-1))
        top1 = jnp.sum(mask * (jnp.argmax(logits, -1) == labels))
        k = min(5, c)
        _, topk = jax.lax.top_k(logits, k)
        top5 = jnp.sum(mask * jnp.any(topk == labels[:, None], axis=-1))
        cl, c1, c5 = carry
        return cl + loss_sum, c1 + top1, c5 + top5

    owner = _cache_owner(apply_fn, model)
    step_fn = eval_step
    eval_step = _cached_eval_step(owner, cache_key, lambda: jax.jit(step_fn))

    def put(a):
        a = jnp.asarray(a)
        return jax.device_put(a, sharding) if sharding is not None else a

    # Sums accumulate in a carried DEVICE tuple across batches — one value
    # fetch per split instead of one ~33 ms transport round-trip per batch
    # (round-2 weak #3: per-epoch val on CIFAR-sized splits paid seconds of
    # pure RTT in `float(li)` syncs).
    carry = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    total = 0
    n = len(labels)
    # fused-attention island dispatch needs the ambient mesh at trace time
    # when the eval step runs data-parallel (ops/attention.py)
    mesh = getattr(sharding, "mesh", None)
    for lo, hi in _batches(n, batch_size):
        # pad the tail batch to the static batch size and mask the padding
        imgs = images_u8[lo:hi]
        labs = labels[lo:hi]
        pad = batch_size - (hi - lo)
        mask = np.ones(batch_size, np.float32)
        if pad:
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:pad])])
            labs = np.concatenate([labs, np.zeros_like(labs[:pad])])
            mask[hi - lo :] = 0.0
        with attention_mesh(mesh):
            carry = eval_step(carry, params, put(imgs), put(labs), put(mask))
        total += hi - lo

    loss_sum, top1, top5 = (float(v) for v in carry)
    return {
        "val_acc": 100.0 * top1 / total,
        "val_acc_top5": 100.0 * top5 / total,
        "loss": loss_sum / total,
    }


def measure_efficiency(
    apply_fn,
    params,
    *,
    image_size: int,
    in_channels: int = 3,
    batch_size: int = 64,
    num_warmup: int = 50,
    num_batches: int = 200,
) -> dict[str, float]:
    """Params (M), forward GFLOPs (XLA cost analysis on 1 image), and
    steady-state throughput img/s (reference `metrics.py:58-97`:
    50 warmup + 200 timed batches of 64)."""
    param_count = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )

    fwd = jax.jit(
        lambda p, x: apply_fn({"params": p}, x, train=False).logits
    )

    one = jnp.zeros((1, image_size, image_size, in_channels), jnp.float32)
    try:
        cost = fwd.lower(params, one).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        gflops = float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        gflops = float("nan")

    # Throughput via chained-steps slope timing: each forward depends on a
    # zero-valued scalar from the previous one, and the final scalar value
    # fetch is the only true synchronization point (block_until_ready
    # returns before remote execution completes on tunneled TPU transports;
    # methodology validated at 194/197 TFLOP/s on a bf16 matmul).
    batch = jnp.zeros((batch_size, image_size, image_size, in_channels), jnp.float32)

    chained = jax.jit(
        lambda p, x, c: apply_fn(
            {"params": p}, x + c, train=False
        ).logits.sum() * 0.0
    )

    def run(iters):
        carry = jnp.float32(0.0)
        start = time.perf_counter()
        for _ in range(iters):
            carry = chained(params, batch, carry)
        _ = float(carry)  # value fetch = real sync
        return time.perf_counter() - start

    run(max(num_warmup, 2))
    n1 = max(num_batches // 10, 1)

    # median of three slopes: on the tunneled transport a single slope can
    # go NEGATIVE when total device time for the timed span sits below the
    # sync RTT jitter (seen on a tiny model: -42k img/s). If even the
    # median is non-positive, fall back to the dispatch-inclusive mean —
    # an upper bound on step time, but a sane one.
    samples = []
    for _ in range(3):
        t1 = run(n1)
        t2 = run(num_batches + n1)
        samples.append(((t2 - t1) / num_batches, t2 / (num_batches + n1)))
    slopes = sorted(s for s, _ in samples)
    per_batch = slopes[len(slopes) // 2]
    if per_batch <= 0.0:
        per_batch = min(u for _, u in samples)

    return {
        "param_count": param_count,
        "param_count_m": param_count / 1e6,
        "gflops": gflops,
        "throughput_img_per_sec": batch_size / per_batch,
    }


def run_eval_suite(
    apply_fn,
    params,
    config,
    *,
    config_path: str,
    model=None,
    sharding=None,
) -> dict[str, Any]:
    """Primary + OOD robustness + efficiency (reference `run_eval_suite`,
    `metrics.py:100-164`). OOD loaders use the PRIMARY dataset's channel
    stats; subset datasets get logit masking. `sharding` runs the eval
    loops data-parallel over the mesh."""
    datasets_to_eval = [config.data.dataset] + list(config.data.eval_datasets)
    mean, std = get_channel_stats(config.data.dataset)
    crop_ratio = config.data.eval_crop_ratio
    img_size = config.model.vit.img_size

    primary_results: dict = {}
    robustness_results: dict = {}

    for ds_name in datasets_to_eval:
        info = dataset_info(ds_name)
        images, labels = load_split_arrays(
            ds_name, info["eval_split"], img_size
        )
        valid_indices = get_subset_indices(ds_name, config.data.dataset)
        metrics = evaluate_model(
            apply_fn,
            params,
            images,
            labels,
            img_size=img_size,
            crop_ratio=crop_ratio,
            mean=mean,
            std=std,
            batch_size=config.data.batch_size,
            valid_indices=valid_indices,
            model=model,
            sharding=sharding,
        )
        if ds_name == config.data.dataset:
            primary_results = metrics
        else:
            robustness_results[ds_name] = metrics
        print(
            f"eval {ds_name} "
            f"top1={metrics['val_acc']:.4f} top5={metrics['val_acc_top5']:.4f} "
            f"loss={metrics['loss']:.6f}"
        )

    eval_cfg = config.get("evaluation", {}) or {}
    efficiency = measure_efficiency(
        apply_fn,
        params,
        image_size=img_size,
        batch_size=eval_cfg.get("efficiency_batch_size", 64),
        num_warmup=eval_cfg.get("efficiency_warmup", 50),
        num_batches=eval_cfg.get("efficiency_batches", 200),
    )
    print(
        f"efficiency params_m={efficiency['param_count_m']:.4f} "
        f"gflops={efficiency['gflops']:.4f} "
        f"throughput={efficiency['throughput_img_per_sec']:.2f} img/s"
    )

    return {
        "run": {"name": config.run.name, "config": config_path},
        "primary": {"dataset": config.data.dataset, **primary_results},
        "robustness": robustness_results,
        "efficiency": efficiency,
    }


def save_metrics(results: dict[str, Any], output_dir: Path | str) -> Path:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    metrics_path = output_dir / "metrics.json"
    with open(metrics_path, "w") as f:
        json.dump(results, f, indent=2)
    return metrics_path
