"""dual_view internals budget at the Table-1 workload (B=256, raw 256px,
out 224px): which augment stage dominates the 55 ms? Slope-timed.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from basd_tpu.ops.augment import _equalize
from basd_tpu.ops import (
    hflip,
    normalize,
    random_resized_crop,
    trivial_augment_wide,
)
from basd_tpu.ops.augment import _geometric_warp
from basd_tpu.ops.preprocess import center_crop_resize, dual_view, to_float


def slope(fn, args, n1=6, n2=18):
    fn = jax.jit(fn)
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    def run(iters):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(3)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    # BASD_PROBE_SMOKE=1: tiny shapes, production dispatch ('auto' falls
    # back to XLA off-TPU) — full offline execution of the code path.
    smoke = os.environ.get("BASD_PROBE_SMOKE") == "1"
    b, raw, img = (4, 40, 32) if smoke else (256, 256, 224)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray((rng.random((b, raw, raw, 3)) * 255).astype(np.uint8))
    x = jnp.asarray(rng.random((b, img, img, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    kwargs = dict(
        img_size=img, crop_ratio=img / raw,
        teacher_stats=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        dataset_stats=((0.5,) * 3, (0.25,) * 3),
    )
    print(f"dual_view (all): "
          f"{slope(lambda u, k: dual_view(u, k, **kwargs)[1], (u8, key)):7.2f} ms",
          flush=True)
    print(f"clean view only: "
          f"{slope(lambda u: center_crop_resize(to_float(u), img, img / raw), (u8,)):7.2f} ms",
          flush=True)
    print(f"rrc            : "
          f"{slope(lambda u, k: random_resized_crop(to_float(u), k, img), (u8, key)):7.2f} ms",
          flush=True)
    print(f"hflip          : {slope(hflip, (x, key)):7.2f} ms", flush=True)
    print(f"trivial_augment: "
          f"{slope(trivial_augment_wide, (x, key)):7.2f} ms", flush=True)
    print(f"  equalize     : {slope(_equalize, (x,)):7.2f} ms", flush=True)
    from basd_tpu.ops.augment import _equalize_masked

    mask = jnp.asarray(np.random.default_rng(1).random(b) < 1 / 14.0)
    print(f"  eq masked    : "
          f"{slope(lambda y: _equalize_masked(y, mask), (x,)):7.2f} ms",
          flush=True)
    zero = jnp.zeros((b,), jnp.float32)
    print(f"  geo warp     : "
          f"{slope(_geometric_warp, (x, zero, zero, zero, zero, zero)):7.2f} ms",
          flush=True)
    print(f"normalize      : "
          f"{slope(lambda y: normalize(y, (0.5,) * 3, (0.25,) * 3), (x,)):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
