"""Isolated A/B of the fused Pallas warp kernel vs the XLA tap-sweep path
at the Table-1 augment shape (B=256, 224 px). Slope-timed on the real
chip; also checks numerics parity between the two compiled paths.

BASD_PROBE_SMOKE=1 shrinks shapes and runs the kernel in interpret mode
off-TPU: a full offline execution of the probe's code path, so a staging
regression can't burn a hardware-window slot (timings meaningless)."""

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

from basd_tpu.ops.augment import _geometric_warp
from basd_tpu.ops.warp_kernel import fused_geometric_warp


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
    smoke = os.environ.get("BASD_PROBE_SMOKE") == "1"
    interp = smoke and jax.default_backend() != "tpu"
    b, n = (8, 32) if smoke else (256, 224)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, n, n, 3)).astype(np.float32))
    # realistic TrivialAugment param mix: 5/14 geometric, one op each
    op = rng.integers(0, 14, b)
    mag = (rng.integers(0, 31, b) / 30.0) * np.where(rng.random(b) < 0.5, 1, -1)
    angle = np.where(op == 5, mag * 135.0 * np.pi / 180.0, 0).astype(np.float32)
    shx = np.where(op == 1, mag * 0.99, 0).astype(np.float32)
    shy = np.where(op == 2, mag * 0.99, 0).astype(np.float32)
    tx = np.where(op == 3, mag * 32.0, 0).astype(np.float32)
    ty = np.where(op == 4, mag * 32.0, 0).astype(np.float32)
    flip = (rng.random(b) < 0.5)
    A = jnp.asarray
    args = (x, A(angle), A(shx), A(shy), A(tx), A(ty))

    def xla_path(x, angle, shx, shy, tx, ty):
        # production (conjugated-hflip) form — the naive pre-flip form
        # miscompiles on XLA:TPU at this shape (probe_warp_parity8.py)
        neg = jnp.where(A(flip), -1.0, 1.0)
        out = _geometric_warp(x, angle * neg, shx * neg, shy * neg,
                              tx * neg, ty)
        return jnp.where(A(flip)[:, None, None, None],
                         out[:, :, ::-1, :], out)

    def fused_path(x, angle, shx, shy, tx, ty):
        return fused_geometric_warp(x, angle, shx, shy, tx, ty, A(flip),
                                    interpret=interp)

    w = np.asarray(jax.jit(xla_path)(*args))
    g = np.asarray(jax.jit(fused_path)(*args))
    print(f"parity max err: {np.abs(w - g).max():.3e}", flush=True)
    print(f"xla  : {slope(xla_path, args):7.2f} ms", flush=True)
    print(f"fused: {slope(fused_path, args):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
