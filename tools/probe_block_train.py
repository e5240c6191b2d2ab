"""Hardware probe for the fused whole-block TRAIN kernel
(`ops/block_train.py`): Mosaic-compile check, numerics parity vs the XLA
chain, and slope-timed fwd+bwd A/B at the Table-1 student shape and the
Table-3 student shape. Run on the real TPU (axon)."""

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

from basd_tpu.models.vit import Block
from basd_tpu.ops.block_train import fused_block_train


def slope(f, *args, n=16):
    first = jax.tree_util.tree_leaves(f(*args))[0]
    np.asarray(jax.device_get(first.ravel()[0]))

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = f(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.perf_counter() - t0

    run(3)
    t_small = run(5)
    t_big = run(5 + n)
    return (t_big - t_small) / n * 1e3


def probe(tag, b, n, d, heads, interp=False):
    hd = d // heads
    block = Block(d, heads, 4.0, 0.0, True, jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.5, jnp.bfloat16)
    os.environ["BASD_TPU_TRAIN_BLOCK"] = "xla"
    os.environ["BASD_TPU_ATTENTION"] = "auto"  # production XLA-path config
    params = jax.jit(lambda: block.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n, d), jnp.bfloat16),
        True)["params"])()
    ones = jnp.ones((b,), jnp.float32)

    def loss_fused(p, xx):
        out, _ = fused_block_train(xx, p, ones, ones, hd, 1.0, 1.0, interp)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(p, xx):
        out, _ = block.apply({"params": p}, xx, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1)))
    g_xla = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1)))

    (lf, gf) = g_fused(params, x)
    (lx, gx) = g_xla(params, x)
    print(f"{tag} loss fused={float(lf):.4f} xla={float(lx):.4f}", flush=True)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx[0]))
    worst = 0.0
    for kp, leaf in jax.tree_util.tree_leaves_with_path(gf[0]):
        a = np.asarray(leaf, np.float32)
        bb = np.asarray(flat_x[kp], np.float32)
        rel = np.abs(a - bb).max() / (np.abs(bb).max() + 1e-30)
        worst = max(worst, float(rel))
    dxrel = float(np.abs(np.asarray(gf[1], np.float32)
                         - np.asarray(gx[1], np.float32)).max()
                  / (np.abs(np.asarray(gx[1], np.float32)).max() + 1e-30))
    print(f"{tag} grad rel: params worst {worst:.3e}, dx {dxrel:.3e}",
          flush=True)

    ms_x = slope(g_xla, params, x)
    # slab-size (g) sweep — a losing default g must not condemn the kernel
    for g in (2, 4):
        if b % g:
            continue
        os.environ["BASD_TPU_TRAIN_BLOCK_G"] = str(g)
        g_f = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1)))
        ms_f = slope(g_f, params, x)
        print(f"{tag} f+b per block g{g}: fused {ms_f:7.3f} ms vs "
              f"xla {ms_x:7.3f} ms ({ms_x / ms_f:.2f}x)", flush=True)
    os.environ.pop("BASD_TPU_TRAIN_BLOCK_G", None)


def main():
    # BASD_PROBE_SMOKE=1: one tiny-shape pass with interpret-mode kernels
    # off-TPU — full offline execution of the probe's code path, so a
    # staging regression can't burn a hardware-window slot.
    if os.environ.get("BASD_PROBE_SMOKE") == "1":
        probe("smoke  (  4, 17, 64,h2)", 4, 17, 64, 2,
              interp=jax.default_backend() != "tpu")
        return
    probe("table1 (256,197,384,h6)", 256, 197, 384, 6)
    probe("table3 (128, 65,192,h3)", 128, 65, 192, 3)


if __name__ == "__main__":
    main()
