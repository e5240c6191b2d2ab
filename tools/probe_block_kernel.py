"""Isolated A/B of the whole-block fused kernel vs the XLA Block path
and the attention-kernel-only path, at the Table-1 teacher shape.
Slope-timed on the real chip; checks numerics parity of tokens and the
emitted CLS importance."""

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


def slope(fn, *args, n=12):
    out = fn(*args)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(out)[0].ravel()[0]))

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.perf_counter() - t0

    run(3)
    t1 = run(5)
    t2 = run(5 + n)
    return (t2 - t1) / n * 1e3


def main():
    # BASD_PROBE_SMOKE=1: tiny shapes + interpret-mode kernels off-TPU, so
    # the probe's full code path executes offline (timings meaningless).
    smoke = os.environ.get("BASD_PROBE_SMOKE") == "1"
    fused = ("fused_interpret"
             if smoke and jax.default_backend() != "tpu" else "fused")
    b, n, d, h = (4, 17, 64, 2) if smoke else (256, 257, 768, 12)
    block = Block(d, h, 4.0, 0.0, True, jnp.bfloat16, layer_scale_init=1e-5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.5, jnp.bfloat16)
    os.environ["BASD_TPU_BLOCK"] = "xla"
    params = jax.jit(lambda: block.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n, d), jnp.bfloat16),
        True)["params"])()

    # slab-size (g) sweep: the VMEM working set scales with g while the
    # resident weights amortize either way — measure before adjudicating,
    # so a losing default g can't condemn the kernel.
    arms = [
        ("xla+attnkernel ", {"BASD_TPU_BLOCK": "xla", "BASD_TPU_MLP": "xla"}),
    ]
    for g in (8, 4):
        if b % g == 0:
            arms.append((f"xla+mlpkernel g{g}", {
                "BASD_TPU_BLOCK": "xla", "BASD_TPU_MLP": fused,
                "BASD_TPU_MLP_G": str(g)}))
    for g in (2, 4, 8):
        if b % g == 0:
            arms.append((f"blockkernel   g{g}", {
                "BASD_TPU_BLOCK": fused, "BASD_TPU_MLP": "xla",
                "BASD_TPU_BLOCK_G": str(g)}))

    outs = {}
    for tag, env in arms:
        os.environ.update(env)
        f = jax.jit(lambda p, x: block.apply({"params": p}, x, True))
        ms = slope(f, params, x)
        tok, imp = f(params, x)
        outs[tag] = (np.asarray(tok, np.float32), np.asarray(imp))
        print(f"{tag}: {ms:7.3f} ms", flush=True)
    for v in ("BASD_TPU_BLOCK_G", "BASD_TPU_MLP_G"):
        os.environ.pop(v, None)

    base_t, base_i = outs[arms[0][0]]
    for tag, _ in arms[1:]:
        t, i = outs[tag]
        print(f"{tag} vs base: tok maxerr {np.abs(t - base_t).max():.3e} "
              f"imp maxerr {np.abs(i - base_i).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
