"""Dissect ONE teacher block at the Table-1 shape (D=768, H=12, N=257,
B=256, bf16, LayerScale): full block vs attention half vs MLP half vs the
bare matmuls/norms — attributes the teacher's 144 ms / 12 layers."""

from __future__ import annotations

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

import flax.linen as nn

from basd_tpu.models.vit import Attention, Block, Mlp
from basd_tpu.ops.attention import fused_attention_sharded


def timeit(f, *args, n=20):
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


def main():
    b, n, d, h = 256, 257, 768, 12
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, dt)

    block = Block(d, h, 4.0, 0.0, True, dt, layer_scale_init=1e-5)
    params = jax.jit(lambda: block.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n, d), dt), True)["params"],
    )()

    f_block = jax.jit(lambda p, x: block.apply({"params": p}, x, True))
    print(f"full block:        {timeit(f_block, params, x):7.3f} ms", flush=True)

    attn = Attention(d, h, True, dt)
    ap = {"qkv": params["attn"]["qkv"], "proj": params["attn"]["proj"]}
    f_attn = jax.jit(lambda p, x: attn.apply({"params": p}, x, True))
    print(f"attn (qkv+core+proj+imp): {timeit(f_attn, ap, x):7.3f} ms", flush=True)

    mlp = Mlp(d, 4 * d, dt)
    mp = params["mlp"]
    f_mlp = jax.jit(lambda p, x: mlp.apply({"params": p}, x))
    print(f"mlp (fc1+gelu+fc2):       {timeit(f_mlp, mp, x):7.3f} ms", flush=True)

    ln = nn.LayerNorm(dtype=dt)
    lp = params["norm1"]
    f_ln = jax.jit(lambda p, x: ln.apply({"params": p}, x))
    print(f"layernorm:         {timeit(f_ln, lp, x):7.3f} ms", flush=True)

    # bare pieces
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, dt)
    f_qkv = jax.jit(lambda x, w: x @ w)
    print(f"qkv matmul:        {timeit(f_qkv, x, wqkv):7.3f} ms", flush=True)

    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)) * 0.02, dt)
    hd = d // h

    def core(qkv):
        q = qkv[:, :, :d]
        k = qkv[:, :, d : 2 * d]
        v = qkv[:, :, 2 * d :]
        return fused_attention_sharded(q, k, v, hd)

    f_core = jax.jit(core)
    print(f"fused attn core:   {timeit(f_core, qkv):7.3f} ms", flush=True)

    def imp(qkv):
        qh = qkv[:, :, :d].reshape(b, n, h, hd)
        kh = qkv[:, :, d : 2 * d].reshape(b, n, h, hd)
        cls_logits = jnp.einsum(
            "bhd,bmhd->bhm", qh[:, 0], kh,
            preferred_element_type=jnp.float32) * hd**-0.5
        return jax.nn.softmax(cls_logits, axis=-1)[:, :, 1:].mean(axis=1)

    f_imp = jax.jit(imp)
    print(f"cls importance:    {timeit(f_imp, qkv):7.3f} ms", flush=True)


if __name__ == "__main__" and "--gelu" not in sys.argv:
    main()


def gelu_variants():
    b, n, d = 256, 257, 768
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, dt)
    w1 = jnp.asarray(rng.standard_normal((d, 4 * d)) * 0.02, dt)
    w2 = jnp.asarray(rng.standard_normal((4 * d, d)) * 0.02, dt)

    f_mm = jax.jit(lambda x: (x @ w1) @ w2)
    print(f"fc1+fc2 (no act):   {timeit(f_mm, x):7.3f} ms", flush=True)
    f_erf = jax.jit(lambda x: nn.gelu(x @ w1, approximate=False) @ w2)
    print(f"fc1+erf-gelu+fc2:   {timeit(f_erf, x):7.3f} ms", flush=True)
    f_tanh = jax.jit(lambda x: nn.gelu(x @ w1, approximate=True) @ w2)
    print(f"fc1+tanh-gelu+fc2:  {timeit(f_tanh, x):7.3f} ms", flush=True)
    f_relu = jax.jit(lambda x: jax.nn.relu(x @ w1) @ w2)
    print(f"fc1+relu+fc2:       {timeit(f_relu, x):7.3f} ms", flush=True)
    # erf computed in bf16 (default: jnp upcasts transcendentals?)
    f_erf16 = jax.jit(
        lambda x: ((x @ w1).astype(jnp.bfloat16) * 0.5
                   * (1.0 + jax.lax.erf((x @ w1).astype(jnp.bfloat16)
                                        * np.float32(0.70710678)))) @ w2)
    print(f"fc1+bf16-erf+fc2:   {timeit(f_erf16, x):7.3f} ms", flush=True)


if __name__ == "__main__" and "--gelu" in sys.argv:
    gelu_variants()
