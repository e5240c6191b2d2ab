"""Slab-design fused attention probe: kernel consumes the NATIVE
(B, N, H, hd) layout the qkv projection produces (no HBM transposes —
the in-context A/B showed the (B,H,N,hd) wrapper transposes cost more
than the kernel saves: teacher fwd 198 ms fused vs ~176 ms XLA).

Grid is (B/G,); each program holds (G, N, H, hd) q/k/v slabs in VMEM and
loops heads statically. Per head: 2D-batched QK^T -> fp32 softmax -> AV.
Variants: denominator via VPU rowsum vs ones-column MXU lane; lane-aligned
key split at N % 128 == 1.

All timings INCLUDE producer layout (inputs arrive (B, N, H, hd)), so the
XLA chain comparison is apples-to-apples at the model's real boundary.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQK = (((2,), (2,)), ((0,), (0,)))  # (G,N,hd) x (G,N,hd) -> (G,N,N)
_BAV = (((2,), (1,)), ((0,), (0,)))  # (G,N,N) x (G,N,hd) -> (G,N,hd)


def kernel(q_ref, k_ref, v_ref, o_ref, *, h, onescol, split):
    dt = q_ref.dtype
    n = q_ref.shape[1]
    hd = q_ref.shape[3]
    g = q_ref.shape[0]

    for hi in range(h):
        q = q_ref[:, :, hi, :]  # (G, N, hd) VMEM slice
        k = k_ref[:, :, hi, :]
        v = v_ref[:, :, hi, :]
        if split and n % 128 == 1:
            c = n - 1
            k_main, k_tail = k[:, :c, :], k[:, c:, :]
            v_main, v_tail = v[:, :c, :], v[:, c:, :]
            s = jax.lax.dot_general(q, k_main, _BQK,
                                    preferred_element_type=jnp.float32)
            s_tail = jnp.sum(
                q.astype(jnp.float32) * k_tail.astype(jnp.float32),
                axis=-1, keepdims=True)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_tail)
            e = jnp.exp(s - m).astype(dt)
            e_tail = jnp.exp(s_tail - m)
            if onescol:
                vx = jnp.concatenate(
                    [v_main, jnp.ones((g, c, 1), v.dtype)], axis=-1)
                o_ext = jax.lax.dot_general(
                    e, vx, _BAV, preferred_element_type=jnp.float32)
                denom = o_ext[:, :, hd:] + e_tail
                o = o_ext[:, :, :hd] + e_tail * v_tail.astype(jnp.float32)
            else:
                denom = (jnp.sum(e.astype(jnp.float32), axis=-1,
                                 keepdims=True) + e_tail)
                o = jax.lax.dot_general(
                    e, v_main, _BAV, preferred_element_type=jnp.float32
                ) + e_tail * v_tail.astype(jnp.float32)
        else:
            s = jax.lax.dot_general(q, k, _BQK,
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m).astype(dt)
            if onescol:
                vx = jnp.concatenate(
                    [v, jnp.ones((g, n, 1), v.dtype)], axis=-1)
                o_ext = jax.lax.dot_general(
                    e, vx, _BAV, preferred_element_type=jnp.float32)
                denom = o_ext[:, :, hd:]
                o = o_ext[:, :, :hd]
            else:
                denom = jnp.sum(e.astype(jnp.float32), axis=-1,
                                keepdims=True)
                o = jax.lax.dot_general(
                    e, v, _BAV, preferred_element_type=jnp.float32)
        o_ref[:, :, hi, :] = (o / denom).astype(dt)


def build(b, n, h, hd, *, g, onescol, split):
    spec = pl.BlockSpec((g, n, h, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(kernel, h=h, onescol=onescol, split=split),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h, hd), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * 2,
            transcendentals=b * h * n * n,
        ),
    )
    return jax.jit(lambda q, k, v: call(q, k, v))


def xla_attention(q, k, v):
    """models/vit.py einsum chain from the native (B, N, H, hd) layout."""
    dt = q.dtype
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=dt)
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf - m)
    denom = jnp.sum(e, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", e.astype(dt), v, preferred_element_type=jnp.float32
    ) / jnp.swapaxes(denom, 1, 2)[..., None]
    return out.astype(dt)


def slope(fn, args, n1=10, n2=30):
    def run(iters, a):
        t0 = time.perf_counter()
        q, k, v = a
        for _ in range(iters):
            q = fn(q, k, v)
        _ = float(jnp.sum(q[0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0, (q, k, v)

    _, args = run(3, args)
    t1, args = run(n1, args)
    t2, args = run(n2, args)
    return (t2 - t1) / (n2 - n1)


def main():
    for tag, (b, n, h, hd) in (
        ("teacher N=257 H=12", (256, 257, 12, 64)),
        ("student N=197 H=6", (256, 197, 6, 64)),
    ):
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, hd)).astype(np.float32) * 0.3,
            jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        tf = 4 * b * h * n * n * hd / 1e12

        tx = slope(jax.jit(xla_attention), (q, k, v))
        print(f"{tag}: xla {tx*1e3:6.2f} ms ({tf/tx:5.1f} TF/s)", flush=True)

        want = xla_attention(
            q[:2].astype(jnp.float32), k[:2].astype(jnp.float32),
            v[:2].astype(jnp.float32))
        # VMEM: (g, n, h, hd) bf16 slabs x3 double-buffered + fp32 scores;
        # g=8 at the teacher shape blows the 16 MB budget
        cfgs = (
            [(2, False, False), (4, False, False), (4, False, True),
             (4, True, False)]
            if n % 128 == 1
            else [(2, False, False), (4, False, False), (4, True, False)]
        )
        for g, onescol, split in cfgs:
                    if b % g:
                        continue
                    try:
                        fn = build(b, n, h, hd, g=g, onescol=onescol,
                                   split=split)
                        got = fn(q, k, v)[:2]
                        err = float(jnp.abs(
                            got.astype(jnp.float32) - want).max())
                        t = slope(fn, (q, k, v))
                        print(
                            f"  slab g={g} ones={int(onescol)} "
                            f"split={int(split)}: {t*1e3:6.2f} ms "
                            f"({tf/t:5.1f} TF/s) {tx/t:4.2f}x "
                            f"maxerr {err:.2e}", flush=True)
                    except Exception as ex:  # noqa: BLE001
                        print(f"  slab g={g} ones={int(onescol)} "
                              f"split={int(split)}: FAIL "
                              f"{type(ex).__name__}: {str(ex)[:120]}",
                              flush=True)


if __name__ == "__main__":
    main()
