"""Fused attention from the NATIVE (B, N, D) layout (D = H*hd) — no HBM
transposes, no middle-dim block slicing (probe_attn_slab's 4D design
crashed the Mosaic compiler on every config).

 (A) lane-blocked: grid (B/G, H); BlockSpec carves the (g, N, hd) block
     straight out of the lane dimension via index_map (i, 0, j). DMA rows
     are 128-byte bursts (hd=64 bf16) — possibly bandwidth-inefficient.
 (B) lane-sliced: grid (B/G,); one (g, N, D) slab per program, heads
     carved by in-kernel lane slices (static offsets).

Both fuse QK^T -> fp32 softmax -> AV with the VPU rowsum denominator (the
internals probe showed ones-column vs rowsum is a wash).
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

_BQK = (((2,), (2,)), ((0,), (0,)))
_BAV = (((2,), (1,)), ((0,), (0,)))


def _attend(q, k, v):
    """(G, N, hd) bf16 -> (G, N, hd) fp32-normalized attention."""
    dt = q.dtype
    s = jax.lax.dot_general(q, k, _BQK, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(dt)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(e, v, _BAV, preferred_element_type=jnp.float32)
    return o / denom


def kernel_a(q_ref, k_ref, v_ref, o_ref):
    o = _attend(q_ref[...], k_ref[...], v_ref[...])
    o_ref[...] = o.astype(o_ref.dtype)


def build_a(b, n, h, hd, *, g):
    spec = pl.BlockSpec((g, n, hd), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel_a,
        grid=(b // g, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h * hd), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * n * h * hd * 2,
            transcendentals=b * h * n * n,
        ),
    )
    return jax.jit(lambda q, k, v: call(q, k, v))


def kernel_b(q_ref, k_ref, v_ref, o_ref, *, h, hd):
    for hi in range(h):
        lo = hi * hd
        q = q_ref[:, :, lo:lo + hd]
        k = k_ref[:, :, lo:lo + hd]
        v = v_ref[:, :, lo:lo + hd]
        o_ref[:, :, lo:lo + hd] = _attend(q, k, v).astype(o_ref.dtype)


def build_b(b, n, h, hd, *, g):
    spec = pl.BlockSpec((g, n, h * hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(kernel_b, h=h, hd=hd),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h * hd), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * n * h * hd * 2,
            transcendentals=b * h * n * n,
        ),
    )
    return jax.jit(lambda q, k, v: call(q, k, v))


def xla_attention(q, k, v, h, hd):
    """models/vit.py chain from (B, N, D): reshape + einsum (what the
    model actually traces)."""
    b, n, _ = q.shape
    dt = q.dtype
    q = q.reshape(b, n, h, hd)
    k = k.reshape(b, n, h, hd)
    v = v.reshape(b, n, h, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=dt)
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf - m)
    denom = jnp.sum(e, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", e.astype(dt), v, preferred_element_type=jnp.float32
    ) / jnp.swapaxes(denom, 1, 2)[..., None]
    return out.astype(dt).reshape(b, n, h * hd)


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
            rng.normal(size=(b, n, h * hd)).astype(np.float32) * 0.3,
            jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        tf = 4 * b * h * n * n * hd / 1e12

        fx = jax.jit(partial(xla_attention, h=h, hd=hd))
        tx = slope(fx, (q, k, v))
        print(f"{tag}: xla {tx*1e3:6.2f} ms ({tf/tx:5.1f} TF/s)", flush=True)

        want = np.asarray(
            xla_attention(
                q[:2].astype(jnp.float32), k[:2].astype(jnp.float32),
                v[:2].astype(jnp.float32), h, hd)
        )
        for name, builder, gs in (
            ("A lane-blocked", build_a, (8, 16)),
            ("B lane-sliced ", build_b, (2, 4)),
        ):
            for g in gs:
                if b % g:
                    continue
                try:
                    fn = builder(b, n, h, hd, g=g)
                    got = np.asarray(fn(q, k, v)[:2], np.float32)
                    err = float(np.abs(got - want).max())
                    t = slope(fn, (q, k, v))
                    print(f"  {name} g={g:2d}: {t*1e3:6.2f} ms "
                          f"({tf/t:5.1f} TF/s) {tx/t:4.2f}x "
                          f"maxerr {err:.2e}", flush=True)
                except Exception as ex:  # noqa: BLE001
                    print(f"  {name} g={g:2d}: FAIL {type(ex).__name__}: "
                          f"{str(ex)[:100]}", flush=True)


if __name__ == "__main__":
    main()
