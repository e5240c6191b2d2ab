"""v3 fused-attention candidates at the teacher shape (B=256, H=12, N=257,
hd=64 bf16). Baseline facts from probe_attn_internals: matmuls+exp+max
floor is 3.7 ms; every in-kernel normalization variant (VPU rowsum, or
ones-column with in-kernel concat) costs ~+1.2 ms; XLA chain is 5.9 ms.

Candidates move the denominator machinery out of the VPU's way:
  v3a: V pre-extended with a ones column OUTSIDE the kernel (no in-kernel
       concat; hd 64->65 pads to the same 128-lane physical tile), divide
       inside, bf16 output + m stat.
  v3b: same but o_ext written fp32 and the divide done by XLA outside.
  v3c: v3a without the m stat output.
Chained-slope timing + numerics vs the fp32 oracle.
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


def kernel(q_ref, k_ref, vx_ref, o_ref, m_ref, *, hd, divide, stats):
    q = q_ref[:, 0, :, :]
    k = k_ref[:, 0, :, :]
    vx = vx_ref[:, 0, :, :]  # (G, N, hd+1), last col ones
    dt = q.dtype

    s = jax.lax.dot_general(q, k, _BQK, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(dt)
    o_ext = jax.lax.dot_general(e, vx, _BAV,
                                preferred_element_type=jnp.float32)
    if divide:
        o_ref[:, 0, :, :] = (
            o_ext[:, :, :hd] / o_ext[:, :, hd:hd + 1]
        ).astype(o_ref.dtype)
    else:
        o_ref[:, 0, :, :] = o_ext.astype(o_ref.dtype)
    if stats:
        m_ref[:, 0, :, :] = m


def build(b, n, h, hd, *, g, divide, stats, out_f32):
    spec = lambda w: pl.BlockSpec((g, 1, n, w), lambda i, j: (i, j, 0, 0),
                                  memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((g, 1, n, 1), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    w_out = hd if divide else hd + 1
    outs = [
        jax.ShapeDtypeStruct(
            (b, h, n, w_out), jnp.float32 if out_f32 else jnp.bfloat16
        ),
        jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
    ]
    call = pl.pallas_call(
        partial(kernel, hd=hd, divide=divide, stats=stats),
        grid=(b // g, h),
        in_specs=[spec(hd), spec(hd), spec(hd + 1)],
        out_specs=(spec(w_out), stat),
        out_shape=tuple(outs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * 2,
            transcendentals=b * h * n * n,
        ),
    )

    def fn(q, k, v):
        ones = jnp.ones((v.shape[0], v.shape[1], v.shape[2], 1), v.dtype)
        vx = jnp.concatenate([v, ones], axis=-1)
        o, m = call(q, k, vx)
        if divide:
            return o.astype(jnp.bfloat16)
        return (
            o[:, :, :, :hd] / o[:, :, :, hd:hd + 1]
        ).astype(jnp.bfloat16)

    return jax.jit(fn)


def xla_attention(q, k, v):
    dt = q.dtype
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=dt)
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", e.astype(dt), v, preferred_element_type=jnp.float32
    ) / denom
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
    b, n, h, hd = 256, 257, 12, 64
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, h, n, hd)).astype(np.float32) * 0.3, jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    tf = 4 * b * h * n * n * hd / 1e12

    want = xla_attention(
        q[:2].astype(jnp.float32), k[:2].astype(jnp.float32),
        v[:2].astype(jnp.float32),
    )

    for tag, kw in (
        ("v3a divide-in  +m", dict(divide=True, stats=True, out_f32=False)),
        ("v3b divide-out f32", dict(divide=False, stats=True, out_f32=True)),
        ("v3c divide-in  -m", dict(divide=True, stats=False, out_f32=False)),
    ):
        try:
            fn = build(b, n, h, hd, g=8, **kw)
            got = fn(q[:2], k[:2], v[:2])
            err = float(
                jnp.abs(got[:, :, :, :hd].astype(jnp.float32) - want).max()
            )
            t = slope(fn, (q, k, v))
            print(f"{tag}: {t*1e3:6.2f} ms ({tf/t:5.1f} TF/s) "
                  f"maxerr {err:.2e}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{tag}: FAIL {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
