"""Internals ablation of the fused attention kernel at the teacher shape
(B=256, H=12, N=257, hd=64 bf16): which pass burns the time? Variants
cumulatively disable softmax stages (full -> nomax -> noexp -> mxonly).
Chained-slope timing; numbers are wrong math, timing only."""

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


def kernel(q_ref, k_ref, v_ref, o_ref, *, variant):
    q = q_ref[:, 0, :, :]
    k = k_ref[:, 0, :, :]
    v = v_ref[:, 0, :, :]
    dt = q.dtype

    s = jax.lax.dot_general(q, k, _BQK, preferred_element_type=jnp.float32)
    if variant == "full":
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
    elif variant == "tilemax":
        m = jnp.max(s)  # scalar tile max, no per-row reduce
        e = jnp.exp(s - m).astype(dt)
    elif variant == "nomax":
        e = jnp.exp(s).astype(dt)
    elif variant == "noexp":
        e = s.astype(dt)
    elif variant == "mxonly":
        e = q_ref[:, 0, :, :]  # skip s entirely: AV reads (G,N,hd)... shapes
        # differ; instead reuse s cast without the fp32 round-trip
        e = jax.lax.dot_general(
            q, k, _BQK, preferred_element_type=dt
        )
    elif variant == "bf16exp":
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(dt))
    o = jax.lax.dot_general(e, v, _BAV, preferred_element_type=jnp.float32)
    o_ref[:, 0, :, :] = o.astype(o_ref.dtype)


def build(b, n, h, hd, *, g, variant):
    spec = pl.BlockSpec((g, 1, n, hd), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(kernel, variant=variant),
        grid=(b // g, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * 2,
            transcendentals=b * h * n * n,
        ),
    )
    return jax.jit(lambda q, k, v: call(q, k, v))


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
        rng.normal(size=(b, h, n, hd)).astype(np.float32) * 0.1, jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    tf = 4 * b * h * n * n * hd / 1e12
    variants = sys.argv[1:] or [
        "full", "tilemax", "nomax", "bf16exp", "noexp", "mxonly"]
    for variant in variants:
        try:
            fn = build(b, n, h, hd, g=8, variant=variant)
            t = slope(fn, (q, k, v))
            print(f"{variant:8s}: {t*1e3:6.2f} ms ({tf/t:5.1f} TF/s)",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{variant:8s}: FAIL {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
