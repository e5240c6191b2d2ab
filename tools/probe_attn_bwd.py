"""Backward-kernel candidate for the lane-sliced fused attention, probed
at the Table-1 shapes with gradients to ALL of q, k, v (the earlier
fwd+bwd probes differentiated q only, which lets XLA dead-code dk/dv —
they under-measured the XLA backward).

Design: same (B, N, D) slab layout as the forward. Inputs add dO plus the
saved softmax stats m, denom laid out (B, N, H) (H lanes); dd =
rowsum(dO * O) per head is computed OUTSIDE on (B, N, D) data. Per head:
recompute s = QK^T and e = exp(s - m); dv = e_norm^T dO; dp = dO V^T;
ds = e * rdenom * (dp - dd); dq = ds K; dk = ds^T Q.
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

from basd_tpu.ops.attention import xla_attention_ref

_BQK = (((2,), (2,)), ((0,), (0,)))
_BAV = (((2,), (1,)), ((0,), (0,)))
_BROWS = (((1,), (1,)), ((0,), (0,)))


def fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, d_ref, *, head_dim):
    d = q_ref.shape[-1]
    h = d // head_dim
    for hi in range(h):
        lo = hi * head_dim
        sl = slice(lo, lo + head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        dt = q.dtype
        s = jax.lax.dot_general(q, k, _BQK,
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(e, v, _BAV,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = (o / denom).astype(o_ref.dtype)
        m_ref[:, :, hi:hi + 1] = m
        d_ref[:, :, hi:hi + 1] = denom


def bwd_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, d_ref, dd_ref,
               dq_ref, dk_ref, dv_ref, *, head_dim):
    d = q_ref.shape[-1]
    h = d // head_dim
    for hi in range(h):
        lo = hi * head_dim
        sl = slice(lo, lo + head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        do = do_ref[:, :, sl].astype(jnp.float32)
        m = m_ref[:, :, hi:hi + 1]
        rdenom = 1.0 / d_ref[:, :, hi:hi + 1]
        dd = dd_ref[:, :, hi:hi + 1]
        dt = q.dtype

        s = jax.lax.dot_general(q, k, _BQK,
                                preferred_element_type=jnp.float32)
        e = jnp.exp(s - m).astype(dt)
        do_scaled = (do * rdenom).astype(dt)
        dv = jax.lax.dot_general(e, do_scaled, _BROWS,
                                 preferred_element_type=jnp.float32)
        # dp here is dP/denom (computed from the pre-scaled dO), so the
        # softmax-VJP rowsum dd must carry the same 1/denom factor:
        # dS = P*(dP - dd) = e*(dP/denom - dd/denom)
        dp = jax.lax.dot_general(do_scaled, v, _BQK,
                                 preferred_element_type=jnp.float32)
        ds = (e.astype(jnp.float32) * (dp - dd * rdenom)).astype(dt)
        dq = jax.lax.dot_general(ds, k, _BAV,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, _BROWS,
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def build(b, n, d, head_dim, *, g, interpret=False, dtype=jnp.bfloat16):
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    h = d // head_dim
    stat = pl.BlockSpec((g, n, h), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, n, d), dtype)
    sshape = jax.ShapeDtypeStruct((b, n, h), jnp.float32)
    fwd = pl.pallas_call(
        partial(fwd_kernel, head_dim=head_dim),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, stat, stat),
        out_shape=(shape, sshape, sshape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * head_dim,
            bytes_accessed=4 * b * n * d * 2,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )
    bwd = pl.pallas_call(
        partial(bwd_kernel, head_dim=head_dim),
        grid=(b // g,),
        in_specs=[spec, spec, spec, spec, stat, stat, stat],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * head_dim,
            bytes_accessed=7 * b * n * d * 2,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )

    def fwd_bwd(q, k, v, do):
        o, m, denom = fwd(q, k, v)
        dd = jnp.sum(
            (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
                b, n, h, head_dim
            ),
            axis=-1,
        )  # (B, N, H)
        return bwd(q, k, v, do, m, denom, dd)

    return jax.jit(fwd_bwd), jax.jit(lambda q, k, v: fwd(q, k, v)[0])


def slope(fn, args, n1=6, n2=18):
    def run(iters, a):
        t0 = time.perf_counter()
        q, rest = a[0], a[1:]
        for _ in range(iters):
            out = fn(q, *rest)
            q = (out[0] if isinstance(out, tuple) else out).astype(q.dtype)
        _ = float(jnp.sum(q[0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0, (q, *rest)

    _, args = run(3, args)
    t1, args = run(n1, args)
    t2, args = run(n2, args)
    return (t2 - t1) / (n2 - n1)


def main():
    for tag, (b, n, h, hd) in (
        ("student N=197 H=6", (256, 197, 6, 64)),
        ("teacher N=257 H=12", (256, 257, 12, 64)),
    ):
        d = h * hd
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, d)).astype(np.float32) * 0.3, jnp.bfloat16)
        q, k, v, do = mk(), mk(), mk(), mk()

        # XLA chain, gradients to ALL inputs
        def xla_all(q, k, v, do):
            _, vjp = jax.vjp(
                partial(xla_attention_ref, head_dim=hd), q, k, v
            )
            return vjp(do)

        f_xla = jax.jit(xla_all)
        tx = slope(f_xla, (q, k, v, do))
        print(f"{tag}: xla fwd+bwd(all) {tx*1e3:6.2f} ms", flush=True)

        # on-chip numerics vs the XLA chain at bf16 tolerance (the
        # fp32 interpret-mode parity ran on CPU; interpret mode through
        # the remote transport is one RTT per op — minutes)
        try:
            fb, fwd_only = build(b, n, d, hd, g=2)
            got = fb(q, k, v, do)
            want = f_xla(q, k, v, do)
            errs = [
                float(jnp.abs(a.astype(jnp.float32)
                              - b_.astype(jnp.float32)).max())
                for a, b_ in zip(got, want)
            ]
            tf = slope(fb, (q, k, v, do))
            tfw = slope(fwd_only, (q, k, v))
            print(f"  kernel fwd-only {tfw*1e3:6.2f} ms | fwd+bwd "
                  f"{tf*1e3:6.2f} ms | {tx/tf:4.2f}x | maxerr dq/dk/dv "
                  f"{errs[0]:.2e}/{errs[1]:.2e}/{errs[2]:.2e}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"  kernel: FAIL {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
