"""Isolated A/B of the fused Pallas attention vs the XLA einsum chain in
`models/vit.py`, at the Table-1 shapes. Chained-slope timing (bench.py
methodology: output fed back as input, device->host value fetch as the
only true sync). Isolated wins do not always survive in context — confirm
with tools/profile_step.py before claiming anything (CLAUDE.md)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.ops.attention import fused_attention


def xla_attention(q, k, v):
    """The exact einsum chain of models/vit.py Attention (deferred norm)."""
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


def slope_time(fn, args, n1=10, n2=30):
    """fn must map args -> args (chainable)."""
    fn = jax.jit(fn)

    def run(iters, a):
        t0 = time.perf_counter()
        for _ in range(iters):
            a = fn(*a)
        _ = float(jnp.sum(a[0][0, 0]))  # value fetch = sync
        return time.perf_counter() - t0, a

    _, args = run(3, args)
    t1, args = run(n1, args)
    t2, args = run(n2, args)
    return (t2 - t1) / (n2 - n1)


def main():
    for tag, (b, n, h, hd) in (
        ("teacher ViT-B/14@224 (fwd)", (256, 257, 12, 64)),
        ("student ViT-S/16@224 (fwd)", (256, 197, 6, 64)),
    ):
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, hd)).astype(np.float32) * 0.1,
            jnp.bfloat16,
        )
        q, k, v = mk(), mk(), mk()
        core_tflop = 4 * b * h * n * n * hd / 1e12

        def chain_x(q, k, v):
            o = xla_attention(q, k, v)
            return o, k, v

        def chain_f(q, k, v):
            o = fused_attention(q, k, v)
            return o, k, v

        tx = slope_time(chain_x, (q, k, v))
        tf = slope_time(chain_f, (q, k, v))
        print(
            f"{tag}: xla {tx*1e3:7.2f} ms ({core_tflop/tx:6.1f} TF/s) | "
            f"fused {tf*1e3:7.2f} ms ({core_tflop/tf:6.1f} TF/s) | "
            f"{tx/tf:.2f}x"
        )

        # fwd+bwd (student train step shape)
        def chain_xg(q, k, v):
            g = jax.grad(lambda q: jnp.sum(xla_attention(q, k, v)))(q)
            return g, k, v

        def chain_fg(q, k, v):
            g = jax.grad(lambda q: jnp.sum(fused_attention(q, k, v)))(q)
            return g, k, v

        txg = slope_time(chain_xg, (q, k, v), n1=6, n2=18)
        tfg = slope_time(chain_fg, (q, k, v), n1=6, n2=18)
        print(
            f"  fwd+bwd: xla {txg*1e3:7.2f} ms | fused {tfg*1e3:7.2f} ms | "
            f"{txg/tfg:.2f}x"
        )

        # numerics vs fp32 oracle on a small slice
        qs, ks, vs = q[:2], k[:2], v[:2]
        want = xla_attention(
            qs.astype(jnp.float32), ks.astype(jnp.float32), vs.astype(jnp.float32)
        )
        got = fused_attention(qs, ks, vs)
        ref = xla_attention(qs, ks, vs)
        err_f = float(jnp.abs(got.astype(jnp.float32) - want).max())
        err_x = float(jnp.abs(ref.astype(jnp.float32) - want).max())
        print(f"  max|err| vs fp32 oracle: fused {err_f:.3e} | xla {err_x:.3e}")


if __name__ == "__main__":
    main()
