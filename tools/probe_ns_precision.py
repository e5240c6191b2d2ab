"""On-TPU accuracy + speed A/B of the scheduled NS square root at
HIGH (bf16x3) vs HIGHEST (bf16x6) matmul precision. The 18-iteration
cubic NS diverged at HIGH (docs/DESIGN.md); the 7-step quintic schedule
compounds less — measure, don't assume. Oracle: float64 SVD on host."""

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

from basd_tpu.spectral import ops as S


def make_inputs(b, n, ds, dt, cond, seed):
    rng = np.random.default_rng(seed)
    # decaying-spectrum token matrices: S = U diag(s) V^T -like
    def decay(m, d):
        u = rng.standard_normal((b, m, d))
        scale = np.geomspace(1.0, 1.0 / np.sqrt(cond), d)
        return (u * scale).astype(np.float32)

    return decay(n, ds), decay(n, dt)


def main():
    b, n, ds, dt = 64, 197, 384, 768
    s_np, t_np = make_inputs(b, n, ds, dt, cond=1e6, seed=0)
    want = np.array([
        np.linalg.svd(s_np[i].astype(np.float64).T @ t_np[i].astype(np.float64),
                      compute_uv=False).sum()
        for i in range(b)
    ])

    s, t = jnp.asarray(s_np), jnp.asarray(t_np)

    def timed(f, *args, n_it=10):
        out = f(*args)
        np.asarray(jax.device_get(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(*args)
        np.asarray(jax.device_get(r.ravel()[0]))
        t1 = time.perf_counter()
        for _ in range(3 + n_it):
            r = f(*args)
        np.asarray(jax.device_get(r.ravel()[0]))
        t2 = time.perf_counter()
        return out, ((t2 - t1) - (t1 - t0)) / n_it * 1e3

    for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("HIGH", jax.lax.Precision.HIGH)):
        old = S._HI
        S._HI = prec
        try:
            f = jax.jit(lambda a, c: S.nuclear_norm_pair(a, c))
            got, ms = timed(f, s, t)
            rel = np.abs(np.asarray(got, np.float64) - want) / want
            # grad sanity: finite + orthogonal-factor singular values <= 1
            g = jax.jit(jax.grad(
                lambda a, c: jnp.sum(S.nuclear_norm_pair(a, c))))(s, t)
            gfin = bool(np.all(np.isfinite(np.asarray(g))))
            print(f"{prec_name}: value relerr max {rel.max():.2e} "
                  f"median {np.median(rel):.2e}; grads finite={gfin}; "
                  f"{ms:6.2f} ms", flush=True)
        finally:
            S._HI = old


if __name__ == "__main__":
    main()
