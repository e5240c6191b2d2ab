"""Sweep-count vs fp32-floor for the Pallas Jacobi eigh at the Table-1
angles shape (48, 192, 192) — the selector's dominant serial chain
(in-context 99.3 ms selector, tools/probe_step_gap.py).

Context: sweeps=6 was tuned to the fp32 plateau at the TABLE-3 angle
shape (K=80, docs/DESIGN.md section 6); cyclic Jacobi needs more sweeps
as n grows, and a chunk sweep at n=192 (2026-08-19) measured
eig_err ~1e-3 at sweeps=6 on synthetic [0,1] spectra — possibly NOT at
the floor. This probe measures, per sweep count, at (48, 192, 192):

  * time (chained-slope)
  * max |eig - LAPACK64| on two spectra families:
      - synthetic uniform [0,1]^2 (worst-case clustering near 0)
      - principal-angle-realistic: sigma in [0,1] with a near-1 cluster
        (cross-Grams of overlapping subspaces — the production input)
  * the CONSUMED quantity: weighted sum_i w_i arccos(sigma_i)^2 error
    (arccos amplifies near sigma=1 by 1/sqrt(1-sigma^2))

Chunk-sweep verdict (same day, recorded here; probe_jacobi_chunk
deleted): chunk/grid is IRRELEVANT — 49 ms flat from grid=6 to grid=1
at (48,192,192): the kernel is bound by the serial dependency chain of
(n-1)*sweeps rotation trips, not grid count or data size. The only perf
lever is the trip count itself.
"""

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

from basd_tpu.spectral import pallas_jacobi as pj

SMOKE = os.environ.get("BASD_PROBE_SMOKE") == "1"


def timeit(f, *args, n=20):
    first = jax.tree_util.tree_leaves(f(*args))[0]
    np.asarray(jax.device_get(first.ravel()[0]))
    if SMOKE:
        return float("nan")

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


def make_cases(b, n, rng):
    q = np.linalg.qr(rng.standard_normal((b, n, n)))[0]
    cases = {}
    lam = rng.random((b, n)) ** 2
    cases["uniform"] = np.einsum("bik,bk,bjk->bij", q, lam, q)
    # principal-angle regime: sigma^2 with a tight cluster near 1
    # (overlapping subspaces) + spread mid-range + zeros (rank mask)
    k1 = n // 3
    sig = np.concatenate(
        [1.0 - 10.0 ** rng.uniform(-7, -2, (b, k1)),  # near-1 cluster
         rng.uniform(0.1, 0.9, (b, n - 2 * k1)),
         np.zeros((b, k1))], axis=1)
    cases["angles"] = np.einsum("bik,bk,bjk->bij", q, sig**2, q)
    return cases


def main():
    b, n = (6, 16) if SMOKE else (48, 192)
    rng = np.random.default_rng(0)
    cases = make_cases(b, n, rng)
    want = {k: np.sort(np.linalg.eigvalsh(v.astype(np.float64)), -1)[:, ::-1]
            for k, v in cases.items()}
    # production weighting: descending teacher svals as weights
    w = np.sort(rng.random((b, n)), -1)[:, ::-1]

    def d2_of(eigvals):  # eigvals descending, = sigma^2 of the cross
        sigma = np.sqrt(np.clip(eigvals, 0.0, None))
        theta = np.arccos(np.clip(sigma, None, 1.0 - np.finfo(np.float32).eps))
        return (w * theta**2).sum(-1) / w.sum(-1)

    for sweeps in ([2, 3] if SMOKE else [5, 6, 7, 8, 9, 12]):
        f = jax.jit(lambda x, s=sweeps: pj.pallas_jacobi_eigh(
            x, sweeps=s, interpret=SMOKE)[0])
        ms = None
        for name, a in cases.items():
            got = np.asarray(f(jnp.asarray(a, jnp.float32)))
            eig_err = float(np.max(np.abs(got - want[name])))
            d2_err = float(np.max(np.abs(d2_of(got) - d2_of(want[name]))))
            if ms is None:
                ms = timeit(f, jnp.asarray(a, jnp.float32))
            print(f"sweeps {sweeps:2d} [{name:7s}]: {ms:7.2f} ms  "
                  f"eig_err {eig_err:.2e}  d2_err {d2_err:.2e}", flush=True)


if __name__ == "__main__":
    main()
