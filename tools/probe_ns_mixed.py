"""On-TPU accuracy + speed A/B of PER-STEP matmul precision schedules
for the Gram-space scheduled-quintic NS square root (`spectral.ops.
_ns_sqrt_pair`, consumed by `_nuc_pg_fwd`). The shipping schedule runs
every matmul at HIGH (bf16x3); NS is self-correcting toward its fixed
point, so EARLY iterations may tolerate single-pass bf16 (DEFAULT) with
only the LAST steps at HIGH — a potential ~2x on the loss-tail's
dominant matmul chain. The 18-step cubic NS diverged outright at
anything below HIGH (docs/DESIGN.md section 3); the quintic compounds
differently — measure, don't assume. Oracle: float64 eigvals on host.

Run on the real TPU (axon). BASD_PROBE_SMOKE=1 runs tiny shapes on CPU
(staging check only — CPU ignores precision, numbers meaningless).
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

from basd_tpu.spectral.ops import _NS_SQRT_SCHED, _frob

_F32 = jnp.float32
_DEF = jax.lax.Precision.DEFAULT
_HIGH = jax.lax.Precision.HIGH


def ns_value(gs, gt, precs):
    """tr((G_t G_s)^1/2) via the scheduled quintic with per-step matmul
    precision `precs[k]` (len == len(_NS_SQRT_SCHED)); the Gram product
    + trace contract of `spectral.ops._nuc_pg_fwd`."""
    w = jnp.einsum("...nm,...mk->...nk", gt, gs,
                   preferred_element_type=_F32, precision=_HIGH)
    scale = _frob(w)
    a = w / scale
    d = a.shape[-1]
    eye = jnp.eye(d, dtype=a.dtype)
    y, z = a, jnp.broadcast_to(eye, a.shape)
    for (ca, cb, cc), prec in zip(_NS_SQRT_SCHED, precs):
        mm = lambda p, q: jnp.einsum("...ij,...jk->...ik", p, q,
                                     preferred_element_type=_F32,
                                     precision=prec)
        m = mm(z, y)
        t = ca * eye + cb * m + cc * mm(m, m)
        y = mm(y, t)
        z = mm(t, z)
    return jnp.sqrt(scale[..., 0, 0]) * jnp.trace(y, axis1=-2, axis2=-1)


def slope(f, *args, n=16):
    np.asarray(jax.device_get(f(*args).ravel()[0]))

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = f(*args)
        np.asarray(jax.device_get(r.ravel()[0]))
        return time.perf_counter() - t0

    run(3)
    t_small = run(5)
    t_big = run(5 + n)
    return (t_big - t_small) / n * 1e3


def main():
    smoke = os.environ.get("BASD_PROBE_SMOKE") == "1"
    # Table-1 loss-tail shape: P*B = 4*256 pairs of (197, 197) Grams
    # (smoke: tiny)
    bp, n_tok, d = (8, 17, 12) if smoke else (1024, 197, 64)
    rng = np.random.default_rng(0)
    # decaying-spectrum token features -> realistic ill-conditioned Grams
    def grams(seed):
        r = np.random.default_rng(seed)
        u = r.standard_normal((bp, n_tok, d))
        u = u * np.geomspace(1.0, 1e-3, d)
        g = u @ u.transpose(0, 2, 1)
        return g.astype(np.float32)

    gs_np, gt_np = grams(1), grams(2)
    want = np.array([
        np.sqrt(np.clip(np.linalg.eigvals(
            gt_np[i].astype(np.float64) @ gs_np[i].astype(np.float64)
        ).real, 0.0, None)).sum()
        for i in range(min(bp, 64))
    ])
    gs, gt = jnp.asarray(gs_np), jnp.asarray(gt_np)

    k = len(_NS_SQRT_SCHED)
    variants = (
        ("all-HIGH (shipping)", (_HIGH,) * k),
        ("DEF*5 + HIGH*2", (_DEF,) * (k - 2) + (_HIGH,) * 2),
        ("DEF*4 + HIGH*3", (_DEF,) * (k - 3) + (_HIGH,) * 3),
        ("all-DEFAULT", (_DEF,) * k),
    )
    for name, precs in variants:
        f = jax.jit(lambda a, b, p=precs: ns_value(a, b, p))
        got = np.asarray(f(gs, gt), np.float64)[: len(want)]
        rel = np.abs(got - want) / np.abs(want)
        ms = slope(f, gs, gt)
        print(f"{name:<22}: relerr max {rel.max():.2e} "
              f"median {np.median(rel):.2e}; {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
