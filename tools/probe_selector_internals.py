"""Selector-internals budget at the Table-1 shapes (teacher ViT-B/14@224:
L=12, B=256, N_t=257, D_t=768; student ViT-S/16: P=4, N_s=197, D_s=384;
auto-calibrated K~200). Slope-timed per component:

  proj_t    : (L, M_t, D_t) @ (D_t, D_s) token projection
  ranks     : MP rank via Householder+Sturm on (L, D_s, D_s)
  topk_t    : teacher subspace iteration (L, M_t, D_s) -> (L, D_s, K)
  topk_s    : student subspace iteration (P, M_s, D_s)
  angles    : masked principal-angle distances, (P, L) pairs, K x K svdvals
  angles_g  : angles fwd+bwd w.r.t. student basis
  select    : full select_and_mix fwd
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
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

from basd_tpu.losses.selector import init_selector, select_and_mix
from basd_tpu.spectral.ops import (
    marchenko_pastur_rank,
    masked_principal_angle_distance,
    topk_basis,
)

_HI = jax.lax.Precision.HIGHEST
_DATA = jax.lax.Precision.HIGH


def slope(fn, args, n1=6, n2=18):
    fn = jax.jit(fn)
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    def run(iters):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(3)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    # BASD_PROBE_SMOKE=1: tiny shapes + interpret-mode kernels off-TPU —
    # full offline execution of the probe's code path (timings meaningless).
    smoke = os.environ.get("BASD_PROBE_SMOKE") == "1"
    if smoke:
        l_t, b, n_t, d_t = 3, 4, 17, 48
        p, n_s, d_s = 2, 10, 24
        k = 8
    elif "--t3" in sys.argv:
        # Table-3 shapes (selector fwd is 9.7 of the 15.1 ms step): tiny
        # teacher token grid (img32 dinov2 -> 2x2+CLS), calibrated k=48
        l_t, b, n_t, d_t = 12, 128, 5, 768
        p, n_s, d_s = 4, 65, 192
        k = 48
    else:
        l_t, b, n_t, d_t = 12, 256, 257, 768
        p, n_s, d_s = 4, 197, 384
        k = 200
    rng = np.random.default_rng(0)

    t_tokens = jnp.asarray(
        rng.normal(size=(l_t, b, n_t, d_t)).astype(np.float32) * 0.5,
        jnp.bfloat16,
    )
    s_tokens = jnp.asarray(
        rng.normal(size=(p, b, n_s, d_s)).astype(np.float32) * 0.5,
        jnp.bfloat16,
    )
    t_imp = jnp.asarray(
        rng.random((l_t, b, n_t)).astype(np.float32)
    )
    sel = init_selector(jax.random.PRNGKey(1), p, d_s, d_t)

    t_flat = t_tokens.astype(jnp.float32).reshape(l_t, b * n_t, d_t)
    s_flat = s_tokens.astype(jnp.float32).reshape(p, b * n_s, d_s)

    def proj_t(tf, pt):
        return jnp.einsum("lmd,ed->lme", tf, pt,
                          preferred_element_type=jnp.float32,
                          precision=_DATA)

    z_t = jax.jit(proj_t)(t_flat, sel.proj_t)
    z_s = jnp.einsum("pmd,ed->pme", s_flat, sel.proj_s,
                     preferred_element_type=jnp.float32, precision=_DATA)

    print(f"proj_t  : {slope(proj_t, (t_flat, sel.proj_t)):7.2f} ms",
          flush=True)
    print(f"ranks   : {slope(marchenko_pastur_rank, (z_t,)):7.2f} ms",
          flush=True)
    print(f"topk_t  : {slope(partial(topk_basis, k=k), (z_t,)):7.2f} ms",
          flush=True)
    print(f"topk_s  : {slope(partial(topk_basis, k=k), (z_s,)):7.2f} ms",
          flush=True)

    from basd_tpu.spectral.ops import centered_gram

    # student-basis alternatives: differentiated iteration vs full eigh —
    # round-5 adjudicated (iteration won 89.2 vs 102.3 ms loss-tail f+b);
    # the rows remain as the canonical re-measurement recipe
    from basd_tpu.spectral.ops import _eigh_desc

    g_s = jax.jit(centered_gram)(z_s)

    def iter_fb(g):
        def f(g):
            basis, _ = topk_basis_gram(g, k)
            return jnp.sum(basis ** 2)
        return jax.grad(f)(g)

    def eigh_fb(g):
        def f(g):
            _, u = _eigh_desc(g)
            return jnp.sum(u[..., :k] ** 2)
        return jax.grad(f)(g)

    from basd_tpu.spectral import topk_basis_gram
    print(f"topk_s iter fwd : "
          f"{slope(partial(topk_basis_gram, k=k), (g_s,)):7.2f} ms",
          flush=True)
    print(f"topk_s iter f+b : {slope(iter_fb, (g_s,)):7.2f} ms", flush=True)
    print(f"topk_s eigh fwd : "
          f"{slope(lambda g: _eigh_desc(g)[1][..., :k], (g_s,)):7.2f} ms",
          flush=True)
    print(f"topk_s eigh f+b : {slope(eigh_fb, (g_s,)):7.2f} ms", flush=True)

    basis_t, svals_t = jax.jit(partial(topk_basis, k=k))(z_t)
    basis_s, _ = jax.jit(partial(topk_basis, k=k))(z_s)
    ranks = jnp.clip(jax.jit(marchenko_pastur_rank)(z_t), 1, k)

    def angles(bs):
        return masked_principal_angle_distance(
            bs[:, None], basis_t[None], svals_t[None], ranks[None]
        )

    print(f"angles  : {slope(angles, (basis_s,)):7.2f} ms", flush=True)

    def angles_g(bs):
        return jax.grad(lambda x: jnp.sum(angles(x)))(bs)

    print(f"angles_g: {slope(angles_g, (basis_s,)):7.2f} ms", flush=True)

    def select(st, tt, ti):
        return select_and_mix(sel, st, tt, ti, subspace_k=k)[0]

    print(f"select  : {slope(select, (s_tokens, t_tokens, t_imp)):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
