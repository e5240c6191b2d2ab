"""Empirical sweep/iteration tuner for the spectral kernels on real TPU.

Measures, with the chained-slope methodology (docs/DESIGN.md section 3 —
only device->host value fetches synchronize on this transport):

  1. pallas_jacobi_eigvals (MP-rank path, (L, 192, 192)) across sweep counts:
     time + MP-rank parity vs LAPACK on realistic token Grams.
  2. pallas_jacobi_eigh (angle-spectra path, (P*L, K, K)) across sweep
     counts: time + principal-angle-distance error vs LAPACK.
  3. topk_basis (g_iters, polar_iters) grid: time + subspace principal-angle
     error vs the exact LAPACK basis.

Realistic inputs: token features from the actual teacher/student forwards on
the bench workload (random-uint8 images through dinov2_vitb14 /
vit_tiny_patch4), NOT iid Gaussians — Gram spectra of real tokens are far
more anisotropic and that is what convergence depends on.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.losses import extraction_points, init_selector
from basd_tpu.models import create_student, load_teacher
from basd_tpu.models.teacher import extract_intermediates
from basd_tpu.ops.preprocess import dual_view


def slope_time(f, x, n1=5, n2=45):
    """Chained-slope ms/call: f must return an array the same shape as x[0]
    perturbation source; we chain by adding a tiny function-dependent term."""
    @jax.jit
    def chained(x, iters):
        def body(_, x):
            out = f(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return x + (jnp.sum(leaf) * 0.0).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    def run(iters):
        t0 = time.perf_counter()
        r = chained(x, iters)
        float(jnp.sum(r))  # value fetch = sync
        return time.perf_counter() - t0

    run(2)  # compile+warm
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    img_size, batch = 32, 128
    teacher = load_teacher("dinov2_vitb14", img_size=img_size, dtype=jnp.bfloat16)
    points = extraction_points(12, 4)
    student, cfg = create_student(
        "vit_tiny_patch16", num_classes=100, drop_path_rate=0.0,
        img_size=img_size, arch_overrides={"patch_size": 4},
        capture_layers=points, dtype=jnp.bfloat16, remat=False,
    )
    selector = init_selector(
        jax.random.PRNGKey(1), len(points), cfg.embed_dim, teacher.spec.embed_dim
    )
    variables = jax.jit(lambda r, x: student.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3))
    )
    rng = np.random.default_rng(0)
    u8 = jnp.asarray((rng.random((batch, 40, 40, 3)) * 255).astype(np.uint8))
    clean, aug = jax.jit(partial(
        dual_view, img_size=img_size, crop_ratio=0.8,
        teacher_stats=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        dataset_stats=((0.5,) * 3, (0.25,) * 3),
    ))(u8, jax.random.PRNGKey(0))

    t_tokens, t_imp = jax.jit(
        lambda v, x: extract_intermediates(teacher._replace(variables=v), x)
    )(teacher.variables, clean)
    s_out = jax.jit(
        lambda p, x: student.apply({"params": p}, x, train=False)
    )(variables["params"], aug)
    s_tokens = s_out.tokens

    l, _, n_t, d_t = t_tokens.shape
    p, _, n_s, d_s = s_tokens.shape
    print(f"teacher tokens {t_tokens.shape}  student tokens {s_tokens.shape}")

    # ---- realistic projected features (what the selector actually sees) ----
    t_flat = t_tokens.astype(jnp.float32).reshape(l, -1, d_t)
    z_t = jnp.einsum("lmd,ed->lme", t_flat, selector.proj_t)
    s_flat = s_tokens.astype(jnp.float32).reshape(p, -1, d_s)
    z_s = jnp.einsum("pmd,ed->pme", s_flat, selector.proj_s)
    m = z_t.shape[1]
    cov = jnp.einsum("lmd,lme->lde", z_t, z_t,
                     precision=jax.lax.Precision.HIGHEST) / m
    cov = np.asarray(cov)

    # ---- exact LAPACK answers on host ----
    w_exact = np.linalg.eigvalsh(cov)
    d = cov.shape[-1]
    sigma2 = np.median(w_exact, axis=-1)
    lam_plus = sigma2 * (1 + (d / m) ** 0.5) ** 2
    rank_exact = (w_exact > lam_plus[:, None]).sum(-1)
    print(f"exact MP ranks: {rank_exact}")

    from basd_tpu.spectral.pallas_jacobi import (
        pallas_jacobi_eigh,
        pallas_jacobi_eigvals,
    )

    cov_dev = jnp.asarray(cov)
    print("\n== pallas_jacobi_eigvals (MP path, shape", cov.shape, ") ==")
    for sweeps in (3, 4, 5, 6, 7, 9):
        f = partial(pallas_jacobi_eigvals, sweeps=sweeps)
        w = np.asarray(f(cov_dev))
        s2 = np.median(w, axis=-1)
        lp = s2 * (1 + (d / m) ** 0.5) ** 2
        rank = (w > lp[:, None]).sum(-1)
        relerr = np.max(np.abs(w - w_exact) / np.abs(w_exact).max(-1, keepdims=True))
        t = slope_time(f, cov_dev)
        ok = "OK " if (rank == rank_exact).all() else "DIFF"
        print(f"sweeps={sweeps}  {t:7.3f} ms  max-relerr={relerr:.2e} ranks {ok} {rank}")

    # ---- angle-path eigh: Gram of masked cross bases (K x K) ----
    from basd_tpu.spectral.ops import topk_basis

    k = 96
    basis_t, svals_t = topk_basis(z_t, k)
    basis_s, _ = topk_basis(z_s, k)
    ranks = jnp.clip(jnp.asarray(rank_exact), 1, k)
    mask = (jnp.arange(k)[None, :] < ranks[:, None]).astype(jnp.float32)
    cross = jnp.einsum("pdi,ldj->plij", basis_s, basis_t,
                       precision=jax.lax.Precision.HIGHEST)
    cross = cross * mask[None, :, None, :]
    gram_c = jnp.einsum("plij,plkj->plik", cross, cross,
                        precision=jax.lax.Precision.HIGHEST)
    gram_np = np.asarray(gram_c).reshape(-1, k, k)
    w_c_exact = np.linalg.eigvalsh(gram_np)[:, ::-1]
    sig_exact = np.sqrt(np.clip(w_c_exact, 0, None))
    th_exact = np.arccos(np.clip(sig_exact, None, 1 - np.finfo(np.float32).eps))
    sw = np.asarray(svals_t * mask)  # (L, K)
    sw_rep = np.tile(sw, (p, 1))
    d2_exact = (sw_rep * th_exact**2).sum(-1) / sw_rep.sum(-1)

    gram_dev = jnp.asarray(gram_np)
    print("\n== pallas_jacobi_eigh (angle path, shape", gram_np.shape, ") ==")
    for sweeps in (4, 5, 6, 7, 9):
        f = partial(pallas_jacobi_eigh, sweeps=sweeps)
        w, _ = f(gram_dev)
        sig = np.sqrt(np.clip(np.asarray(w), 0, None))
        th = np.arccos(np.clip(sig, None, 1 - np.finfo(np.float32).eps))
        d2 = (sw_rep * th**2).sum(-1) / sw_rep.sum(-1)
        err = np.max(np.abs(d2 - d2_exact))
        t = slope_time(lambda a, f=f: f(a)[0], gram_dev)
        print(f"sweeps={sweeps}  {t:7.3f} ms  max-d2-err={err:.2e}")

    # ---- topk_basis grid ----
    # exactness metric: weighted principal-angle distance computed with the
    # candidate basis vs with the exact LAPACK top-k basis
    z_t_np = np.asarray(z_t)
    zc = z_t_np - z_t_np.mean(1, keepdims=True)
    g_full = np.einsum("lmd,lme->lde", zc, zc)
    w_g, v_g = np.linalg.eigh(g_full)
    basis_exact = v_g[..., ::-1][..., :k]
    svals_exact = np.sqrt(np.clip(w_g[..., ::-1][..., :k], 0, None))

    print("\n== topk_basis (teacher side, shape", z_t.shape, "k =", k, ") ==")
    for g_iters, polar_iters in ((3, 6), (4, 6), (4, 8), (4, 10), (5, 8),
                                 (6, 8), (6, 10), (6, 14)):
        f = partial(topk_basis, k=k, g_iters=g_iters, polar_iters=polar_iters)
        b_c, s_c = f(z_t)
        b_c = np.asarray(b_c)
        # subspace principal-angle error weighted by exact svals: project the
        # exact basis onto the candidate subspace
        proj = np.einsum("ldi,ldj->lij", b_c, basis_exact)
        sines2 = 1 - np.clip((proj**2).sum(1), 0, 1)  # per exact-direction
        werr = float(((svals_exact**2 * sines2).sum(-1)
                      / (svals_exact**2).sum(-1)).max())
        serr = float(np.max(np.abs(np.asarray(s_c) - svals_exact)
                            / svals_exact[:, :1]))
        t = slope_time(lambda z, f=f: f(z)[0], z_t)
        print(f"g_iters={g_iters} polar={polar_iters:2d}  {t:7.3f} ms  "
              f"weighted-sin2-err={werr:.2e} sval-relerr={serr:.2e}")


if __name__ == "__main__":
    main()
