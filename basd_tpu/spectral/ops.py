"""TPU-native spectral primitives: the compute core of the framework.

Re-designs the reference's ~80 host-dispatched `torch.linalg` calls per step
(SURVEY.md section 3.2; reference `src/losses/layer_selector.py`,
`src/losses/relational.py:48`) as batched, static-shape, jit-compatible XLA
ops built around one idea: **every SVD-class quantity is derived from a
symmetric eigendecomposition of a Gram matrix.** The Gram reductions
(D x M)@(M x D) are large MXU matmuls, and the eigh operates on small D x D
matrices that batch across teacher layers / extraction points — instead of
tall-skinny SVDs that XLA lowers poorly on TPU.

Static shapes: Marchenko-Pastur ranks are data-dependent, so instead of the
reference's dynamic top-k slicing (`layer_selector.py:97`), subspaces keep
all D basis vectors and a *rank mask* zeroes spectral weights beyond the MP
rank. Padding the principal-angle spectrum with zeros is exact: the masked
cross-basis matrix's nonzero singular values equal those of the top-k block,
the extra zeros pair with zero spectral weights, and the weighted distance is
unchanged (verified against the dynamic-shape oracle in
`basd_tpu/spectral/reference.py`).

Differentiability: gradients flow through the student-side eigenbasis and
through the principal-angle / nuclear-norm spectra exactly as in the
reference (the Procrustes nuclear norm sits in the autograd graph,
`relational.py:47-48`). `svdvals_psd` and `nuclear_norm` carry custom VJPs
using the well-defined subgradient  d sigma_j = u_j^T dA v_j,  which stays
finite for repeated/zero singular values where the generic SVD JVP blows up.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as _P

_F32 = jnp.float32
# TPU fp32 einsums default to single-pass bf16 on the MXU; the Newton-
# Schulz iterations and Gram spectra need true fp32 arithmetic (the coupled
# sqrt iteration amplifies bf16 rounding into divergence/NaN).
_HI = jax.lax.Precision.HIGHEST
# Data-side matmuls (token projections, Gram/cov builds over M >> D
# samples): bf16x3 (~TF32 mantissa coverage). STRICTLY more precise than
# the reference's own contract — its projections/Grams run as bf16 matmuls
# under torch autocast (`trainer.py:140` wraps the selector; torch.matmul
# is on the bf16 autocast list even for .float() inputs) — at half the
# MXU passes of HIGHEST (measured: the z_t projection + Gram builds were
# ~2/3 of the Table-1 selector forward). Small-matrix spectral math
# (eigh, Newton-Schulz, principal angles) stays HIGHEST: NS convergence
# and eigh JVP stability genuinely need full fp32 there.
_DATA = jax.lax.Precision.HIGH
# Nuclear-norm square-root path (scheduled quintic + its Grams):
# bf16x3. The old 18-step cubic NS diverged at HIGH (rounding
# compounds through the coupled recurrence), but the 7-step minimax
# schedule holds 8e-5 relative value error at HIGH vs 1.8e-6 at
# HIGHEST and runs ~7x faster (tools/probe_ns_precision.py, b=64
# decaying-spectrum cond-1e6 inputs vs float64 SVD) -- far below
# the distillation loss's meaningful precision.
_NS = jax.lax.Precision.HIGH

# Ambient mesh for Pallas dispatch under multi-device programs. A Pallas
# kernel inside a GSPMD-partitioned jit must live in a manual (shard_map)
# island; the selector's Gram spectra are replicated after the global-batch
# psum, so the island runs the kernel fully replicated on every device
# (in_specs = out_specs = P()). Set by `spectral_mesh(...)` around train-step
# tracing (basd_tpu.training.train_step wires it from the Trainer's mesh).
_SPECTRAL_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "basd_spectral_mesh", default=None
)


@contextlib.contextmanager
def spectral_mesh(mesh):
    """Scope the ambient device mesh for Pallas kernel dispatch (trace time)."""
    token = _SPECTRAL_MESH.set(mesh)
    try:
        yield
    finally:
        _SPECTRAL_MESH.reset(token)


def _pallas_interpret() -> bool:
    """Interpret-mode escape hatch: lets the CPU test mesh exercise the real
    multi-device dispatch path (shard_map island + kernel math) where Mosaic
    cannot compile."""
    return bool(os.environ.get("BASD_TPU_PALLAS_INTERPRET"))


def _replicated_island(fn):
    """Wrap `fn` in a fully-replicated shard_map island when tracing under a
    multi-device mesh, so Pallas custom calls never meet GSPMD partitioning.
    Every device computes the identical small-matrix spectra — the same cost
    as single-chip, and exact because the inputs are already replicated
    (global-batch Grams)."""
    mesh = _SPECTRAL_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fn
    return jax.shard_map(
        fn, mesh=mesh, in_specs=_P(), out_specs=_P(), check_vma=False
    )


def _batch_island(fn):
    """Wrap `fn` in a BATCH-sharded shard_map island when tracing under a
    multi-device mesh — for Pallas kernels over per-sample (B, ...) data
    (the token-side Gram pairs are data-sharded, unlike the replicated
    selector spectra)."""
    mesh = _SPECTRAL_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fn
    data = "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1 \
        else None
    spec = _P(data, None, None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec), out_specs=(_P(data), spec),
        check_vma=False,
    )


def _use_pallas_jacobi(shape: tuple[int, ...]) -> bool:
    """Dispatch policy for the batched Jacobi eigensolver: XLA's TPU eigh
    serializes over the batch (~1.1 ms per 192x192 matrix measured), while
    the VMEM-resident Pallas kernel solves the whole batch in parallel
    (2.4x faster at (48, 96, 96)). CPU and oversized batches fall back to
    LAPACK/XLA. Multi-device meshes route through a replicated shard_map
    island (`_replicated_island`) instead of being disabled.

    The n <= 96 cap is an ACCURACY boundary, not (only) a perf one: the
    kernel runs a fixed sweeps=6 cyclic schedule whose fp32-floor
    convergence is measured at n <= 96 (tools/tune_spectral.py, real token
    Grams), while at n = 192 it is demonstrably under-converged —
    eig_err ~1e-3, weighted-principal-angle d2_err ~2e-3 vs the 1.3e-4
    LAPACK64 floor reached at sweeps >= 9 (tools/probe_jacobi_sweeps.py,
    v5e, 2026-08-19). Raising sweeps is strictly worse than XLA's eigh
    there: the kernel is bound by the serial (n-1)*sweeps rotation-trip
    chain (~43 us/trip, flat across grid/chunk), so sweeps=9 costs ~+13 ms
    while the XLA flip measured FASTER in the full Table-1 step (364.1 vs
    370.5 ms, loss drift 1e-3 — in-context step-ablation A/B at HEAD,
    BASD_TPU_JACOBI=xla, 2026-08-19). Above the cap LAPACK-grade accuracy
    and in-context speed point the same way."""
    if os.environ.get("BASD_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("BASD_TPU_JACOBI") == "xla":  # per-kernel escape hatch
        return False
    try:
        if jax.default_backend() == "cpu" and not _pallas_interpret():
            return False
    except RuntimeError:  # pragma: no cover
        return False
    n = shape[-1]
    b = 1
    for d in shape[:-2]:
        b *= d
    # large batches are chunked over the pallas grid; n is capped at the
    # measured sweeps=6 fp32-floor boundary (docstring above). Production
    # shapes: t3 angles K=48 / t2 K=72 / svdvals m=65 stay Pallas; t1/vitl
    # angles K=192/184 and 197-token svdvals Grams go to XLA eigh.
    return 16 <= n <= 96 and b >= 4


@jax.custom_jvp
def _eigh_safe(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """eigh with a gap-regularized JVP (ascending eigenvalues, like
    jnp.linalg.eigh).

    Forward: the batch-parallel Pallas Jacobi kernel on TPU (see
    `basd_tpu.spectral.pallas_jacobi`), XLA/LAPACK eigh elsewhere.

    JVP: the stock eigh JVP divides eigenvector tangents by eigenvalue
    gaps, which blows up to NaN on the (physically meaningless, rotation-
    arbitrary) near-degenerate noise tail of token Gram spectra — and the
    student-side basis IS differentiated (reference gradient contract).
    Regularizing F_ij = gap / (gap^2 + eps^2) keeps gradients finite while
    matching the exact JVP wherever gaps are resolved."""
    if _use_pallas_jacobi(a.shape):
        from basd_tpu.spectral.pallas_jacobi import pallas_jacobi_eigh

        # sweeps=6: measured convergence plateau on real token Grams AT THE
        # DISPATCHED SIZES (n <= 96) — principal-angle distances match
        # sweeps=9 to ~2e-6 and eigenvalue error sits at the fp32 floor
        # (tools/tune_spectral.py, v5e: 4.6 ms vs 7.0 ms at (48, 96, 96)).
        # Larger n is under-converged at 6 sweeps and is routed to XLA by
        # `_use_pallas_jacobi` (see its docstring for the n=192 evidence).
        solver = _replicated_island(
            partial(pallas_jacobi_eigh, sweeps=6, interpret=_pallas_interpret())
        )
        w, v = solver(a)  # descending
        return w[..., ::-1], v[..., ::-1]
    return jnp.linalg.eigh(a)


@_eigh_safe.defjvp
def _eigh_safe_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    w, v = _eigh_safe(a)
    da_sym = (da + jnp.swapaxes(da, -1, -2)) * 0.5
    vt_da_v = jnp.einsum(
        "...ji,...jk,...kl->...il", v, da_sym, v, preferred_element_type=_F32, precision=_HI
    )
    dw = jnp.diagonal(vt_da_v, axis1=-2, axis2=-1)
    gap = w[..., None, :] - w[..., :, None]  # gap[i, j] = w_j - w_i
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True)[..., None]
    eps = 1e-6 * jnp.maximum(scale, 1e-30)
    f = gap / (gap * gap + eps * eps)
    d = w.shape[-1]
    f = f * (1.0 - jnp.eye(d, dtype=a.dtype))
    dv = jnp.einsum(
        "...ik,...kj->...ij", v, f * vt_da_v, preferred_element_type=_F32, precision=_HI
    )
    return (w, v), (dw, dv)


def _eigh_desc(gram: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric eigendecomposition, eigenvalues descending.

    Returns (eigvals (..., d), eigvecs (..., d, d)) with eigvecs[..., :, i]
    the i-th eigenvector.
    """
    gram = (gram + jnp.swapaxes(gram, -1, -2)) * 0.5
    w, v = _eigh_safe(gram)
    return w[..., ::-1], v[..., ::-1]


def centered_gram(z: jax.Array) -> jax.Array:
    """(..., M, D) -> (..., D, D) fp32 Gram of the column-centered matrix."""
    z = z.astype(_F32)
    zc = z - jnp.mean(z, axis=-2, keepdims=True)
    return jnp.einsum("...md,...me->...de", zc, zc, preferred_element_type=_F32, precision=_DATA)


def grassmann_basis(z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full right-singular basis + singular values of the centered matrix.

    Reference `_grassmann_subspace` (`layer_selector.py:23-37`) returns the
    top-k slice; here we return all D directions (descending) and let the
    caller apply a rank mask. basis[..., :, i] is the i-th principal
    direction; svals are the singular values of the centered z (not /M).
    """
    eigvals, basis = _eigh_desc(centered_gram(z))
    svals = jnp.sqrt(jnp.clip(eigvals, 0.0, None))
    return basis, svals


def marchenko_pastur_rank(x: jax.Array) -> jax.Array:
    """MP threshold rank of (..., M, D) features, as a traced int32.

    cov = X^T X / M; sigma^2 = median eigenvalue;
    lambda_+ = sigma^2 (1 + sqrt(D/M))^2; rank = #{eig > lambda_+}.
    (Reference `marchenko_pastur_rank`, `layer_selector.py:8-20`. The jit
    path always uses the D x D Gram — in the training hot loop M = B*N >> D;
    the numpy oracle also covers the M < D branch for host-side use.)
    """
    m = x.shape[-2]
    x = x.astype(_F32)
    gram = jnp.einsum("...md,...me->...de", x, x, preferred_element_type=_F32, precision=_DATA)
    return marchenko_pastur_rank_gram(gram, m)


def marchenko_pastur_rank_gram(gram: jax.Array, m: int) -> jax.Array:
    """`marchenko_pastur_rank` from a precomputed UNCENTERED Gram
    X^T X (..., D, D) of M samples — lets the selector share one Gram
    reduction between the MP ranks and the subspace extraction (the Gram
    build over M = B*N samples dominates both)."""
    d = gram.shape[-1]
    cov = gram.astype(_F32) / m
    cov = (cov + jnp.swapaxes(cov, -1, -2)) * 0.5
    if d >= 8:
        # Householder tridiagonalization + Sturm bisection: the rank needs
        # only the median eigenvalue and one count, never the spectrum.
        # Replaces the Pallas Jacobi eigvals dispatch (measured on v5e:
        # 5.7 -> 1.1 ms at (12, 192, 192), 34 -> 3.6 ms at (12, 384, 384);
        # identical ranks to LAPACK on planted-rank and token-Gram suites).
        from basd_tpu.spectral.tridiag import mp_rank_sturm

        return mp_rank_sturm(cov, m)
    eigvals = jnp.linalg.eigvalsh(cov)
    sigma2 = jnp.median(eigvals, axis=-1)
    q = d / m
    lambda_plus = sigma2 * (1.0 + q**0.5) ** 2
    return jnp.sum(eigvals > lambda_plus[..., None], axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Singular values with a subgradient-safe custom VJP
# ---------------------------------------------------------------------------


def _svdvals_fwd_math(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """sigma (desc) and left-singular basis U of (..., m, n) with m <= n."""
    gram = jnp.einsum("...ij,...kj->...ik", a, a, preferred_element_type=_F32, precision=_HI)
    eigvals, u = _eigh_desc(gram)
    sigma = jnp.sqrt(jnp.clip(eigvals, 0.0, None))
    return sigma, u


@jax.custom_vjp
def _svdvals_m_le_n(a: jax.Array) -> jax.Array:
    return _svdvals_fwd_math(a)[0]


def _svdvals_fwd(a):
    sigma, u = _svdvals_fwd_math(a)
    return sigma, (a, sigma, u)


def _svdvals_bwd(res, g):
    a, sigma, u = res
    # d sigma_j = u_j^T dA v_j with v_j = A^T u_j / sigma_j
    # => grad_A = U diag(g / sigma) U^T A   (zero coefficient where sigma ~ 0
    # is a valid subgradient choice and keeps gradients finite).
    scale = jnp.max(sigma, axis=-1, keepdims=True)
    safe = sigma > (1e-6 * jnp.maximum(scale, 1e-30))
    coef = jnp.where(safe, g / jnp.where(safe, sigma, 1.0), 0.0)
    grad = jnp.einsum(
        "...ik,...k,...jk,...jn->...in", u, coef, u, a,
        preferred_element_type=_F32, precision=_HI,
    )
    return (grad.astype(a.dtype),)


_svdvals_m_le_n.defvjp(_svdvals_fwd, _svdvals_bwd)


def svdvals_psd(a: jax.Array) -> jax.Array:
    """Singular values (descending) of (..., m, n) via eigh of the Gram.

    Named for the mechanism: the spectrum is recovered from the PSD Gram
    matrix of the smaller side. Replaces `torch.linalg.svdvals`
    (`layer_selector.py:99`) with an MXU matmul + batched d x d eigh, and is
    differentiable everywhere via the subgradient VJP above.
    """
    m, n = a.shape[-2], a.shape[-1]
    if m <= n:
        return _svdvals_m_le_n(a)
    return _svdvals_m_le_n(jnp.swapaxes(a, -1, -2))


@jax.custom_vjp
def nuclear_norm(c: jax.Array) -> jax.Array:
    """Nuclear norm of (..., m, n): sum of singular values.

    Replaces `torch.linalg.matrix_norm(ord="nuc")` in the Procrustes loss
    (`relational.py:48`). Differentiable with grad = U V^T computed from the
    small-side eigendecomposition; near-zero singular values get a zero
    subgradient (|grad| <= 1 remains valid).
    """
    m, n = c.shape[-2], c.shape[-1]
    a = c if m <= n else jnp.swapaxes(c, -1, -2)
    sigma, _ = _svdvals_fwd_math(a)
    return jnp.sum(sigma, axis=-1)


def _nuc_fwd(c):
    m, n = c.shape[-2], c.shape[-1]
    transposed = m > n
    a = c if not transposed else jnp.swapaxes(c, -1, -2)
    sigma, u = _svdvals_fwd_math(a)
    return jnp.sum(sigma, axis=-1), (a, sigma, u, transposed)


def _nuc_bwd(res, g):
    a, sigma, u, transposed = res
    scale = jnp.max(sigma, axis=-1, keepdims=True)
    safe = sigma > (1e-6 * jnp.maximum(scale, 1e-30))
    coef = jnp.where(safe, 1.0 / jnp.where(safe, sigma, 1.0), 0.0)
    grad = jnp.einsum(
        "...ik,...k,...jk,...jn->...in", u, coef, u, a,
        preferred_element_type=_F32, precision=_HI,
    )
    grad = grad * g[..., None, None]
    if transposed:
        grad = jnp.swapaxes(grad, -1, -2)
    return (grad,)


nuclear_norm.defvjp(_nuc_fwd, _nuc_bwd)


# ---------------------------------------------------------------------------
# Newton-Schulz polar nuclear norm: matmuls only (MXU speed-of-light path)
# ---------------------------------------------------------------------------


def _polar_newton_schulz(c: jax.Array, iters: int) -> jax.Array:
    """Polar factor U V^T of (..., m, n) via Newton-Schulz iteration
    X <- 1.5 X - 0.5 X X^T X, converging for ||X||_2 < sqrt(3). Scaling by
    the Frobenius norm (>= spectral norm) guarantees the domain."""
    scale = jnp.sqrt(jnp.sum(c * c, axis=(-2, -1), keepdims=True))
    x = c / jnp.maximum(scale, jnp.finfo(_F32).tiny)
    for _ in range(iters):
        xxt_x = jnp.einsum(
            "...ij,...kj,...kl->...il", x, x, x, preferred_element_type=_F32, precision=_HI
        )
        x = 1.5 * x - 0.5 * xxt_x
    return x


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def nuclear_norm_ns(c: jax.Array, iters: int = 24) -> jax.Array:
    """Nuclear norm via the polar decomposition: ||C||_nuc = tr(P^T C) with
    P = polar(C), computed by Newton-Schulz — batched matmuls instead of an
    eigendecomposition, and d||C||_nuc/dC = P exactly, so the backward pass
    is free. This is the production path for the Procrustes loss
    (`basd_tpu.losses.procrustes`); `nuclear_norm` (eigh-based) remains the
    high-accuracy oracle. Accuracy ~1e-3 relative at 24 iterations, well
    below the loss's meaningful scale; for singular values at the scaled
    Newton-Schulz fixed point's flat region the value is a lower bound,
    which subgradient-wise matches the reference's SVD nuclear norm."""
    p = _polar_newton_schulz(c.astype(_F32), iters)
    return jnp.sum(p * c.astype(_F32), axis=(-2, -1))


def _nuc_ns_fwd(c, iters):
    p = _polar_newton_schulz(c.astype(_F32), iters)
    return jnp.sum(p * c.astype(_F32), axis=(-2, -1)), p


def _nuc_ns_bwd(iters, p, g):
    return (g[..., None, None] * p,)


nuclear_norm_ns.defvjp(_nuc_ns_fwd, _nuc_ns_bwd)


# ---------------------------------------------------------------------------
# Gram-side Newton-Schulz matrix square root: the fastest nuclear-norm path
# ---------------------------------------------------------------------------


# Minimax-composite quintic schedule for the coupled square-root
# iteration. The coupled (Y, Z) recurrence with step polynomial t(m),
# m = Z Y, acts spectrally as m' = m t(m)^2, so driving m -> 1 uniformly
# over the scaled spectrum [l0, 1] is exactly the convergence target
# (Y -> A^1/2, Z -> A^-1/2). Each tuple (a, b, c) below is the
# Nelder-Mead minimax solution of min max_{x in [l_k, u_k]}
# |1 - x (a + b x + c x^2)^2| for the greedy interval recursion starting
# at [1e-6, 1] — 7 quintic steps (4 matmuls each) replace the former 18
# cubic Newton-Schulz steps (3 matmuls each) at BETTER accuracy:
# converged |m - 1| < 2e-6 over the whole range, and max_x m(x) =
# 1.000003 over [0, 1], so the gradient's singular values stay <= 1 and
# the truncated iteration remains a valid nuclear-norm subgradient at
# every eigenvalue (same property the cubic iteration had). REQUIRES
# spectrum <= 1 strictly: callers scale by the Frobenius norm (>= the
# spectral radius for any matrix, and within sqrt(effective rank) of it,
# i.e. a far tighter normalization than the former trace scaling).
_NS_SQRT_SCHED = (
    (4.06041646, -5.30951808, 1.25316204),
    (3.51498112, -3.86445249, 1.06537910),
    (4.23379091, -6.27637272, 2.46647544),
    (3.87655076, -5.38737805, 1.97364126),
    (3.17457979, -3.56278794, 1.22570700),
    (2.03625467, -1.50239009, 0.46322166),
    (1.87507961, -1.24997583, 0.37489627),
)


def _ns_sqrt_pair(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Coupled scheduled-quintic iteration (Y, Z) -> (A^1/2, A^-1/2) for A
    with real nonnegative spectrum and spectral radius <= 1 (PSD, or a
    product of PSD factors — similar to PSD). Pure batched d x d matmuls
    at `_NS` (= Precision.HIGH, bf16x3): the module-level precision note
    and tools/probe_ns_precision.py validate a ~8e-5 relative error floor
    for the coupled quintic recurrence at HIGH, and the Procrustes loss
    tolerates it (the cubic-iteration HIGHEST caveat is obsolete)."""
    d = a.shape[-1]
    eye = jnp.eye(d, dtype=a.dtype)
    mm = lambda p, q: jnp.einsum("...ij,...jk->...ik", p, q,
                                 preferred_element_type=_F32, precision=_NS)
    y, z = a, jnp.broadcast_to(eye, a.shape)
    for ca, cb, cc in _NS_SQRT_SCHED:
        m = mm(z, y)
        t = ca * eye + cb * m + cc * mm(m, m)
        y = mm(y, t)
        z = mm(t, z)
    return y, z


def _frob(w: jax.Array) -> jax.Array:
    """Frobenius norm (..., 1, 1), clamped away from zero — the square-
    root iteration's scale: ||W||_F >= rho(W) for ANY matrix."""
    s = jnp.sqrt(jnp.sum(w * w, axis=(-2, -1), keepdims=True))
    return jnp.maximum(s, jnp.finfo(_F32).tiny)


@jax.custom_vjp
def nuclear_norm_gram(c: jax.Array) -> jax.Array:
    """||C||_nuc = tr((C C^T)^1/2) via Newton-Schulz on the SMALL-side Gram.

    The fastest TPU formulation found for the Procrustes loss: one Gram
    matmul + `iters` rounds of three (d_min x d_min) batched matmuls —
    ~5x fewer FLOPs and far less HBM traffic than Newton-Schulz polar on
    the full rectangular C, and the coupled iteration yields A^-1/2 as a
    byproduct, so the exact subgradient  d||C||_nuc/dC = (CC^T)^-1/2 C
    (the polar factor) is one extra matmul in backward.

    Scaling by ||H||_F puts every eigenvalue of A = H/||H||_F in (0, 1];
    in eigenvalue coordinates the scheduled iteration satisfies
    y_k z_k = m_k, y_k/z_k = x (invariant), with m_k -> 1 and
    max_x m_k(x) = 1.000003, so the value estimate sum_i sqrt(m_i) sigma_i
    bounds the nuclear norm from below (to 3e-6) and the gradient's
    singular values sqrt(m_i) <= 1 keep it a valid subgradient at every
    eigenvalue — no epsilon needed (see `_NS_SQRT_SCHED`)."""
    value, _ = _nuc_gram_fwd(c)
    return value


def _nuc_gram_fwd(c):
    m, n = c.shape[-2], c.shape[-1]
    a_side = c if m <= n else jnp.swapaxes(c, -1, -2)
    cf = a_side.astype(_F32)
    h = jnp.einsum("...ij,...kj->...ik", cf, cf, preferred_element_type=_F32, precision=_NS)
    s = _frob(h)
    y, z = _ns_sqrt_pair(h / s)
    value = jnp.sqrt(s[..., 0, 0]) * jnp.trace(y, axis1=-2, axis2=-1)
    # polar subgradient P = H^-1/2 C = (Z @ C) / sqrt(s)
    grad = jnp.einsum(
        "...ij,...jk->...ik", z, cf, preferred_element_type=_F32, precision=_NS
    ) / jnp.sqrt(s)
    if m > n:
        grad = jnp.swapaxes(grad, -1, -2)
    return value, grad.astype(c.dtype)


def _nuc_gram_bwd(grad, g):
    return (g[..., None, None] * grad,)


nuclear_norm_gram.defvjp(_nuc_gram_fwd, _nuc_gram_bwd)


# ---------------------------------------------------------------------------
# Token-side pair nuclear norm: ||S^T T||_nuc on the smallest dimension
# ---------------------------------------------------------------------------


@jax.custom_vjp
def nuclear_norm_pair_gram(g_s: jax.Array, g_t: jax.Array) -> jax.Array:
    """tr((G_t G_s)^1/2) = ||S^T T||_nuc from the TOKEN-side Grams
    G_s = S S^T, G_t = T T^T (..., N, N).

    The Gram-space entrypoint lets callers that derive weighted/centered
    Grams by (N, N)-sized algebra (diag scalings, rank-1 mean
    corrections — see `losses.procrustes`) skip materializing the
    weighted (N, D) feature tensors entirely. Custom VJP:

        dL/dG_s = 1/2 G_t Z^T,   dL/dG_t = 1/2 Z^T G_s,  Z ~ W^-1/2,

    which composes with the Gram-build einsum VJP to exactly the
    feature-side polar subgradient (intertwining f(AB) A = A f(BA))."""
    value, _ = _nuc_pg_fwd(g_s, g_t)
    return value


def _nuc_pg_fwd(g_s, g_t):
    # Round-5 hardware adjudication: the fused NS-pair kernel
    # (spectral/ns_sqrt_kernel.py) tripped a Mosaic compiler abort
    # (inferReshape layout check) at real shapes and was deleted per the
    # flip-or-delete rule (docs/DESIGN.md section 9) - the scheduled XLA
    # iteration below IS the shipping path.
    gs = g_s.astype(_F32)
    gt = g_t.astype(_F32)
    w = jnp.einsum("...nm,...mk->...nk", gt, gs,
                   preferred_element_type=_F32, precision=_NS)
    scale = _frob(w)
    y, z = _ns_sqrt_pair(w / scale)
    value = jnp.sqrt(scale[..., 0, 0]) * jnp.trace(y, axis1=-2, axis2=-1)
    return value, (gs, gt, z / jnp.sqrt(scale))


def _nuc_pg_bwd(res, g):
    gs, gt, z = res
    g = g[..., None, None]
    zt = jnp.swapaxes(z, -1, -2)
    dgs = 0.5 * g * jnp.einsum("...nm,...mk->...nk", gt, zt,
                               preferred_element_type=_F32, precision=_NS)
    dgt = 0.5 * g * jnp.einsum("...nm,...mk->...nk", zt, gs,
                               preferred_element_type=_F32, precision=_NS)
    return dgs.astype(res[0].dtype), dgt.astype(res[1].dtype)


nuclear_norm_pair_gram.defvjp(_nuc_pg_fwd, _nuc_pg_bwd)


@jax.custom_vjp
def nuclear_norm_pair(s: jax.Array, t: jax.Array) -> jax.Array:
    """||S^T T||_nuc for S (..., N, D_s), T (..., N, D_t) — computed on the
    TOKEN side when N is the smallest dimension.

    Key identity: with H = S^T (T T^T) S and W = (T T^T)(S S^T),
    H^k S^T = S^T W^k, so tr((C C^T)^1/2) = tr(W^1/2) and the polar
    subgradient lives on the N x N side too:

        dL/dS = (T T^T) W^-T/2 S,    dL/dT = (S S^T) W^-1/2 T.

    For the BASD Procrustes loss (N ~ 64-196 tokens vs D_t = 768) this
    shrinks every Newton-Schulz matmul from (D_s x D_s) to (N x N) and
    never materializes the (D_s x D_t) cross-covariance. Gram builds and
    the iteration run bf16x3 HIGH: measured ~8e-5 relative error vs SVD
    (tools/probe_ns_precision.py), inside the loss's tolerance. Falls
    back to the Gram form via
    `nuclear_norm_gram` when N is not the smallest axis (handled by the
    caller). W is a product of two PSD Grams, hence similar to symmetric
    PSD — the scheduled square-root iteration applies unchanged."""
    value, _ = _nuc_pair_fwd(s, t)
    return value


def _nuc_pair_fwd(s, t):
    sf = s.astype(_F32)
    tf = t.astype(_F32)
    g_t = jnp.einsum("...nd,...md->...nm", tf, tf,
                     preferred_element_type=_F32, precision=_NS)
    g_s = jnp.einsum("...nd,...md->...nm", sf, sf,
                     preferred_element_type=_F32, precision=_NS)
    w = jnp.einsum("...nm,...mk->...nk", g_t, g_s,
                   preferred_element_type=_F32, precision=_NS)
    scale = _frob(w)
    y, z = _ns_sqrt_pair(w / scale)
    value = jnp.sqrt(scale[..., 0, 0]) * jnp.trace(y, axis1=-2, axis2=-1)
    z_scaled = z / jnp.sqrt(scale)  # ~ W^{-1/2}
    return value, (sf, tf, g_s, g_t, z_scaled)


def _nuc_pair_bwd(res, g):
    sf, tf, g_s, g_t, z = res
    g = g[..., None, None]
    ds = g * jnp.einsum(
        "...nm,...km,...kd->...nd", g_t, z, sf,
        preferred_element_type=_F32, precision=_NS,
    )  # G_T Z^T S
    dt = g * jnp.einsum(
        "...nm,...mk,...kd->...nd", g_s, z, tf,
        preferred_element_type=_F32, precision=_NS,
    )  # G_S Z T
    return ds.astype(sf.dtype), dt.astype(tf.dtype)


nuclear_norm_pair.defvjp(_nuc_pair_fwd, _nuc_pair_bwd)


# ---------------------------------------------------------------------------
# Top-k eigenbasis via subspace iteration (matmuls + one small eigh)
# ---------------------------------------------------------------------------


def _polar_orthonormalize(v: jax.Array, iters: int = 14) -> jax.Array:
    """orth(V) = V (V^T V)^-1/2 via Newton-Schulz polar on the tall matrix:
    X <- 1.5 X - 0.5 X (X^T X). Column-space preserving, all matmuls.

    bf16x3 matmuls (`_DATA`): this orthonormalization iteration is
    self-correcting — each step contracts toward the orthonormal manifold,
    so per-step rounding does not accumulate (unlike the COUPLED (Y, Z)
    Newton-Schulz pairs used for matrix square roots, which stay HIGHEST —
    their rounding compounds into divergence). Any residual
    non-orthonormality is absorbed by the final Rayleigh-Ritz. Measured:
    subspace accuracy unchanged (41 spectral + 27 selector-oracle tests);
    topk at Table-1 widths 22.3 -> 21.0 ms only — the 168-matmul chain is
    LATENCY-bound, not FLOP-bound, so cheaper passes barely help."""
    scale = jnp.sqrt(
        jnp.sum(v * v, axis=(-2, -1), keepdims=True)
    )
    x = v / jnp.maximum(scale, jnp.finfo(_F32).tiny)
    for _ in range(iters):
        gram = jnp.einsum("...di,...dj->...ij", x, x,
                          preferred_element_type=_F32, precision=_DATA)
        x = 1.5 * x - 0.5 * jnp.einsum(
            "...di,...ij->...dj", x, gram, preferred_element_type=_F32, precision=_DATA)
    return x


def topk_basis(
    z: jax.Array, k: int, *, g_iters: int = 6, polar_iters: int = 14
) -> tuple[jax.Array, jax.Array]:
    """Top-k right-singular basis + singular values of the centered matrix
    (..., M, D) — the K-capped, MXU-only replacement for `grassmann_basis`.

    XLA's TPU eigh runs ~1 ms per 192x192 matrix and serializes over the
    batch (measured), which made full-basis extraction the dominant step
    cost. Subspace iteration with Newton-Schulz polar orthonormalization is
    pure batched matmuls; one final k x k Rayleigh-Ritz eigh (cheap) orders
    the basis and recovers eigenvalues. Differentiable end-to-end (the
    student path needs gradients).

    The deterministic start V0 is a fixed numpy Gaussian (same for every
    call) so results are reproducible and jit-constant-foldable.
    """
    return topk_basis_gram(centered_gram(z), k, g_iters=g_iters,
                           polar_iters=polar_iters)


def topk_basis_gram_nograd(
    g: jax.Array, k: int, *, g_iters: int = 6, polar_iters: int = 14
) -> tuple[jax.Array, jax.Array]:
    """`topk_basis_gram` for GRADIENT-FREE callers (teacher statistics).

    Round-5 hardware adjudication: the forward-only fused
    subspace-iteration kernel won its isolated probe (15.0 vs 21.3 ms)
    but LOST in-context (Table-3 selector fwd 9.82 ms forced vs 9.67 ms
    auto - the selector's shared-Gram pipeline already hides the
    launch latency) and was deleted per the flip-or-delete rule
    (docs/DESIGN.md section 9); gradient-free callers share the
    differentiable iteration below.
    """
    return topk_basis_gram(g, k, g_iters=g_iters, polar_iters=polar_iters)


def topk_basis_gram(
    g: jax.Array, k: int, *, g_iters: int = 6, polar_iters: int = 14
) -> tuple[jax.Array, jax.Array]:
    """`topk_basis` from a precomputed CENTERED Gram (..., D, D) —
    the iteration core, exposed so callers that already hold a Gram
    (e.g. the selector's shared teacher/student Gram reductions) skip the
    (M, D) pass entirely."""
    d = g.shape[-1]
    v0 = np.asarray(
        np.random.default_rng(20_240_601).standard_normal((d, k)),
        np.float32,
    )
    v = jnp.broadcast_to(v0, (*g.shape[:-2], d, k))
    # scale-normalize G so powers stay in fp32 range
    gnorm = jnp.sqrt(jnp.sum(g * g, axis=(-2, -1), keepdims=True))
    gn = g / jnp.maximum(gnorm, jnp.finfo(_F32).tiny)
    for _ in range(g_iters):
        v = jnp.einsum("...de,...ek->...dk", gn, v,
                       preferred_element_type=_F32, precision=_DATA)
        v = _polar_orthonormalize(v, polar_iters)
    # Rayleigh-Ritz on the original-scale Gram
    r = jnp.einsum("...dk,...de,...el->...kl", v, g, v,
                   preferred_element_type=_F32, precision=_HI)
    eigvals, u = _eigh_desc(r)
    basis = jnp.einsum("...dk,...kl->...dl", v, u,
                       preferred_element_type=_F32, precision=_HI)
    svals = jnp.sqrt(jnp.clip(eigvals, 0.0, None))
    return basis, svals


# ---------------------------------------------------------------------------
# Masked principal angles
# ---------------------------------------------------------------------------


def masked_principal_angle_distance(
    basis_s: jax.Array,  # (..., Dp, D) student basis columns (grad flows)
    basis_t: jax.Array,  # (..., Dp, D) teacher basis columns (stop-grad'd)
    svals_t: jax.Array,  # (..., D) teacher singular values, descending
    rank: jax.Array,  # (...,) int32 MP ranks
) -> jax.Array:
    """Spectrally-weighted squared Grassmannian distance with rank masking.

    Exactly reproduces the reference's dynamic-k computation
    (`layer_selector.py:94-105`): pad-with-zeros beyond rank k pairs zero
    singular values with zero spectral weights, leaving the weighted mean of
    squared angles unchanged.
    """
    d = basis_s.shape[-1]
    idx = jnp.arange(d)
    mask = (idx[None, :] < rank[..., None]).astype(_F32)  # (..., D)

    cross = jnp.einsum(
        "...di,...dj->...ij", basis_s.astype(_F32), basis_t.astype(_F32),
        preferred_element_type=_F32, precision=_HI,
    )
    cross = cross * mask[..., :, None] * mask[..., None, :]
    sigma = svdvals_psd(cross)

    eps = jnp.finfo(_F32).eps
    theta = jnp.arccos(jnp.clip(sigma, None, 1.0 - eps))

    sw = svals_t * mask
    sw_sum = jnp.maximum(jnp.sum(sw, axis=-1), jnp.finfo(_F32).tiny)
    return jnp.sum(sw * theta**2, axis=-1) / sw_sum
