"""Spectrally-adaptive Grassmannian layer selector — fully batched, one jit.

The algorithmic core (reference `src/losses/layer_selector.py:40-152`),
re-designed for TPU: where the reference dispatches ~80 host-side
`torch.linalg` calls per step in Python loops over teacher layers and
extraction points (SURVEY.md section 3.2), this implementation runs

  * ONE batched (L, D_s, D_s) Gram + batch-parallel Jacobi spectrum for
    all teacher MP ranks (Pallas kernel on TPU),
  * ONE batched matmul-only subspace iteration for all teacher subspaces
    and one for all student subspaces (K-capped, `topk_basis`),
  * ONE batched (P, L, K, K) masked principal-angle spectrum,

entirely inside the jitted train step. Data-dependent MP ranks become rank
masks over K-capped bases (exactness argued in `basd_tpu.spectral.ops`).

Learnable state: P log-temperatures (softplus-positive), initialized so
softplus(x) = 1 (reference `layer_selector.py:58-63`). Frozen state: random
(semi-)orthogonal projections proj_s (D_s x D_s) and proj_t (D_s x D_t)
(reference `layer_selector.py:51-56`).

Gradient contract (matches the reference graph): teacher statistics are
stop-gradient'd (`layer_selector.py:69,133` no_grad), while the student-side
eigenbasis and the principal-angle spectrum ARE differentiated — gradients
reach both the 4 temperatures and the student tokens through the softmax
mixing weights.

Under data-parallel sharding the Gram reductions contract over the global
batch: GSPMD turns the (D, M)@(M, D) einsums into per-shard matmuls + psum
over the data axis, so selector statistics are *global-batch exact* —
strictly stronger than the reference under DDP, where each replica computes
its own ranks/subspaces from the local batch (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from basd_tpu.spectral import (
    marchenko_pastur_rank,
    marchenko_pastur_rank_gram,
    masked_principal_angle_distance,
    topk_basis_gram,
    topk_basis_gram_nograd,
)

# Static cap on extracted subspace width. Full-width bases require one
# 192x192 eigh per teacher layer / extraction point, and XLA's TPU eigh
# serializes over the batch (~1 ms/matrix, measured) — it dominated step
# time. With a K-cap, bases come from matmul-only subspace iteration and
# the principal-angle spectra shrink to K x K. Exactness: MP ranks of real
# token features sit far below K (they are noise-thresholded), and any rank
# is clamped to K, so the rank-masked distance is unchanged whenever
# rank <= K — the same padding argument as in basd_tpu/spectral/ops.py.
_DEFAULT_SUBSPACE_K = 96


class SelectorState(NamedTuple):
    log_temperatures: jax.Array  # (P,) learnable
    proj_s: jax.Array  # (D_s, D_s) frozen random orthogonal
    proj_t: jax.Array  # (D_s, D_t) frozen random semi-orthogonal


def init_selector(
    rng: jax.Array, num_extraction_points: int, student_dim: int, teacher_dim: int
) -> SelectorState:
    k_s, k_t = jax.random.split(rng)
    ortho = jax.nn.initializers.orthogonal()
    proj_s = ortho(k_s, (student_dim, student_dim), jnp.float32)
    proj_t = ortho(k_t, (student_dim, teacher_dim), jnp.float32)
    # softplus(log(e - 1)) == 1.0
    log_temps = jnp.full(
        (num_extraction_points,), jnp.log(jnp.e - 1.0), jnp.float32
    )
    return SelectorState(log_temps, proj_s, proj_t)


def temperatures(state: SelectorState) -> jax.Array:
    return jax.nn.softplus(state.log_temperatures)


def calibrate_subspace_k(
    teacher,
    student_dim: int,
    calib_images: jax.Array,
    *,
    seed: int,
    num_extraction_points: int,
    margin: int = 16,
) -> int:
    """Staging-time `subspace_k` calibration (config `basd.subspace_k: auto`).

    The rank-mask argument (module docstring) is exact whenever every MP
    rank stays <= K, so K only needs to clear the LARGEST teacher-layer MP
    rank. Teacher tokens are frozen, making their ranks a stable property of
    the data distribution: measure them once on a calibration batch with the
    SAME projection the production selector will use (identical PRNG
    derivation), then cap at max_rank + margin rounded up to a multiple of 8
    (MXU/VPU-friendly). Runs before the train step is jitted — the same
    staging slot as the intrinsic-dim calibration (reference
    `train.py:88-118`). Batch-to-batch rank jitter is absorbed by the
    margin; a saturated rank simply clamps (the same controlled deviation as
    the static 96 cap, now with measured headroom)."""
    sel = init_selector(
        jax.random.PRNGKey(seed + 1),
        num_extraction_points,
        student_dim,
        teacher.spec.embed_dim,
    )

    # one jitted program: eager dispatch is a compile round-trip per op on
    # the remote TPU transport (~0.5 s apiece), which would turn this
    # staging pass into minutes
    @jax.jit
    def _max_rank(variables, images, proj_t):
        out = teacher.module.apply(variables, images, train=False)
        tokens = jax.lax.stop_gradient(out.tokens)
        l = tokens.shape[0]
        z_t = jnp.einsum(
            "lmd,ed->lme",
            # same dtype/precision chain as the production selector
            # projection (compute-dtype tokens, f32 accumulation) so the
            # measured ranks size K against the numerics that will run
            tokens.reshape(l, -1, tokens.shape[-1]),
            proj_t.astype(tokens.dtype),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        return jnp.max(marchenko_pastur_rank(z_t))

    max_rank = int(_max_rank(teacher.variables, calib_images, sel.proj_t))
    k = min(student_dim - 1, 8 * -(-(max_rank + margin) // 8))
    print(f"subspace_k_calibrated max_rank={max_rank} k={k}")
    return k


def select_and_mix(
    state: SelectorState,
    student_tokens: jax.Array,  # (P, B, N_s, D_s) extraction-point tokens
    teacher_tokens: jax.Array,  # (L, B, N_t, D_t) all-layer teacher tokens
    teacher_importance: jax.Array,  # (L, B, N_t) attention importance
    *,
    subspace_k: int | None = None,  # static; None -> min(96, D_s - 1)
) -> tuple[jax.Array, jax.Array, dict]:
    """Soft-select teacher layers per extraction point.

    Returns (mixed_tokens (P, B, N_t, D_t), mixed_importance (P, B, N_t),
    aux) where aux carries mixing weights / ranks / distances for logging
    and tests.
    """
    p, b, n_s, d_s = student_tokens.shape
    l, _, n_t, d_t = teacher_tokens.shape

    if subspace_k is None:
        subspace_k = min(_DEFAULT_SUBSPACE_K, d_s - 1)
    k = min(subspace_k, d_s - 1, b * n_s, b * n_t)

    # ---- teacher statistics (no_grad, global batch) ----
    # the projections are frozen buffers (reference layer_selector.py:49-56
    # registers them as non-trainable); stop_gradient makes that a property
    # of this function rather than of the caller's choice of grad leaves —
    # a whole-SelectorState grad would otherwise push a tangent into the
    # non-differentiable Pallas eigvals path.
    proj_t = jax.lax.stop_gradient(state.proj_t)
    proj_s = jax.lax.stop_gradient(state.proj_s)
    # Consume the teacher tokens in their COMPUTE dtype (bf16 on TPU;
    # f32 in the CPU parity suites): the projection einsum accumulates
    # in f32, so this is exactly the reference's contract — its hooks
    # capture autocast-bf16 activations and torch.linalg upcasts from
    # there (layer_selector.py:69-76). A `.astype(f32)` here would
    # MATERIALIZE the (L, B*N_t, D_t) stack in fp32 first (6.5 GB for
    # the 24-layer ViT-L/14 teacher at b256 — the round-5 OOM) and pay
    # 3x matmul passes (bf16x3) for precision the downstream MP
    # ranks/subspaces never relied on: the noise floor MP estimates is
    # a property of the (already bf16-rounded) tokens themselves, and
    # subspace_k calibration measures ranks through this same einsum.
    t_flat = jax.lax.stop_gradient(
        teacher_tokens.reshape(l, b * n_t, d_t)
    )
    z_t = jnp.einsum(
        "lmd,ed->lme", t_flat, proj_t.astype(t_flat.dtype),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )  # (L, M_t, D_s) f32

    # ONE Gram reduction over the M = B*N samples serves both the MP
    # ranks (uncentered cov = G/M) and the subspace extraction (centered
    # Gram = G - M mu mu^T, a rank-1 correction) — the (M, D) Gram pass
    # dominated both when computed twice (measured 7.3 + 21.3 ms at the
    # Table-1 shape; tools/probe_selector_internals.py).
    m_t = b * n_t
    g_t = jnp.einsum(
        "lmd,lme->lde", z_t, z_t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    mu_t = jnp.mean(z_t, axis=-2)  # (L, D_s)

    ranks = marchenko_pastur_rank_gram(g_t, m_t)  # (L,)
    # cap at D_s - 1 (reference layer_selector.py:74) and at the static
    # subspace width; floor at 1 keeps the weighted distance defined when
    # MP finds no signal eigenvalue.
    ranks = jnp.clip(ranks, 1, k)

    g_ct = g_t - m_t * mu_t[:, :, None] * mu_t[:, None, :]
    # teacher statistics are stop-gradient'd (no_grad in the reference),
    # so the fused forward-only subspace-iteration kernel applies
    basis_t, svals_t = topk_basis_gram_nograd(g_ct, k)  # (L, D_s, K), (L, K)

    # ---- student subspaces (differentiable) ----
    s_flat = student_tokens.astype(jnp.float32).reshape(p, b * n_s, d_s)
    z_s = jnp.einsum(
        "pmd,ed->pme", s_flat, proj_s, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH
    )
    m_s = b * n_s
    g_s = jnp.einsum(
        "pmd,pme->pde", z_s, z_s, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    mu_s = jnp.mean(z_s, axis=-2)
    g_cs = g_s - m_s * mu_s[:, :, None] * mu_s[:, None, :]
    # Round-5 hardware A/B (tools/probe_loss_tail.py): differentiating
    # through the subspace iteration beat the one-eigh alternative
    # 89.2 vs 102.3 ms on the full loss-tail f+b, so the iteration is
    # the only path (docs/DESIGN.md section 9).
    basis_s, _ = topk_basis_gram(g_cs, k)  # (P, D_s, K)

    # ---- spectrally-weighted principal angles, all (P, L) pairs at once ----
    d2 = masked_principal_angle_distance(
        basis_s[:, None],  # (P, 1, D_s, D_s)
        basis_t[None],  # (1, L, D_s, D_s)
        svals_t[None],  # (1, L, D_s)
        ranks[None],  # (1, L)
    )  # (P, L)

    # ---- temperature-scaled soft mixing (reference layer_selector.py:107-112)
    tau = temperatures(state)  # (P,)
    weights = jax.nn.softmax(-d2 / tau[:, None], axis=-1)  # (P, L)

    mixed_tokens = jnp.einsum(
        "pl,lbnd->pbnd",
        weights,
        teacher_tokens.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    # Store the mixed teacher tokens in the teacher's compute dtype:
    # fp32-accumulated mix rounded once to bf16 — the same contract as
    # the reference's autocast matmul (its mixed tokens are bf16 until
    # relational.py's .float() islands). Halves the HBM footprint of the
    # (P, B, N_t, D_t) mix and the downstream token-count align at
    # Table-1 (~1.4 GB of traffic). Round-5 hardware A/B: 84.0 vs
    # 89.6 ms on the loss-tail f+b (docs/DESIGN.md section 9); the slow
    # parity suite pins the numerics.
    mixed_tokens = mixed_tokens.astype(teacher_tokens.dtype)
    mixed_importance = jnp.einsum(
        "pl,lbn->pbn",
        weights,
        teacher_importance.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    aux = {
        "mixing_weights": weights,
        "grassmann_d2": d2,
        "mp_ranks": ranks,
        "temperatures": tau,
    }
    return mixed_tokens, mixed_importance, aux
