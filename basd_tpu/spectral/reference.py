"""Plain numpy/scipy reference implementations of the spectral math.

These are the golden oracles for the TPU ops in `basd_tpu.spectral.ops`.
They follow the *mathematical definitions* in the reference paper/repo
(Marchenko-Pastur threshold rank `src/losses/layer_selector.py:8-20`,
Grassmann subspace extraction `:23-37`, spectrally-weighted principal
angles `:94-105`) using straightforward dynamic-shape numpy, including the
dynamic top-k slicing that the static-shape TPU formulation replaces with
rank masks. Tests assert the two formulations agree.
"""

from __future__ import annotations

import numpy as np


def marchenko_pastur_rank_np(features: np.ndarray) -> int:
    """Number of covariance eigenvalues above the MP noise edge.

    q = D/M, sigma^2 = median eigenvalue, lambda_+ = sigma^2 (1+sqrt(q))^2.
    Uses the smaller-side Gram like the reference (M>=D -> D x D).
    """
    m, d = features.shape
    q = d / m
    if m >= d:
        cov = features.T @ features / m
    else:
        cov = features @ features.T / m
    eigvals = np.linalg.eigvalsh(cov)
    sigma2 = float(np.median(eigvals))
    lambda_plus = sigma2 * (1 + q**0.5) ** 2
    return int((eigvals > lambda_plus).sum())


def grassmann_subspace_np(z: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k right-singular basis of the centered matrix + singular values."""
    z = z.astype(np.float64)
    z = z - z.mean(axis=0, keepdims=True)
    _, s, vt = np.linalg.svd(z, full_matrices=False)
    return vt[:k].T, s[:k]


def principal_angle_distance_np(
    u_s: np.ndarray, u_t: np.ndarray, spectral_weights: np.ndarray
) -> float:
    """Spectrally-weighted squared Grassmannian distance.

    sigma = svdvals(U_s^T U_t); theta = acos(clamp(sigma));
    d^2 = sum(sw * theta^2) / sum(sw) with sw/theta paired in descending
    order.
    """
    sigma = np.linalg.svd(u_s.T @ u_t, compute_uv=False)
    eps = np.finfo(sigma.dtype).eps
    theta = np.arccos(np.clip(sigma, None, 1.0 - eps))
    sw = spectral_weights
    return float((sw * theta**2).sum() / sw.sum())


def nuclear_norm_np(c: np.ndarray) -> float:
    return float(np.linalg.svd(c, compute_uv=False).sum())


def selector_weights_np(
    student_tokens: np.ndarray,  # (B, N_s, D_s)
    teacher_tokens: np.ndarray,  # (L, B, N_t, D_t)
    proj_s: np.ndarray,  # (D_s, D_s)
    proj_t: np.ndarray,  # (D_s, D_t)
    temperature: float,
    max_rank: int,
) -> np.ndarray:
    """End-to-end oracle for one extraction point's mixing weights (L,)."""
    L = teacher_tokens.shape[0]
    d_s = student_tokens.shape[-1]

    ranks, subspaces, swts = [], [], []
    for l in range(L):
        z_t = teacher_tokens[l].reshape(-1, teacher_tokens.shape[-1]) @ proj_t.T
        rank = min(marchenko_pastur_rank_np(z_t), max_rank)
        rank = max(rank, 1)
        basis, svals = grassmann_subspace_np(z_t, rank)
        ranks.append(rank)
        subspaces.append(basis)
        swts.append(svals)

    z_s = student_tokens.reshape(-1, d_s) @ proj_s.T
    z_s = z_s - z_s.mean(axis=0, keepdims=True)
    _, _, vt_s = np.linalg.svd(z_s.astype(np.float64), full_matrices=False)

    d2 = np.zeros(L)
    for l in range(L):
        u_s = vt_s[: ranks[l]].T
        d2[l] = principal_angle_distance_np(u_s, subspaces[l], swts[l])

    logits = -d2 / temperature
    logits = logits - logits.max()
    w = np.exp(logits)
    return w / w.sum()
