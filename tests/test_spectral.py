"""Golden-value tests: TPU spectral ops vs dynamic-shape numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.spectral import (
    grassmann_basis,
    marchenko_pastur_rank,
    masked_principal_angle_distance,
    nuclear_norm,
    svdvals_psd,
)
from basd_tpu.spectral.reference import (
    grassmann_subspace_np,
    marchenko_pastur_rank_np,
    nuclear_norm_np,
    principal_angle_distance_np,
)


def _low_rank_plus_noise(rng, m, d, rank, noise=0.05):
    u = rng.normal(size=(m, rank))
    v = rng.normal(size=(rank, d))
    scales = np.linspace(3.0, 1.0, rank)[:, None]
    return (u * scales.T) @ v / np.sqrt(rank) + noise * rng.normal(size=(m, d))


class TestMarchenkoPastur:
    @pytest.mark.parametrize("true_rank", [2, 5, 10])
    def test_matches_numpy_oracle(self, true_rank):
        rng = np.random.default_rng(0)
        x = _low_rank_plus_noise(rng, 512, 32, true_rank).astype(np.float32)
        got = int(marchenko_pastur_rank(jnp.asarray(x)))
        want = marchenko_pastur_rank_np(x)
        assert got == want

    def test_detects_planted_rank(self):
        rng = np.random.default_rng(1)
        x = _low_rank_plus_noise(rng, 1024, 48, 7, noise=0.02).astype(np.float32)
        assert int(marchenko_pastur_rank(jnp.asarray(x))) == 7

    def test_batched(self):
        rng = np.random.default_rng(2)
        xs = np.stack(
            [_low_rank_plus_noise(rng, 256, 24, r) for r in (3, 6)]
        ).astype(np.float32)
        ranks = marchenko_pastur_rank(jnp.asarray(xs))
        assert ranks.shape == (2,)
        for i, x in enumerate(xs):
            assert int(ranks[i]) == marchenko_pastur_rank_np(x)

    def test_orthogonal_projection_invariance(self):
        # MP rank is invariant under right-multiplication by an orthogonal
        # matrix (property test from SURVEY.md section 4).
        rng = np.random.default_rng(3)
        x = _low_rank_plus_noise(rng, 512, 32, 5).astype(np.float32)
        q, _ = np.linalg.qr(rng.normal(size=(32, 32)))
        r1 = int(marchenko_pastur_rank(jnp.asarray(x)))
        r2 = int(marchenko_pastur_rank(jnp.asarray(x @ q.astype(np.float32))))
        assert r1 == r2


class TestGrassmannBasis:
    def test_singular_values_match_svd(self):
        rng = np.random.default_rng(4)
        z = rng.normal(size=(300, 24)).astype(np.float32)
        _, svals = grassmann_basis(jnp.asarray(z))
        zc = z - z.mean(0, keepdims=True)
        want = np.linalg.svd(zc.astype(np.float64), compute_uv=False)
        np.testing.assert_allclose(np.asarray(svals), want, rtol=1e-3)

    def test_subspace_matches_svd(self):
        rng = np.random.default_rng(5)
        z = _low_rank_plus_noise(rng, 400, 20, 6).astype(np.float32)
        basis, _ = grassmann_basis(jnp.asarray(z))
        k = 6
        want_basis, _ = grassmann_subspace_np(z, k)
        got = np.asarray(basis[:, :k])
        # compare projection operators (basis sign/rotation-invariant)
        np.testing.assert_allclose(
            got @ got.T, want_basis @ want_basis.T, atol=5e-3
        )

    def test_descending_order(self):
        rng = np.random.default_rng(6)
        z = rng.normal(size=(100, 16)).astype(np.float32)
        _, svals = grassmann_basis(jnp.asarray(z))
        s = np.asarray(svals)
        assert np.all(np.diff(s) <= 1e-5)


class TestSvdvals:
    def test_values(self):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(12, 20)).astype(np.float32)
        got = np.asarray(svdvals_psd(jnp.asarray(a)))
        want = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)

    def test_tall_matrix(self):
        rng = np.random.default_rng(8)
        a = rng.normal(size=(20, 12)).astype(np.float32)
        got = np.asarray(svdvals_psd(jnp.asarray(a)))
        want = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)

    def test_gradient_matches_analytic(self):
        # d(sum w_j sigma_j)/dA = U diag(w) V^T (distinct singular values)
        rng = np.random.default_rng(9)
        a = rng.normal(size=(6, 9)).astype(np.float32)
        w = rng.normal(size=(6,)).astype(np.float32)

        def f(x):
            return jnp.sum(svdvals_psd(x) * w)

        g = np.asarray(jax.grad(f)(jnp.asarray(a)))
        u, _, vt = np.linalg.svd(a, full_matrices=False)
        want = (u * w) @ vt
        np.testing.assert_allclose(g, want, atol=2e-2)

    def test_gradient_finite_with_zero_singular_values(self):
        # rank-deficient input: generic SVD JVPs produce NaN here.
        a = np.zeros((5, 8), dtype=np.float32)
        a[0, 0] = 1.0

        def f(x):
            return jnp.sum(svdvals_psd(x))

        g = np.asarray(jax.grad(f)(jnp.asarray(a)))
        assert np.all(np.isfinite(g))


class TestNuclearNorm:
    @pytest.mark.parametrize("shape", [(8, 14), (14, 8), (3, 8, 14)])
    def test_values(self, shape):
        rng = np.random.default_rng(10)
        c = rng.normal(size=shape).astype(np.float32)
        got = np.asarray(nuclear_norm(jnp.asarray(c)))
        want = np.linalg.svd(c, compute_uv=False).sum(axis=-1)
        np.testing.assert_allclose(got, want, rtol=5e-3)

    def test_gradient_is_orthogonal_factor(self):
        # For full-rank C with distinct singular values,
        # d||C||_nuc / dC = U V^T, which has singular values all 1.
        rng = np.random.default_rng(11)
        c = rng.normal(size=(6, 10)).astype(np.float32)
        g = np.asarray(jax.grad(lambda x: jnp.sum(nuclear_norm(x)))(jnp.asarray(c)))
        sv = np.linalg.svd(g, compute_uv=False)
        np.testing.assert_allclose(sv, np.ones(6), atol=1e-2)

    def test_gradient_finite_rank_deficient(self):
        c = np.zeros((4, 7), dtype=np.float32)
        c[0, 0] = 2.0
        g = np.asarray(jax.grad(lambda x: jnp.sum(nuclear_norm(x)))(jnp.asarray(c)))
        assert np.all(np.isfinite(g))
        np.testing.assert_allclose(nuclear_norm_np(c), 2.0)


class TestMaskedPrincipalAngles:
    def test_matches_dynamic_slicing_oracle(self):
        rng = np.random.default_rng(12)
        d = 16
        for k in (2, 5, 9):
            zs = rng.normal(size=(200, d)).astype(np.float32)
            zt = _low_rank_plus_noise(rng, 200, d, k).astype(np.float32)
            basis_s, _ = grassmann_basis(jnp.asarray(zs))
            basis_t, svals_t = grassmann_basis(jnp.asarray(zt))

            got = masked_principal_angle_distance(
                basis_s[None], basis_t[None], svals_t[None],
                jnp.asarray([k], dtype=jnp.int32),
            )

            us_np, _ = grassmann_subspace_np(zs, k)
            ut_np, sw_np = grassmann_subspace_np(zt, k)
            want = principal_angle_distance_np(us_np, ut_np, sw_np)
            np.testing.assert_allclose(float(got[0]), want, rtol=2e-2, atol=1e-4)

    def test_identical_subspace_distance_zero(self):
        rng = np.random.default_rng(13)
        z = _low_rank_plus_noise(rng, 300, 12, 4).astype(np.float32)
        basis, svals = grassmann_basis(jnp.asarray(z))
        d2 = masked_principal_angle_distance(
            basis[None], basis[None], svals[None],
            jnp.asarray([4], dtype=jnp.int32),
        )
        assert float(d2[0]) < 5e-3

    def test_gradient_flows_to_student_basis(self):
        rng = np.random.default_rng(14)
        zs = rng.normal(size=(100, 10)).astype(np.float32)
        zt = rng.normal(size=(100, 10)).astype(np.float32)
        basis_t, svals_t = grassmann_basis(jnp.asarray(zt))

        def f(zs_arr):
            basis_s, _ = grassmann_basis(zs_arr)
            return masked_principal_angle_distance(
                basis_s[None], basis_t[None], svals_t[None],
                jnp.asarray([3], dtype=jnp.int32),
            )[0]

        g = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(zs)))
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0


class TestNuclearNormNewtonSchulz:
    def test_matches_svd(self):
        from basd_tpu.spectral import nuclear_norm_ns

        rng = np.random.default_rng(20)
        c = rng.normal(size=(16, 12, 24)).astype(np.float32)
        got = np.asarray(nuclear_norm_ns(jnp.asarray(c)))
        want = np.linalg.svd(c, compute_uv=False).sum(-1)
        np.testing.assert_allclose(got, want, rtol=2e-3)

    def test_ill_conditioned(self):
        from basd_tpu.spectral import nuclear_norm_ns

        rng = np.random.default_rng(21)
        u, _ = np.linalg.qr(rng.normal(size=(10, 10)))
        v, _ = np.linalg.qr(rng.normal(size=(14, 14)))
        s = np.geomspace(1.0, 1e-3, 10)
        c = (u * s) @ v[:, :10].T
        got = float(nuclear_norm_ns(jnp.asarray(c.astype(np.float32)[None]))[0])
        np.testing.assert_allclose(got, s.sum(), rtol=5e-3)

    def test_gradient_is_polar_factor(self):
        from basd_tpu.spectral import nuclear_norm_ns

        rng = np.random.default_rng(22)
        c = rng.normal(size=(6, 10)).astype(np.float32)
        g = np.asarray(
            jax.grad(lambda x: jnp.sum(nuclear_norm_ns(x)))(jnp.asarray(c))
        )
        u, _, vt = np.linalg.svd(c, full_matrices=False)
        np.testing.assert_allclose(g, u @ vt, atol=2e-3)

    def test_zero_matrix_safe(self):
        from basd_tpu.spectral import nuclear_norm_ns

        c = jnp.zeros((2, 4, 6))
        v = np.asarray(nuclear_norm_ns(c))
        g = np.asarray(
            jax.grad(lambda x: jnp.sum(nuclear_norm_ns(x)))(c)
        )
        assert np.all(v == 0) and np.all(np.isfinite(g))


class TestTopkBasis:
    def test_matches_full_eigh(self):
        from basd_tpu.spectral import topk_basis

        rng = np.random.default_rng(30)
        z = _low_rank_plus_noise(rng, 400, 24, 6).astype(np.float32)
        k = 8
        basis, svals = topk_basis(jnp.asarray(z[None]), k)
        basis, svals = np.asarray(basis[0]), np.asarray(svals[0])

        zc = z - z.mean(0, keepdims=True)
        want_svals = np.linalg.svd(zc, compute_uv=False)[:k]
        # signal singular values converge; the noise tail is nearly
        # degenerate, so any basis of it is valid (and carries ~zero
        # spectral weight downstream)
        np.testing.assert_allclose(svals[:6], want_svals[:6], rtol=1e-2)

        _, _, vt = np.linalg.svd(zc.astype(np.float64), full_matrices=False)
        want_proj = vt[:6].T @ vt[:6]
        got_proj = basis[:, :6] @ basis[:, :6].T
        np.testing.assert_allclose(got_proj, want_proj, atol=2e-2)

    def test_orthonormal_columns(self):
        from basd_tpu.spectral import topk_basis

        rng = np.random.default_rng(31)
        z = rng.normal(size=(3, 200, 16)).astype(np.float32)
        basis, _ = topk_basis(jnp.asarray(z), 8)
        for b in np.asarray(basis):
            np.testing.assert_allclose(b.T @ b, np.eye(8), atol=5e-3)

    def test_differentiable(self):
        from basd_tpu.spectral import topk_basis

        rng = np.random.default_rng(32)
        z = rng.normal(size=(100, 10)).astype(np.float32)

        def f(z):
            basis, svals = topk_basis(z[None], 4)
            return jnp.sum(svals) + jnp.sum(basis**2)

        g = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(z)))
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


class TestNuclearNormPair:
    def test_matches_svd(self):
        from basd_tpu.spectral import nuclear_norm_pair

        rng = np.random.default_rng(40)
        s = rng.normal(size=(5, 20, 32)).astype(np.float32)
        t = rng.normal(size=(5, 20, 48)).astype(np.float32)
        got = np.asarray(nuclear_norm_pair(jnp.asarray(s), jnp.asarray(t)))
        for i in range(5):
            want = np.linalg.svd(s[i].T @ t[i], compute_uv=False).sum()
            np.testing.assert_allclose(got[i], want, rtol=3e-3)

    def test_gradients_match_polar(self):
        from basd_tpu.spectral import nuclear_norm_pair

        rng = np.random.default_rng(41)
        s = rng.normal(size=(12, 16)).astype(np.float32)
        t = rng.normal(size=(12, 24)).astype(np.float32)
        gs, gt = jax.grad(
            lambda a, b: jnp.sum(nuclear_norm_pair(a[None], b[None])),
            argnums=(0, 1),
        )(jnp.asarray(s), jnp.asarray(t))
        u, _, vt = np.linalg.svd(s.T @ t, full_matrices=False)
        p = u @ vt
        np.testing.assert_allclose(np.asarray(gs), t @ p.T, atol=5e-3)
        np.testing.assert_allclose(np.asarray(gt), s @ p, atol=5e-3)

    def test_low_rank_safe(self):
        from basd_tpu.spectral import nuclear_norm_pair

        rng = np.random.default_rng(42)
        s = np.zeros((1, 10, 16), np.float32)
        s[0, :, 0] = rng.normal(size=10)
        t = rng.normal(size=(1, 10, 24)).astype(np.float32)
        v = np.asarray(nuclear_norm_pair(jnp.asarray(s), jnp.asarray(t)))
        want = np.linalg.svd(s[0].T @ t[0], compute_uv=False).sum()
        np.testing.assert_allclose(v[0], want, rtol=1e-2)
        g = jax.grad(
            lambda a: jnp.sum(nuclear_norm_pair(a, jnp.asarray(t)))
        )(jnp.asarray(s))
        assert np.all(np.isfinite(np.asarray(g)))


class TestJacobiEigh:
    def _psd(self, b, n, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(b, n, n)).astype(np.float32)
        return (x @ np.swapaxes(x, 1, 2)) / n

    @pytest.mark.parametrize("n", [8, 17, 64])
    def test_matches_lapack(self, n):
        from basd_tpu.spectral.jacobi import jacobi_eigh

        a = self._psd(3, n)
        w, v = jacobi_eigh(jnp.asarray(a), sweeps=12)
        w, v = np.asarray(w), np.asarray(v)
        want = np.linalg.eigvalsh(a)[:, ::-1]
        np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)
        # eigenvector residual + orthonormality
        res = np.einsum("bij,bjk->bik", a, v) - w[:, None, :] * v
        assert np.abs(res).max() < 1e-4
        for vv in v:
            np.testing.assert_allclose(vv.T @ vv, np.eye(n), atol=1e-4)

    def test_pallas_interpret_matches_pure(self):
        from basd_tpu.spectral.jacobi import jacobi_eigh
        from basd_tpu.spectral.pallas_jacobi import pallas_jacobi_eigh

        a = jnp.asarray(self._psd(2, 16, seed=1))
        w1, v1 = jacobi_eigh(a, sweeps=10)
        w2, v2 = pallas_jacobi_eigh(a, sweeps=10, interpret=True)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
        np.testing.assert_allclose(
            np.abs(np.asarray(v1)), np.abs(np.asarray(v2)), atol=1e-4
        )

    def test_pallas_eigvals_interpret(self):
        from basd_tpu.spectral.pallas_jacobi import pallas_jacobi_eigvals

        a = jnp.asarray(self._psd(2, 12, seed=2))
        w = np.asarray(pallas_jacobi_eigvals(a, sweeps=12, interpret=True))
        want = np.linalg.eigvalsh(np.asarray(a))
        np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)

    def test_pallas_eigvals_odd_n(self):
        from basd_tpu.spectral.pallas_jacobi import pallas_jacobi_eigvals

        a = jnp.asarray(self._psd(2, 9, seed=3))
        w = np.asarray(pallas_jacobi_eigvals(a, sweeps=12, interpret=True))
        want = np.linalg.eigvalsh(np.asarray(a))
        np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)


class TestTridiagSturm:
    """Householder tridiagonalization + Sturm bisection MP rank
    (`spectral/tridiag.py`) — the eigenvalues-free fast path."""

    def _planted_covs(self, b=8, m=512, d=96, seed=0):
        rng = np.random.default_rng(seed)
        covs, exp = [], []
        for _ in range(b):
            r = int(rng.integers(3, d * 2 // 3))
            u = rng.standard_normal((m, r)) * (3.0 + rng.random(r) * 5)
            x = u @ rng.standard_normal((r, d)) + rng.standard_normal((m, d))
            cov = x.T @ x / m
            covs.append(cov)
            ev = np.linalg.eigvalsh(cov.astype(np.float64))
            s2 = np.median(ev)
            lp = s2 * (1 + (d / m) ** 0.5) ** 2
            exp.append(int((ev > lp).sum()))
        return np.stack(covs).astype(np.float32), np.asarray(exp)

    def test_tridiag_preserves_spectrum(self):
        from basd_tpu.spectral.tridiag import householder_tridiag

        covs, _ = self._planted_covs(b=4, d=48)
        diag, off = jax.jit(householder_tridiag)(jnp.asarray(covs))
        for i in range(covs.shape[0]):
            t = (
                np.diag(np.asarray(diag[i]))
                + np.diag(np.asarray(off[i]), 1)
                + np.diag(np.asarray(off[i]), -1)
            )
            w1 = np.linalg.eigvalsh(covs[i].astype(np.float64))
            w2 = np.linalg.eigvalsh(t.astype(np.float64))
            rel = np.max(np.abs(w1 - w2)) / np.max(np.abs(w1))
            assert rel < 5e-6, (i, rel)

    def test_sturm_counts_exact(self):
        from basd_tpu.spectral.tridiag import householder_tridiag, sturm_count

        covs, _ = self._planted_covs(b=2, d=64, seed=3)
        diag, off = householder_tridiag(jnp.asarray(covs))
        ev = np.sort(np.linalg.eigvalsh(covs[0].astype(np.float64)))
        shifts = jnp.asarray(
            [[ev[5] + 1e-5, ev[31] + 1e-5, ev[63] + 1.0, ev[0] - 1.0]],
            jnp.float32,
        )
        got = np.asarray(sturm_count(diag[:1], (off * off)[:1], shifts))[0]
        np.testing.assert_array_equal(got, [6, 32, 64, 0])

    def test_mp_rank_matches_numpy_oracle(self):
        from basd_tpu.spectral.tridiag import mp_rank_sturm

        covs, exp = self._planted_covs()
        got = np.asarray(jax.jit(lambda c: mp_rank_sturm(c, 512))(jnp.asarray(covs)))
        np.testing.assert_array_equal(got, exp)

    def test_mp_rank_matches_eigh_path_on_token_grams(self):
        """Same ranks as the production eigh-based path on realistic
        token-Gram spectra (decaying + noise bulk)."""
        from basd_tpu.spectral.ops import marchenko_pastur_rank
        from basd_tpu.spectral.tridiag import mp_rank_sturm

        rng = np.random.default_rng(7)
        m, d = 2048, 192
        spectrum = np.exp(-np.arange(d) / 12.0) + 1e-3
        x = (rng.standard_normal((6, m, d)) * np.sqrt(spectrum)).astype(
            np.float32
        )
        cov = jnp.einsum("bmd,bme->bde", jnp.asarray(x), jnp.asarray(x)) / m
        got = np.asarray(jax.jit(lambda c: mp_rank_sturm(c, m))(cov))
        ref = np.asarray(marchenko_pastur_rank(jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)


class TestScheduledSqrt:
    """Properties of the minimax quintic square-root schedule that the
    nuclear-norm subgradient contract depends on (`_NS_SQRT_SCHED`)."""

    def test_scalar_convergence_and_subgradient_bound(self):
        from basd_tpu.spectral.ops import _NS_SQRT_SCHED

        x = np.concatenate(
            [np.geomspace(1e-12, 1.0, 200001), [0.0, 1.0]])
        y, z = x.copy(), np.ones_like(x)
        for a, b, c in _NS_SQRT_SCHED:
            m = z * y
            t = a + b * m + c * m * m
            y, z = y * t, t * z
        m = z * y
        # subgradient validity: singular values sqrt(m) <= 1 (+eps)
        assert m.max() <= 1.0 + 1e-5
        assert y.min() >= 0.0
        # convergence over the designed range [1e-6, 1]
        sel = x >= 1e-6
        rel = np.abs(y[sel] - np.sqrt(x[sel])) / np.sqrt(x[sel])
        assert rel.max() < 1e-5
        relz = np.abs(z[sel] * np.sqrt(x[sel]) - 1.0)
        assert relz.max() < 1e-5

    def test_frobenius_scale_bounds_spectrum(self):
        # scaling contract: rho(W) <= ||W||_F for the PSD-product W
        rng = np.random.default_rng(0)
        for _ in range(5):
            a = rng.normal(size=(12, 5)).astype(np.float64)
            b = rng.normal(size=(12, 7)).astype(np.float64)
            w = (b @ b.T) @ (a @ a.T)
            rho = np.abs(np.linalg.eigvals(w)).max()
            assert rho <= np.linalg.norm(w) + 1e-9


class TestNuclearNormPairGram:
    def test_matches_feature_form(self):
        from basd_tpu.spectral import nuclear_norm_pair, nuclear_norm_pair_gram

        rng = np.random.default_rng(50)
        s = rng.normal(size=(4, 18, 24)).astype(np.float32)
        t = rng.normal(size=(4, 18, 40)).astype(np.float32)
        gs = jnp.einsum("bnd,bmd->bnm", s, s)
        gt = jnp.einsum("bnd,bmd->bnm", t, t)
        got = np.asarray(nuclear_norm_pair_gram(gs, gt))
        want = np.asarray(nuclear_norm_pair(jnp.asarray(s), jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_gradient_composes_to_polar(self):
        # d||S^T T||_nuc/dS through the gram chain == T P^T (polar)
        from basd_tpu.spectral import nuclear_norm_pair_gram

        rng = np.random.default_rng(51)
        s = rng.normal(size=(10, 14)).astype(np.float32)
        t = rng.normal(size=(10, 20)).astype(np.float32)

        def f(s_):
            gs = jnp.einsum("nd,md->nm", s_, s_)[None]
            gt = jnp.einsum("nd,md->nm", jnp.asarray(t), jnp.asarray(t))[None]
            return jnp.sum(nuclear_norm_pair_gram(gs, gt))

        g = np.asarray(jax.grad(f)(jnp.asarray(s)))
        u, _, vt = np.linalg.svd(s.T @ t, full_matrices=False)
        p = u @ vt
        np.testing.assert_allclose(g, t @ p.T, atol=5e-3)

    def test_degenerate_zero_gram_finite(self):
        # indefinite roundoff-scale grams must not blow up through the
        # schedule once ridged (losses.procrustes ridge contract)
        from basd_tpu.spectral import nuclear_norm_pair_gram

        rng = np.random.default_rng(52)
        noise = rng.normal(size=(2, 16, 16)).astype(np.float32) * 1e-7
        noise = noise + np.swapaxes(noise, 1, 2)
        ridge = 1e-6 * np.eye(16, dtype=np.float32)
        gs = jnp.asarray(noise + ridge)
        gt = jnp.asarray(np.swapaxes(noise, 1, 2) + ridge)
        v = np.asarray(nuclear_norm_pair_gram(gs, gt))
        assert np.all(np.isfinite(v))
        assert np.all(np.abs(v) < 1e-3)


class TestJacobiDispatchCap:
    """Pin the `_use_pallas_jacobi` routing boundary (docs/DESIGN.md: the
    round-5 accuracy adjudication capped the kernel at the measured
    sweeps=6 fp32-floor domain; both sides were confirmed by in-context
    step A/Bs — Pallas wins at t3's n=48, XLA wins at t1's n=192)."""

    def _routed(self, shape, monkeypatch):
        from basd_tpu.spectral import ops

        # neutralize the CPU fallback so the shape policy itself is tested
        monkeypatch.setenv("BASD_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.delenv("BASD_TPU_JACOBI", raising=False)
        monkeypatch.delenv("BASD_TPU_DISABLE_PALLAS", raising=False)
        return ops._use_pallas_jacobi(shape)

    @pytest.mark.parametrize(
        "shape",
        [
            (48, 48, 48),   # t3 angles (P*L, K, K)
            (12, 72, 72),   # t2 angles K
            (4, 65, 65),    # t3 token-Gram svdvals
            (48, 96, 96),   # the tune_spectral measurement point itself
        ],
    )
    def test_production_pallas_shapes(self, shape, monkeypatch):
        assert self._routed(shape, monkeypatch)

    @pytest.mark.parametrize(
        "shape",
        [
            (48, 192, 192),  # t1 angles — under-converged at sweeps=6
            (24, 184, 184),  # vitl angles
            (4, 197, 197),   # 197-token svdvals Grams
            (48, 97, 97),    # first size past the measured floor boundary
            (2, 48, 48),     # batch too small for the batch-parallel win
            (3, 8, 8),       # below the minimum tile
        ],
    )
    def test_xla_shapes(self, shape, monkeypatch):
        assert not self._routed(shape, monkeypatch)

    def test_kill_switches(self, monkeypatch):
        from basd_tpu.spectral import ops

        monkeypatch.setenv("BASD_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("BASD_TPU_JACOBI", "xla")
        assert not ops._use_pallas_jacobi((48, 48, 48))
        monkeypatch.delenv("BASD_TPU_JACOBI")
        monkeypatch.setenv("BASD_TPU_DISABLE_PALLAS", "1")
        assert not ops._use_pallas_jacobi((48, 48, 48))


class TestTopkBatchConcatParity:
    @pytest.mark.slow  # ~16 s on the 1-core host; suite-budget trim
    # (VERDICT r4 weak #5) — a numerics pin for an unshipped variant,
    # not production-path coverage.
    def test_concat_batch_is_exact(self):
        """Every op in the subspace iteration is per-matrix, so batching
        two Gram stacks into one call must reproduce the separate calls
        bit-exactly. (Property relied on by the round-5 chain-merge A/B —
        the merge itself measured neutral-to-negative in-context and was
        not shipped, docs/DESIGN.md section 9 — and by any future batch
        regrouping.)"""
        from basd_tpu.spectral import topk_basis_gram

        rng = np.random.default_rng(7)
        d, k = 64, 24
        def psd(b, seed):
            r = np.random.default_rng(seed)
            x = r.normal(size=(b, 100, d)).astype(np.float32)
            xc = x - x.mean(axis=1, keepdims=True)
            return np.einsum("bmd,bme->bde", xc, xc)
        g_t = jnp.asarray(psd(5, 1))
        g_s = jnp.asarray(psd(3, 2))

        b_t, s_t = topk_basis_gram(g_t, k)
        b_s, s_s = topk_basis_gram(g_s, k)
        b_all, s_all = topk_basis_gram(jnp.concatenate([g_t, g_s]), k)

        np.testing.assert_array_equal(np.asarray(b_all[:5]), np.asarray(b_t))
        np.testing.assert_array_equal(np.asarray(s_all[:5]), np.asarray(s_t))
        np.testing.assert_array_equal(np.asarray(b_all[5:]), np.asarray(b_s))
        np.testing.assert_array_equal(np.asarray(s_all[5:]), np.asarray(s_s))
