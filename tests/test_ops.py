"""On-device augmentation ops: shapes, ranges, semantics, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.ops import (
    hflip,
    mixup_cutmix,
    normalize,
    random_resized_crop,
    trivial_augment_wide,
)
from basd_tpu.ops.augment import (
    resize_bilinear,
    _affine_warp,
    _autocontrast,
    _equalize,
    _geometric_warp,
)
from basd_tpu.ops.preprocess import center_crop_resize, dual_view

# jitted wrappers shared across tests: the eager op-by-op dispatch path on
# the 1-core/8-virtual-device CPU mesh costs ~20 s per call for the big
# augment graphs; one jit compile (persistently cached) amortizes it
_ta_jit = jax.jit(trivial_augment_wide)
_warp_jit = jax.jit(_geometric_warp)
_affine_jit = jax.jit(_affine_warp)


def _imgs(b=4, s=16, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (b, s, s, 3))


class TestResize:
    def test_matches_jax_image(self):
        x = _imgs(2, 16)
        got = np.asarray(resize_bilinear(x, 24, 24))
        want = np.asarray(
            jax.image.resize(x, (2, 24, 24, 3), method="bilinear")
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identity(self):
        x = _imgs(2, 16)
        np.testing.assert_allclose(
            np.asarray(resize_bilinear(x, 16, 16)), np.asarray(x), atol=1e-6
        )


class TestNormalize:
    def test_values(self):
        x = jnp.ones((1, 2, 2, 3)) * 0.5
        out = normalize(x, (0.5, 0.25, 0.0), (1.0, 0.5, 2.0))
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), [0.0, 0.5, 0.25], atol=1e-6
        )


class TestHFlip:
    def test_flips_half_on_average(self):
        x = _imgs(64, 8)
        out = hflip(x, jax.random.PRNGKey(0))
        flipped = np.asarray(
            jnp.any(jnp.abs(out - x) > 1e-9, axis=(1, 2, 3))
        )
        assert 10 < flipped.sum() < 54  # ~32

    def test_flip_is_mirror(self):
        x = _imgs(32, 8)
        out = np.asarray(hflip(x, jax.random.PRNGKey(1)))
        xr = np.asarray(x[:, :, ::-1, :])
        for i in range(32):
            ok_orig = np.allclose(out[i], np.asarray(x)[i])
            ok_flip = np.allclose(out[i], xr[i])
            assert ok_orig or ok_flip


class TestRandomResizedCrop:
    def test_shape_and_range(self):
        x = _imgs(8, 20)
        out = random_resized_crop(x, jax.random.PRNGKey(0), 16)
        assert out.shape == (8, 16, 16, 3)
        o = np.asarray(out)
        assert o.min() >= -1e-4 and o.max() <= 1.0 + 1e-4

    def test_stochastic(self):
        x = _imgs(4, 20)
        a = np.asarray(random_resized_crop(x, jax.random.PRNGKey(0), 16))
        b = np.asarray(random_resized_crop(x, jax.random.PRNGKey(1), 16))
        assert np.abs(a - b).max() > 1e-3

    def test_full_scale_is_near_resize(self):
        x = _imgs(2, 20)
        out = random_resized_crop(
            x, jax.random.PRNGKey(0), 16, scale=(1.0, 1.0), ratio=(1.0, 1.0)
        )
        want = resize_bilinear(x, 16, 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


class TestTrivialAugment:
    def test_shape_range_finite(self):
        x = _imgs(16, 16)
        out = _ta_jit(x, jax.random.PRNGKey(0))
        assert out.shape == x.shape
        o = np.asarray(out)
        assert np.all(np.isfinite(o))
        assert o.min() >= -1e-4 and o.max() <= 1.0 + 1e-4

    def test_identity_op(self):
        # force op=identity by scanning seeds for a batch of 1 where the
        # output equals the input (identity is 1 of 14 ops)
        x = _imgs(1, 12, seed=3)
        hits = 0
        for seed in range(40):
            out = _ta_jit(x, jax.random.PRNGKey(seed))
            if np.allclose(np.asarray(out), np.asarray(x), atol=1e-5):
                hits += 1
        assert hits > 0  # P(miss all 40) = (13/14)^40 ~ 5%

    def test_jit_compatible(self):
        x = _imgs(4, 12)
        f = jax.jit(trivial_augment_wide)
        out = f(x, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out)))

    def test_equalize_matches_pil(self):
        from PIL import Image, ImageOps

        rng = np.random.default_rng(0)
        # skewed histogram so equalization actually remaps values
        x = (rng.random((2, 16, 16, 3)) ** 3).astype(np.float32)
        out = np.asarray(_equalize(jnp.asarray(x)))
        for i in range(2):
            im = Image.fromarray((x[i] * 255).astype(np.uint8))
            want = np.asarray(ImageOps.equalize(im)).astype(np.float32) / 255.0
            np.testing.assert_allclose(out[i], want, atol=1e-6)

    def test_autocontrast_full_range(self):
        rng = np.random.default_rng(1)
        x = (0.3 + 0.2 * rng.random((2, 8, 8, 3))).astype(np.float32)
        out = np.asarray(_autocontrast(jnp.asarray(x)))
        np.testing.assert_allclose(out.max(axis=(1, 2)), 1.0, atol=1e-5)
        np.testing.assert_allclose(out.min(axis=(1, 2)), 0.0, atol=1e-5)


class TestMixupCutmix:
    def test_targets_are_distributions(self):
        x = _imgs(8, 8)
        labels = jnp.arange(8) % 5
        _, t = mixup_cutmix(x, labels, jax.random.PRNGKey(0), num_classes=5)
        tt = np.asarray(t)
        np.testing.assert_allclose(tt.sum(-1), 1.0, atol=1e-5)
        assert (tt >= 0).all()

    def test_images_are_convex_combinations(self):
        x = _imgs(8, 8)
        labels = jnp.zeros(8, jnp.int32)
        out, _ = mixup_cutmix(x, labels, jax.random.PRNGKey(1), num_classes=3)
        o = np.asarray(out)
        lo = np.minimum(np.asarray(x), np.asarray(jnp.roll(x, 1, 0)))
        hi = np.maximum(np.asarray(x), np.asarray(jnp.roll(x, 1, 0)))
        assert (o >= lo - 1e-5).all() and (o <= hi + 1e-5).all()


class TestDualView:
    def test_shapes_and_stats(self):
        u8 = (np.random.default_rng(0).random((4, 20, 20, 3)) * 255).astype(
            np.uint8
        )
        clean, aug = jax.jit(
            lambda u, k: dual_view(
                u, k,
                img_size=16,
                crop_ratio=16 / 24,
                teacher_stats=((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
                dataset_stats=((0.4, 0.4, 0.4), (0.2, 0.2, 0.2)),
            )
        )(jnp.asarray(u8), jax.random.PRNGKey(0))
        assert clean.shape == (4, 16, 16, 3)
        assert aug.shape == (4, 16, 16, 3)
        # teacher-normalized clean view is in [-1, 1] for 0.5/0.5 stats
        c = np.asarray(clean)
        assert c.min() >= -1.001 and c.max() <= 1.001

    def test_center_crop_resize(self):
        x = jnp.broadcast_to(
            jnp.arange(24, dtype=jnp.float32)[None, :, None, None] / 24.0,
            (1, 24, 24, 3),
        )
        out = center_crop_resize(x, 8, 8 / 12)  # resize to 12 then crop 8
        assert out.shape == (1, 8, 8, 3)


class TestGeometricWarp:
    def _smooth(self, b=2, s=32):
        yy, xx = np.mgrid[0:s, 0:s] / s
        img = (0.5 + 0.3 * np.sin(2 * np.pi * yy) * np.cos(2 * np.pi * xx))
        return jnp.asarray(
            np.tile(img[None, :, :, None], (b, 1, 1, 3)).astype(np.float32)
        )

    def test_rotation_matches_affine_oracle(self):
        x = self._smooth()
        for deg in (10.0, 30.0, 135.0, -45.0):
            ang = float(np.deg2rad(deg))
            angle = jnp.full((2,), ang, jnp.float32)
            zero = jnp.zeros((2,), jnp.float32)
            got = np.asarray(
                _warp_jit(x, angle, zero, zero, zero, zero)
            )
            c, s = np.cos(ang), np.sin(ang)
            mats = jnp.asarray(
                np.tile(np.asarray([[c, s, 0], [-s, c, 0]], np.float32),
                        (2, 1, 1))
            )
            want = np.asarray(_affine_jit(x, mats))
            diff = np.abs(got[:, 8:-8, 8:-8] - want[:, 8:-8, 8:-8])
            assert diff.max() < 0.02, (deg, diff.max())

    def test_quarter_turns_exact(self):

        x = _imgs(2, 16)
        angle = jnp.full((2,), float(np.pi / 2), jnp.float32)
        zero = jnp.zeros((2,), jnp.float32)
        got = np.asarray(_warp_jit(x, angle, zero, zero, zero, zero))
        want = np.asarray(jnp.flip(jnp.swapaxes(x, 1, 2), axis=1))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_translation_exact(self):

        x = _imgs(2, 16)
        zero = jnp.zeros((2,), jnp.float32)
        tx = jnp.full((2,), 3.0, jnp.float32)
        got = np.asarray(_warp_jit(x, zero, zero, zero, tx, zero))
        # out[x] samples in[x+3]: content moves left, right side zero-fills
        np.testing.assert_allclose(
            got[:, :, :13], np.asarray(x)[:, :, 3:], atol=1e-5
        )
        np.testing.assert_allclose(got[:, :, 13:], 0.0, atol=1e-5)

    def test_identity_params_identity(self):

        x = _imgs(3, 16)
        zero = jnp.zeros((3,), jnp.float32)
        got = np.asarray(_warp_jit(x, zero, zero, zero, zero, zero))
        np.testing.assert_allclose(got, np.asarray(x), atol=1e-5)


class TestEqualizeMasked:
    """Packed-subset equalize (`_equalize_masked`): exact `where(mask,
    _equalize(x), x)` semantics on both lax.cond branches."""

    def _x(self, b=10, n=24, seed=8):
        rng = np.random.default_rng(seed)
        return jnp.asarray((rng.random((b, n, n, 3)) ** 2).astype(np.float32))

    def test_packed_branch_matches_full(self):
        from basd_tpu.ops.augment import _equalize_masked

        x = self._x()
        mask = jnp.asarray([1, 0, 0, 1, 0, 0, 0, 1, 0, 0], bool)
        want = np.asarray(jax.jit(lambda x: jnp.where(
            mask[:, None, None, None], _equalize(x), x))(x))
        got = np.asarray(jax.jit(
            lambda x: _equalize_masked(x, mask, capacity=4))(x))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_overflow_falls_back_to_full(self):
        from basd_tpu.ops.augment import _equalize_masked

        x = self._x(seed=9)
        mask = jnp.asarray([1, 1, 1, 1, 1, 0, 1, 1, 0, 1], bool)
        want = np.asarray(jax.jit(lambda x: jnp.where(
            mask[:, None, None, None], _equalize(x), x))(x))
        # count (8) > capacity (4): cond must take the full-batch branch
        got = np.asarray(jax.jit(
            lambda x: _equalize_masked(x, mask, capacity=4))(x))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_empty_and_all_masks(self):
        from basd_tpu.ops.augment import _equalize_masked

        x = self._x(b=6, seed=10)
        for mask in (jnp.zeros(6, bool), jnp.ones(6, bool)):
            want = np.asarray(jax.jit(lambda x, m: jnp.where(
                m[:, None, None, None], _equalize(x), x))(x, mask))
            got = np.asarray(jax.jit(
                lambda x, m: _equalize_masked(x, m, capacity=3))(x, mask))
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_capacity_policy(self):
        from basd_tpu.ops.augment import _equalize_capacity

        assert _equalize_capacity(16) == 16  # small batches: no packing
        cap = _equalize_capacity(256)
        assert cap % 8 == 0 and 256 / 14 < cap < 128

    def test_packed_path_under_sharded_batch(self):
        """The production case (b > 64) takes the packed branch; its
        nonzero+gather+scatter must lower under GSPMD with the batch
        sharded across the mesh (the augment pipeline runs inside the
        global jitted step, not a shard_map island)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from basd_tpu.ops.augment import _equalize_masked
        from basd_tpu.parallel.mesh import create_mesh

        rng = np.random.default_rng(12)
        x = jnp.asarray((rng.random((80, 16, 16, 3)) ** 2).astype(np.float32))
        mask = jnp.asarray(rng.random(80) < 1 / 14.0)
        want = np.asarray(jnp.where(mask[:, None, None, None],
                                    _equalize(x), x))
        mesh = create_mesh(data=8)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
        got = np.asarray(jax.jit(
            lambda x, m: _equalize_masked(x, m, capacity=16))(xs, ms))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestEqualizeLargePath:
    def test_radix16_matches_pil(self):
        from PIL import Image, ImageOps

        rng = np.random.default_rng(5)
        # > 8192 pixels triggers the radix-16 path
        x = (rng.random((2, 96, 96, 3)) ** 2).astype(np.float32)
        out = np.asarray(_equalize(jnp.asarray(x)))
        for i in range(2):
            im = Image.fromarray((x[i] * 255).astype(np.uint8))
            want = np.asarray(ImageOps.equalize(im)).astype(np.float32) / 255.0
            np.testing.assert_allclose(out[i], want, atol=1e-6)


class TestFusedWarpKernel:
    """The Pallas geometric-warp kernel (ops/warp_kernel.py) against the
    XLA tap-sweep path — interpret mode exercises the real kernel math on
    the CPU mesh. Covers every geometric op at extreme magnitudes plus
    the folded hflip and exact-identity passthrough."""

    def _params(self, b):
        rng = np.random.default_rng(7)
        angle = np.zeros(b, np.float32)
        shx = np.zeros(b, np.float32)
        shy = np.zeros(b, np.float32)
        tx = np.zeros(b, np.float32)
        ty = np.zeros(b, np.float32)
        angle[1] = np.deg2rad(30)
        angle[2] = np.deg2rad(-135)
        angle[3] = np.pi / 2  # exact quarter turn
        shx[4] = 0.99  # beyond the round-2 tap budget (truncation fix)
        shy[5] = -0.8
        tx[6] = 3.7  # fractional: exercises the two-level fine pass
        ty[7] = -12.0
        flip = rng.random(b) < 0.5
        return angle, shx, shy, tx, ty, flip

    def test_matches_xla_path_with_flip(self):
        from basd_tpu.ops.warp_kernel import fused_geometric_warp

        b, n = 8, 32
        x = _imgs(b, n, seed=11)
        angle, shx, shy, tx, ty, flip = self._params(b)
        A = jnp.asarray

        def oracle(x):
            xf = jnp.where(
                A(flip)[:, None, None, None], x[:, :, ::-1, :], x
            )
            return _geometric_warp(xf, A(angle), A(shx), A(shy), A(tx), A(ty))

        want = np.asarray(jax.jit(oracle)(x))
        got = np.asarray(
            jax.jit(
                lambda x: fused_geometric_warp(
                    x, A(angle), A(shx), A(shy), A(tx), A(ty), A(flip),
                    interpret=True,
                )
            )(x)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identity_params_bit_exact(self):
        from basd_tpu.ops.warp_kernel import fused_geometric_warp

        x = _imgs(2, 24, seed=3)
        z = jnp.zeros((2,), jnp.float32)
        got = np.asarray(
            jax.jit(
                lambda x: fused_geometric_warp(
                    x, z, z, z, z, z, None, interpret=True
                )
            )(x)
        )
        np.testing.assert_array_equal(got, np.asarray(x))

    def test_trivial_augment_dispatch_parity(self, monkeypatch):
        # the full TA op through the fused kernel == through the XLA path
        # (kernel-vs-XLA warp parity incl. flips is covered separately by
        # test_matches_xla_path_with_flip; 3 samples keep the interpret-
        # mode cost bounded on the 1-core CPU mesh)
        # jit each arm: eager op-by-op dispatch of the whole TA pipeline
        # costs ~10 s/arm on the 1-core mesh; one jitted program per arm
        # is persistent-cache-served on warm runs
        f = jax.jit(lambda x, k, fl: trivial_augment_wide(x, k, flip_mask=fl))
        monkeypatch.setenv("BASD_TPU_WARP", "fused_interpret")
        x = _imgs(3, 32, seed=5)
        key = jax.random.PRNGKey(4)
        flip = jax.random.bernoulli(jax.random.PRNGKey(9), 0.5, (3,))
        got = np.asarray(f(x, key, flip))
        monkeypatch.setenv("BASD_TPU_WARP", "xla")
        want = np.asarray(
            jax.jit(lambda x, k, fl: trivial_augment_wide(x, k, flip_mask=fl))(
                x, key, flip
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_shear_beyond_old_budget_keeps_content(self):
        # shear 0.99 on a large image: the pre-fix tap budget zero-filled
        # pixels whose true source was in-bounds
        s = 128
        x = jnp.ones((1, s, s, 3), jnp.float32)
        sh = jnp.full((1,), 0.99, jnp.float32)
        z = jnp.zeros((1,), jnp.float32)
        out = np.asarray(jax.jit(_geometric_warp)(x, z, sh, z, z, z))
        # row r samples x + 0.99*(r - cy): in-bounds sources must stay 1
        cy = (s - 1) / 2.0
        for r in (0, 10, s - 1):
            src = np.arange(s) + 0.99 * (r - cy)
            inb = (src >= 0.5) & (src <= s - 1.5)
            row = out[0, r, :, 0]
            assert row[inb].min() > 0.99, (r, row[inb].min())


class TestHflipConjugation:
    """The production flip handling applies conjugated warp params and
    reverses the OUTPUT (dodging an XLA:TPU miscompile of reverse+select
    feeding the tap-sweep — docs/DESIGN.md section 7). These tests pin
    its exact equivalence to the naive flip-first form on CPU, where the
    naive form is correct — for both the square shear-decomposition
    branch and the non-square gather branch."""

    def _check(self, shape, seed):
        key = jax.random.PRNGKey(seed)
        x = jax.random.uniform(jax.random.PRNGKey(seed + 1),
                               (8, shape[0], shape[1], 3))
        flip = jax.random.bernoulli(jax.random.PRNGKey(seed + 2), 0.5, (8,))
        pre = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        want = np.asarray(_ta_jit(pre, key))
        got = np.asarray(jax.jit(
            lambda x, k: trivial_augment_wide(x, k, flip_mask=flip)
        )(x, key))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_square_branch(self):
        self._check((32, 32), 0)

    def test_nonsquare_gather_branch(self):
        self._check((24, 40), 3)
