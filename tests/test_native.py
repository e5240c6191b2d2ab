"""Native host kernels: build, numerics vs numpy/PIL references, fallback."""

import numpy as np
import pytest

from basd_tpu.data.native import (
    WelfordStats,
    native_available,
    resize_batch_u8,
)


class TestNativeBuild:
    def test_library_builds_and_loads(self):
        # g++ is part of this environment; the library must build on demand
        assert native_available()


class TestResize:
    def test_matches_float_reference(self):
        rng = np.random.default_rng(0)
        imgs = (rng.random((3, 24, 20, 3)) * 255).astype(np.uint8)
        out = resize_batch_u8(imgs, 16, 16)
        assert out.shape == (3, 16, 16, 3)

        # float reference with the same half-pixel rule
        import jax.numpy as jnp
        from basd_tpu.ops.augment import resize_bilinear

        want = np.asarray(
            resize_bilinear(jnp.asarray(imgs.astype(np.float32)), 16, 16)
        )
        np.testing.assert_allclose(
            out.astype(np.float32), want, atol=1.0  # uint8 rounding
        )

    def test_identity_passthrough(self):
        imgs = np.arange(2 * 8 * 8 * 3, dtype=np.uint8).reshape(2, 8, 8, 3)
        out = resize_batch_u8(imgs, 8, 8)
        np.testing.assert_array_equal(out, imgs)

    def test_upscale(self):
        imgs = np.full((1, 4, 4, 3), 77, np.uint8)
        out = resize_batch_u8(imgs, 12, 12)
        np.testing.assert_array_equal(out, 77)


class TestWelford:
    def test_matches_direct_computation(self):
        rng = np.random.default_rng(1)
        imgs = (rng.random((20, 10, 10, 3)) * 255).astype(np.uint8)
        stats = WelfordStats(3)
        for img in imgs:
            stats.update(img)
        mean, std = stats.result()

        flat = imgs.reshape(-1, 3).astype(np.float64) / 255.0
        np.testing.assert_allclose(mean, flat.mean(0), atol=1e-9)
        np.testing.assert_allclose(std, flat.std(0), atol=1e-9)

    def test_native_matches_python_fallback(self):
        if not native_available():
            pytest.skip("no native library")
        import basd_tpu.data.native as nat

        rng = np.random.default_rng(2)
        imgs = (rng.random((5, 6, 6, 3)) * 255).astype(np.uint8)

        s_native = WelfordStats(3)
        for img in imgs:
            s_native.update(img)

        # force fallback
        saved = nat._lib
        nat._lib = False
        try:
            s_py = WelfordStats(3)
            for img in imgs:
                s_py.update(img)
        finally:
            nat._lib = saved

        np.testing.assert_allclose(s_native.mean, s_py.mean, atol=1e-12)
        np.testing.assert_allclose(s_native.m2, s_py.m2, atol=1e-9)
