"""Input pipeline: epoch batching + device prefetch."""

import jax
import numpy as np

from basd_tpu.data.pipeline import epoch_batches, prefetch_to_device


class TestEpochBatches:
    def test_drop_last_and_coverage(self):
        images = np.arange(50)[:, None].repeat(3, 1).astype(np.uint8)
        labels = np.arange(50).astype(np.int32)
        rng = np.random.default_rng(0)
        batches = list(epoch_batches(images, labels, 16, rng))
        assert len(batches) == 3  # 50 // 16, remainder dropped
        seen = np.concatenate([l for _, l in batches])
        assert len(set(seen.tolist())) == 48  # no duplicates

    def test_shuffle_differs_per_rng(self):
        labels = np.arange(32).astype(np.int32)
        images = labels[:, None].astype(np.uint8)
        a = next(epoch_batches(images, labels, 32, np.random.default_rng(1)))[1]
        b = next(epoch_batches(images, labels, 32, np.random.default_rng(2)))[1]
        assert not np.array_equal(a, b)


class TestPrefetch:
    def test_yields_device_arrays_in_order(self):
        images = np.arange(64).reshape(8, 8).astype(np.uint8)
        labels = np.arange(8).astype(np.int32)

        def gen():
            for i in range(4):
                yield images[i * 2 : i * 2 + 2], labels[i * 2 : i * 2 + 2]

        out = list(prefetch_to_device(gen(), size=2))
        assert len(out) == 4
        for i, (im, lb) in enumerate(out):
            assert isinstance(im, jax.Array)
            np.testing.assert_array_equal(np.asarray(lb), labels[i * 2 : i * 2 + 2])
