"""Data layer: metadata, channel stats, subset mapping, synthetic arrays."""

import numpy as np

from basd_tpu.data import (
    dataset_info,
    get_channel_stats,
    get_subset_indices,
    load_split_arrays,
)


class TestDatasetInfo:
    def test_builtin_cifar100(self):
        info = dataset_info("uoft-cs/cifar100")
        assert info["num_classes"] == 100
        assert info["eval_split"] == "test"

    def test_synthetic(self):
        info = dataset_info("synthetic/cifar10-like")
        assert info["num_classes"] == 10
        assert info["img_size"] == 16
        assert len(info["class_names"]) == 10

    def test_synthetic_custom_spec(self):
        info = dataset_info("synthetic/tiny-7c-24px")
        assert info["num_classes"] == 7
        assert info["img_size"] == 24


class TestSubsetIndices:
    def test_identical_classes_returns_none(self):
        assert get_subset_indices("uoft-cs/cifar100", "uoft-cs/cifar100") is None

    def test_imagenet_a_subset(self):
        idxs = get_subset_indices("barkermrl/imagenet-a", "ILSVRC/imagenet-1k")
        assert idxs is not None
        assert len(idxs) == 200
        assert all(0 <= i < 1000 for i in idxs)


class TestSyntheticArrays:
    def test_shapes_and_dtype(self):
        images, labels = load_split_arrays("synthetic/cifar10-like", "train")
        assert images.dtype == np.uint8
        assert images.shape == (512, 16, 16, 3)
        assert labels.shape == (512,)
        assert labels.min() >= 0 and labels.max() < 10

    def test_deterministic(self):
        a, _ = load_split_arrays("synthetic/cifar10-like", "train")
        load_split_arrays.cache_clear()
        b, _ = load_split_arrays("synthetic/cifar10-like", "train")
        np.testing.assert_array_equal(a, b)

    def test_classes_distinguishable(self):
        images, labels = load_split_arrays("synthetic/cifar10-like", "train")
        m0 = images[labels == 0].astype(np.float64).mean(axis=0)
        m1 = images[labels == 1].astype(np.float64).mean(axis=0)
        assert np.abs(m0 - m1).mean() > 5.0


class TestChannelStats:
    def test_welford_matches_direct(self):
        mean, std = get_channel_stats("synthetic/cifar10-like")
        images, _ = load_split_arrays("synthetic/cifar10-like", "train")
        flat = images.reshape(-1, 3).astype(np.float64) / 255.0
        np.testing.assert_allclose(mean, flat.mean(0), atol=1e-9)
        np.testing.assert_allclose(std, flat.std(0), atol=1e-9)
        assert all(0.0 < s < 1.0 for s in std)
