"""Config layer: composition, overlays, overrides, resolvers, snapshots."""

import pytest

from basd_tpu.config import compose_config, load_config, save_config


class TestCompose:
    def test_base_defaults(self):
        cfg = compose_config(["data.dataset=synthetic/cifar10-like"])
        assert cfg.run.seed == 42
        assert cfg.model.vit.img_size == 224
        assert cfg.training.weight_decay == 0.05

    def test_experiment_overlay_merges_globally(self):
        cfg = compose_config(["experiment=basd_smoke"])
        assert cfg.run.name == "basd_smoke"
        assert cfg.data.dataset == "synthetic/cifar10-like"
        assert cfg.model.vit.img_size == 16
        # untouched base keys survive the overlay
        assert cfg.training.weight_decay == 0.05

    def test_dotted_overrides(self):
        cfg = compose_config(
            ["experiment=basd_smoke", "training.num_epochs=7", "data.batch_size=4"]
        )
        assert cfg.training.num_epochs == 7
        assert cfg.data.batch_size == 4

    def test_override_types(self):
        cfg = compose_config(
            [
                "experiment=basd_smoke",
                "training.learning_rate=2.5e-4",
                "checkpoint.resume_from=null",
                "hardware.remat=false",
            ]
        )
        assert cfg.training.learning_rate == pytest.approx(2.5e-4)
        assert cfg.checkpoint.resume_from is None
        assert cfg.hardware.remat is False


class TestResolvers:
    def test_num_classes_and_label_smoothing(self):
        cfg = compose_config(["experiment=basd_smoke"])
        assert cfg.model.num_classes == 10
        assert cfg.training.label_smoothing == pytest.approx(0.1)

    def test_eval_crop_ratio(self):
        # DeiT rule: img / (img + 2 * patch)  (reference src/resolvers.py:14-15)
        cfg = compose_config(["experiment=basd_smoke"])
        assert cfg.data.eval_crop_ratio == pytest.approx(16 / (16 + 2 * 4))

    def test_cifar100_resolves(self):
        cfg = compose_config(["experiment=basd_cifar100"])
        assert cfg.model.num_classes == 100
        assert cfg.training.label_smoothing == pytest.approx(0.01)
        assert cfg.data.eval_crop_ratio == pytest.approx(32 / 40)


class TestSnapshot:
    def test_round_trip(self, tmp_path):
        cfg = compose_config(["experiment=basd_smoke", "training.num_epochs=3"])
        save_config(cfg, tmp_path / "config.yaml")
        loaded = load_config(tmp_path / "config.yaml")
        assert loaded.to_dict() == cfg.to_dict()
        assert loaded.model.num_classes == 10


def test_compose_from_snapshot_applies_overrides(tmp_path):
    from basd_tpu.config import compose_config, compose_from_snapshot, save_config

    cfg = compose_config(["experiment=basd_smoke"])
    cfg.model.arch_overrides = {"embed_dim": 64, "depth": 6}
    save_config(cfg, tmp_path / "config.yaml")
    loaded = compose_from_snapshot(
        tmp_path / "config.yaml",
        ["checkpoint.path=/x/best_model.npz", "run.output_dir=/y"],
    )
    # snapshot fields (incl. train-time derived arch) survive, overrides land
    assert loaded.model.arch_overrides.to_dict() == {"embed_dim": 64, "depth": 6}
    assert loaded.checkpoint.path == "/x/best_model.npz"
    assert loaded.run.output_dir == "/y"
    assert loaded.model.num_classes == 10
