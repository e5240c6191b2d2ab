"""Full-pipeline integration: train entrypoint on synthetic data, checkpoint
resume, weights-only eval entrypoint, metrics.json schema parity."""

import json

import numpy as np
import pytest

from basd_tpu.config import compose_config, load_config


def _smoke_config(tmp_path, *extra):
    return compose_config(
        [
            "experiment=basd_smoke",
            f"run.output_dir={tmp_path}",
            "data.batch_size=16",
            "training.num_epochs=1",
            *extra,
        ]
    )


@pytest.mark.slow
class TestTrainPipeline:
    def test_end_to_end_train(self, tmp_path):
        from basd_tpu.train import run

        config = _smoke_config(tmp_path)
        results = run(config)

        # metrics.json schema (reference metrics.py:156-171)
        assert set(results) == {"run", "primary", "robustness", "efficiency"}
        assert results["primary"]["dataset"] == "synthetic/cifar10-like"
        for key in ("val_acc", "val_acc_top5", "loss"):
            assert np.isfinite(results["primary"][key])
        for key in ("param_count", "param_count_m", "gflops",
                    "throughput_img_per_sec"):
            assert key in results["efficiency"]

        out = tmp_path / "basd_smoke"
        assert (out / "metrics.json").exists()
        assert (out / "config.yaml").exists()
        ckpt = out / "checkpoints"
        assert (ckpt / "latest").exists()
        assert (ckpt / "final_model.npz").exists()

        with open(out / "metrics.json") as f:
            on_disk = json.load(f)
        assert on_disk["run"]["name"] == "basd_smoke"

        # derived-architecture contract: snapshot carries arch_overrides
        snap = load_config(out / "config.yaml")
        assert snap.model.arch_overrides["depth"] == 6  # teacher depth copied

    def test_resume_from_checkpoint(self, tmp_path):
        from basd_tpu.train import run

        config = _smoke_config(tmp_path)
        run(config)

        ckpt = str(tmp_path / "basd_smoke" / "checkpoints" / "latest")
        config2 = _smoke_config(
            tmp_path,
            "training.num_epochs=2",
            f"checkpoint.resume_from={ckpt}",
        )
        results = run(config2)
        assert np.isfinite(results["primary"]["val_acc"])

    def test_eval_entrypoint(self, tmp_path):
        from basd_tpu.train import run as train_run
        from basd_tpu.evaluate import run as eval_run

        config = _smoke_config(tmp_path)
        train_run(config)

        snap = load_config(tmp_path / "basd_smoke" / "config.yaml")
        snap.checkpoint.path = str(
            tmp_path / "basd_smoke" / "checkpoints" / "final_model.npz"
        )
        snap.run.output_dir = str(tmp_path / "eval_out")
        results = eval_run(snap)
        assert np.isfinite(results["primary"]["val_acc"])


class TestLogitMasking:
    def test_subset_masking_changes_predictions(self):
        """OOD robustness-transfer path: logits restricted to a class
        subset (reference metrics.py:42-44) — masked evaluation must score
        against subset-local label indices."""
        import jax
        import jax.numpy as jnp

        from basd_tpu.evaluation.metrics import evaluate_model
        from basd_tpu.models import create_student

        student, cfg = create_student(
            "vit_micro_patch4", num_classes=10, drop_path_rate=0.0,
            img_size=16, dtype=jnp.float32, remat=False,
        )
        params = student.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
        )["params"]

        rng = np.random.default_rng(0)
        images = (rng.random((24, 20, 20, 3)) * 255).astype(np.uint8)
        # subset of 4 parent classes; labels are subset-local (0..3)
        subset = (7, 2, 9, 4)
        labels = rng.integers(0, 4, 24).astype(np.int32)

        kwargs = dict(
            img_size=16, crop_ratio=16 / 24,
            mean=(0.5,) * 3, std=(0.25,) * 3, batch_size=8,
        )
        masked = evaluate_model(
            student.apply, params, images, labels,
            valid_indices=subset, **kwargs,
        )
        # top-5 over 4 classes is always 100
        assert masked["val_acc_top5"] == 100.0
        assert 0.0 <= masked["val_acc"] <= 100.0
        assert np.isfinite(masked["loss"])
