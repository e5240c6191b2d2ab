"""Full-pipeline integration: train entrypoint on synthetic data, checkpoint
resume, weights-only eval entrypoint, metrics.json schema parity."""

import json
import os

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


@pytest.mark.slow
class TestPreemptionResume:
    """Step-granular preemption recovery (VERDICT round-1 item 7): a job
    killed mid-epoch resumes from the async step-interval checkpoint and
    reproduces the uninterrupted run's metrics trajectory exactly."""

    def _make_trainer(self, tmp_path, save_every=None):
        import jax.numpy as jnp

        from basd_tpu.losses import extraction_points
        from basd_tpu.models import create_student, load_teacher
        from basd_tpu.training.trainer import Trainer

        overrides = [f"run.output_dir={tmp_path}", "data.batch_size=16"]
        if save_every:
            overrides.append(f"checkpoint.save_every_steps={save_every}")
        config = compose_config(["experiment=basd_smoke", *overrides,
                                 "training.num_epochs=1"])
        teacher = load_teacher("vit_mini_patch4", img_size=16,
                               dtype=jnp.float32)
        points = extraction_points(4, config.basd.num_extraction_points)
        student, cfg = create_student(
            "vit_micro_patch4", num_classes=10, drop_path_rate=0.0,
            img_size=16, capture_layers=points, dtype=jnp.float32,
            remat=False,
        )
        return Trainer(
            config,
            student_module=student,
            student_cfg=cfg,
            teacher=teacher,
            teacher_stats=((0.5,) * 3, (0.5,) * 3),
            dataset_stats=((0.5,) * 3, (0.25,) * 3),
            mesh=None,
        )

    def test_kill_and_resume_reproduces_trajectory(self, tmp_path):
        import jax

        from basd_tpu.data import load_split_arrays

        images, labels = load_split_arrays("synthetic/cifar10-like", "train")
        train = (images[:128], labels[:128])  # 8 batches of 16
        val = (images[128:160], labels[128:160])

        # --- uninterrupted reference run ---
        t_clean = self._make_trainer(tmp_path / "clean")
        clean_history = t_clean.train(train, val)

        # --- run killed after 5 steps (checkpoint lands at step 3) ---
        t_kill = self._make_trainer(tmp_path / "kill", save_every=3)
        real_step = t_kill._step
        calls = {"n": 0}

        def dying_step(*args):
            if calls["n"] == 5:
                raise RuntimeError("simulated preemption")
            calls["n"] += 1
            return real_step(*args)

        t_kill._step = dying_step
        with pytest.raises(RuntimeError, match="preemption"):
            t_kill.train(train, val)
        t_kill.checkpoints.wait()  # the step-3 async save must be durable

        # --- fresh process resumes from the mid-epoch checkpoint ---
        t_resume = self._make_trainer(tmp_path / "kill", save_every=3)
        start = t_resume.load_checkpoint(
            str(tmp_path / "kill" / "basd_smoke" / "checkpoints" / "latest")
        )
        assert start == 0  # SAME epoch, mid-epoch offset
        assert t_resume._resume_batch == 3
        resumed_history = t_resume.train(train, val, start_epoch=start)

        for key in ("train_loss", "train_acc", "val_acc"):
            np.testing.assert_allclose(
                resumed_history[key], clean_history[key], rtol=1e-5,
                err_msg=key,
            )
        # resumed final params match the uninterrupted run
        flat_c = jax.tree_util.tree_leaves(t_clean.state.params)
        flat_r = jax.tree_util.tree_leaves(t_resume.state.params)
        for a, b in zip(flat_c, flat_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestStrictWeightLoad:
    """Weights-only loads must reject architecture mismatches: a deeper
    checkpoint whose early blocks happen to shape-match would otherwise
    silently evaluate a truncated model (found via the evaluate CLI)."""

    def _save(self, tmp_path, tree):
        from basd_tpu.checkpoint import CheckpointManager

        m = CheckpointManager(tmp_path)
        m.save_weights(tmp_path / "w.npz", tree, epoch=3)
        return m

    def test_extra_checkpoint_keys_raise(self, tmp_path):
        import jax.numpy as jnp

        big = {f"block{i}": {"w": jnp.ones((2, 2))} for i in range(6)}
        small = {f"block{i}": {"w": jnp.ones((2, 2))} for i in range(4)}
        m = self._save(tmp_path, big)
        with pytest.raises(ValueError, match="architecture mismatch"):
            m.load_weights(tmp_path / "w.npz", small)

    def test_missing_checkpoint_keys_raise(self, tmp_path):
        import jax.numpy as jnp

        small = {f"block{i}": {"w": jnp.ones((2, 2))} for i in range(4)}
        big = {f"block{i}": {"w": jnp.ones((2, 2))} for i in range(6)}
        m = self._save(tmp_path, small)
        with pytest.raises(ValueError, match="missing parameter"):
            m.load_weights(tmp_path / "w.npz", big)

    def test_exact_match_round_trips(self, tmp_path):
        import jax.numpy as jnp

        tree = {"a": {"w": jnp.full((2, 2), 7.0)}, "b": jnp.ones((3,))}
        m = self._save(tmp_path, tree)
        params, epoch = m.load_weights(tmp_path / "w.npz", tree)
        assert epoch == 3
        np.testing.assert_array_equal(np.asarray(params["a"]["w"]), 7.0)


@pytest.mark.slow
class TestPlatformEnvHonored:
    def test_explicit_cpu_env_wins_over_registered_plugin(self):
        """`JAX_PLATFORMS=cpu <cli>` must actually select the CPU backend
        even on images whose sitecustomize registers an accelerator PJRT
        plugin with a platform-priority config override (basd_tpu/__init__
        re-asserts the env var; without it, backend init can hang forever
        on an unreachable accelerator transport)."""
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("JAX_PLATFORM_NAME", None)
        proc = subprocess.run(
            [sys.executable, "-c",
             "import basd_tpu, jax; print(jax.config.jax_platforms)"],
            env=env, capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert proc.stdout.strip().splitlines()[-1] == "cpu"


@pytest.mark.slow
class TestKernelSmoke:
    def test_all_kernels_validate_in_interpret(self):
        from basd_tpu.utils.kernel_smoke import validate_kernel_dispatches

        assert validate_kernel_dispatches(interpret=True, verbose=False) == {}

    def test_failure_flips_policy_env(self, monkeypatch):
        import basd_tpu.utils.kernel_smoke as ks

        def boom(interpret):
            raise RuntimeError("mosaic says no")

        monkeypatch.setattr(
            ks, "KERNEL_CHECKS", (("fake", "BASD_TPU_FAKE", boom, True),)
        )
        monkeypatch.delenv("BASD_TPU_FAKE", raising=False)
        failures = ks.validate_kernel_dispatches(
            interpret=True, verbose=False)
        assert "fake" in failures
        assert os.environ["BASD_TPU_FAKE"] == "xla"
        monkeypatch.delenv("BASD_TPU_FAKE", raising=False)
