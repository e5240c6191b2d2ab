"""Epoch driver: shuffled uint8 batches -> jitted train step -> metrics ->
best/latest checkpoints (reference `src/training/trainer.py:40-211`).

The torch reference interleaves host work (dataloader workers, `.cuda()`
copies, hook bookkeeping) with device work per batch; here the host only
shuffles indices and feeds uint8 arrays to a donated, fully-jitted step over
a device mesh, with metrics fetched once per epoch tail.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.checkpoint import CheckpointManager
from basd_tpu.evaluation.metrics import evaluate_model
from basd_tpu.losses import extraction_points, init_selector
from basd_tpu.models.teacher import Teacher
from basd_tpu.parallel.mesh import batch_sharding, replicated
from basd_tpu.parallel.sharding_rules import state_sharding
from basd_tpu.training.schedule_free import eval_params
from basd_tpu.training.train_step import make_train_step


class Trainer:
    def __init__(
        self,
        config,
        *,
        student_module,
        student_cfg,
        teacher: Teacher,
        teacher_stats: tuple,
        dataset_stats: tuple,
        mesh=None,
    ):
        self.config = config
        self.student = student_module
        self.teacher = teacher
        self.mesh = mesh

        # self-healing Pallas dispatch (no-op off-TPU): a kernel that
        # fails to Mosaic-compile on this backend falls back to XLA via
        # its policy env instead of failing the jitted step compile
        from basd_tpu.utils.kernel_smoke import validate_kernel_dispatches

        for name, err in validate_kernel_dispatches(verbose=False).items():
            print(f"kernel_smoke {name} FAILED -> xla fallback: {err}",
                  flush=True)

        points = extraction_points(
            student_cfg.depth, config.basd.num_extraction_points
        )
        self.extraction_points = points

        selector = init_selector(
            jax.random.PRNGKey(config.run.seed + 1),
            len(points),
            student_cfg.embed_dim,
            teacher.spec.embed_dim,
        )

        self.optimizer, init_fn, step_fn = make_train_step(
            student_module,
            teacher,
            learning_rate=config.training.learning_rate,
            weight_decay=config.training.weight_decay,
            warmup_steps=config.training.get("warmup_steps", 0),
            label_smoothing=config.training.label_smoothing,
            img_size=config.model.vit.img_size,
            crop_ratio=config.data.eval_crop_ratio,
            teacher_stats=teacher_stats,
            dataset_stats=dataset_stats,
            num_classes=config.model.num_classes,
            subspace_k=config.basd.get("subspace_k"),
            mesh=mesh,
        )
        self.state = init_fn(jax.random.PRNGKey(config.run.seed), selector)
        self._step = jax.jit(step_fn, donate_argnums=0)
        self._teacher_vars = teacher.variables

        if mesh is not None:
            # dp on the batch; Megatron tp on the wide matmuls whenever the
            # mesh has a 'model' axis (with model=1 the specs collapse to
            # replicated) — the optimizer z/v iterates follow their params.
            self.state = jax.device_put(
                self.state, state_sharding(mesh, self.state)
            )
            self._teacher_vars = jax.device_put(
                self._teacher_vars, replicated(mesh)
            )
            self._batch_sharding = batch_sharding(mesh)
        else:
            self._batch_sharding = None

        ckpt_dir = (
            Path(config.run.output_dir) / config.run.name / "checkpoints"
        )
        self.checkpoints = CheckpointManager(ckpt_dir)

        self.best_val_acc = 0.0
        self.metrics_history: dict[str, list] = defaultdict(list)
        self._eval_stats = dataset_stats
        # mid-epoch resume point, set by load_checkpoint from a
        # step-granular checkpoint and consumed by the first train() epoch
        self._resume_batch = 0
        self._resume_sums: dict | None = None

    # ------------------------------------------------------------------

    def _train_epoch(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        epoch: int,
        *,
        start_batch: int = 0,
        epoch_sums: dict | None = None,
    ):
        """One epoch; `start_batch`/`epoch_sums` restart mid-epoch after a
        preemption (the batch order is a pure function of (seed, epoch), so
        skipping the first `start_batch` batches replays the identical
        stream). With `checkpoint.save_every_steps` set, `latest` is saved
        asynchronously every N optimizer steps with the running metric sums,
        so a killed job loses at most N steps."""
        import itertools

        from basd_tpu.data.pipeline import epoch_batches, prefetch_to_device

        batch_size = self.config.data.batch_size
        save_every = self.config.checkpoint.get("save_every_steps")
        rng = np.random.default_rng(self.config.run.seed * 100_003 + epoch)

        losses = list(epoch_sums["losses"]) if epoch_sums else []
        accs = list(epoch_sums["accs"]) if epoch_sums else []
        batch_idx = start_batch
        for imgs, labs in prefetch_to_device(
            itertools.islice(
                epoch_batches(images, labels, batch_size, rng),
                start_batch,
                None,
            ),
            sharding=self._batch_sharding,
        ):
            self.state, metrics = self._step(
                self.state, self._teacher_vars, imgs, labs
            )
            losses.append(metrics["loss"])
            accs.append(metrics["train_acc"])
            batch_idx += 1
            if save_every and batch_idx % save_every == 0:
                # value fetches below sync the state before the async save
                self.checkpoints.save_state(
                    "latest",
                    self.state,
                    epoch=epoch,
                    best_val_acc=self.best_val_acc,
                    metrics_history=dict(self.metrics_history),
                    step_in_epoch=batch_idx,
                    epoch_sums={
                        "losses": [float(x) for x in losses],
                        "accs": [float(x) for x in accs],
                    },
                )

        return {
            "train_loss": float(jnp.mean(jnp.stack(losses))),
            "train_acc": 100.0 * float(jnp.mean(jnp.stack(accs))),
        }

    def eval_model_params(self):
        """ScheduleFree x-point student params (optimizer .eval() mode,
        reference `trainer.py:184`)."""
        trainable = {
            "student": self.state.params,
            "log_temperatures": self.state.selector.log_temperatures,
        }
        return eval_params(self.state.opt_state, trainable)["student"]

    def evaluate(self, images: np.ndarray, labels: np.ndarray):
        cfg = self.config
        return evaluate_model(
            self.student.apply,
            self.eval_model_params(),
            images,
            labels,
            img_size=cfg.model.vit.img_size,
            crop_ratio=cfg.data.eval_crop_ratio,
            mean=self._eval_stats[0],
            std=self._eval_stats[1],
            batch_size=cfg.data.batch_size,
            model=self.student,
            sharding=self._batch_sharding,
        )

    # ------------------------------------------------------------------

    def save_checkpoint(self, name: str, epoch: int) -> None:
        self.checkpoints.save_state(
            name,
            self.state,
            epoch=epoch,
            best_val_acc=self.best_val_acc,
            metrics_history=dict(self.metrics_history),
        )

    def save_weights(self, filename: str, epoch: int) -> None:
        self.checkpoints.save_weights(
            filename, jax.device_get(self.eval_model_params()), epoch
        )

    def load_checkpoint(self, checkpoint_path: str) -> int:
        """Restore full training state; returns the epoch to resume at.
        A step-granular checkpoint (saved mid-epoch by `save_every_steps`)
        resumes the SAME epoch at the recorded batch offset."""
        state, custom = self.checkpoints.restore_state(
            checkpoint_path, jax.device_get(self.state)
        )
        self.state = (
            jax.device_put(state, state_sharding(self.mesh, state))
            if self.mesh is not None
            else jax.device_put(state)
        )
        self.best_val_acc = custom["best_val_acc"]
        self.metrics_history = defaultdict(list, custom["metrics_history"])
        if custom.get("step_in_epoch"):
            self._resume_batch = custom["step_in_epoch"]
            self._resume_sums = custom["epoch_sums"]
            return custom["epoch"]
        return custom["epoch"] + 1

    # ------------------------------------------------------------------

    def train(
        self,
        train_data: tuple[np.ndarray, np.ndarray],
        val_data: tuple[np.ndarray, np.ndarray],
        start_epoch: int = 0,
    ) -> dict[str, list]:
        num_epochs = self.config.training.num_epochs
        train_images, train_labels = train_data
        val_images, val_labels = val_data

        for epoch in range(start_epoch, num_epochs):
            start_batch, sums = self._resume_batch, self._resume_sums
            self._resume_batch, self._resume_sums = 0, None
            train_metrics = self._train_epoch(
                train_images, train_labels, epoch,
                start_batch=start_batch, epoch_sums=sums,
            )
            val_metrics = self.evaluate(val_images, val_labels)

            print(
                f"epoch {epoch + 1}/{num_epochs} "
                f"train_loss={train_metrics['train_loss']:.6f} "
                f"train_acc={train_metrics['train_acc']:.4f} "
                f"val_acc={val_metrics['val_acc']:.4f}"
            )

            for key, value in {**train_metrics, **val_metrics}.items():
                self.metrics_history[key].append(value)

            if val_metrics["val_acc"] > self.best_val_acc:
                self.best_val_acc = val_metrics["val_acc"]
                self.save_checkpoint("best_model", epoch)
                self.save_weights("best_model.npz", epoch)

            self.save_checkpoint("latest", epoch)

        self.save_weights("final_model.npz", num_epochs - 1)
        self.checkpoints.wait()  # drain async saves before returning
        print(f"training complete best_val_acc={self.best_val_acc:.4f}")
        return dict(self.metrics_history)
