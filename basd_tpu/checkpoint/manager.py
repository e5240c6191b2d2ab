"""Orbax-backed checkpointing: async saves, best/latest policy, resume.

Reference policy (`src/training/trainer.py:94-123, 201-208`, SURVEY.md 5.4):
  * full training state under `{output_dir}/{run}/checkpoints/{name}`
    (params, optimizer z/v iterates, selector temperatures, PRNG, step)
    plus custom metadata {epoch, best_val_acc, metrics_history},
  * `best_model` saved on val-acc improvement, `latest` every epoch,
  * weights-only `best_model.pth`-equivalent exports for eval,
  * resume returns epoch + 1.

TPU-native upgrades over the reference (SURVEY.md 5.3 — preemption-aware
checkpointing):
  * saves are ASYNC: `save` enqueues the write (the device->host copy is
    taken synchronously so donated train-state buffers stay safe) and the
    epoch loop continues while orbax persists in the background,
  * the training state and its metadata are ONE composite checkpoint under
    one atomic directory rename — a preemption can never leave a state/
    sidecar mismatch,
  * optional step-granular `latest` saves carry {step_in_epoch, running
    metric sums} so a preempted job resumes MID-epoch and reproduces the
    uninterrupted metrics trajectory (tests/test_integration.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoint_dir: Path | str):
        self.dir = Path(checkpoint_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())

    # -- full training state ------------------------------------------------

    def save_state(
        self,
        name: str,
        state: Any,
        *,
        epoch: int,
        best_val_acc: float,
        metrics_history: dict,
        step_in_epoch: int | None = None,
        epoch_sums: dict | None = None,
        block: bool = False,
    ) -> Path:
        """Async atomic save of (state, metadata) as one composite tree.

        `step_in_epoch`/`epoch_sums` mark a MID-epoch checkpoint: resume
        restarts the same epoch at that batch offset with the recorded
        running metric sums (step-granular preemption recovery).
        """
        path = self.dir / name
        # serialize overlapping writes; a no-op when the previous save is
        # already durable
        self._ckptr.wait_until_finished()
        custom = {
            "epoch": epoch,
            "best_val_acc": best_val_acc,
            "metrics_history": metrics_history,
            "step_in_epoch": step_in_epoch,
            "epoch_sums": epoch_sums,
        }
        self._ckptr.save(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                custom=ocp.args.JsonSave(custom),
            ),
            force=True,
        )
        if block:
            self._ckptr.wait_until_finished()
        return path

    def wait(self) -> None:
        """Block until every enqueued save is durable (end of training /
        before process exit)."""
        self._ckptr.wait_until_finished()

    def restore_state(self, name_or_path: str, template_state: Any):
        """Returns (state, custom) with custom = {epoch, best_val_acc,
        metrics_history, step_in_epoch, epoch_sums}."""
        path = Path(name_or_path)
        if not path.is_absolute():
            path = self.dir / name_or_path
        restored = self._ckptr.restore(
            path.absolute(),
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template_state),
                custom=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], dict(restored["custom"])

    # -- weights-only export (eval contract) --------------------------------

    def save_weights(self, filename: str, params: Any, epoch: int) -> Path:
        """Flat .npz export of model params (the torch `best_model.pth`
        weights-only artifact, reference `trainer.py:105-111`)."""
        flat = {}
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            key = "/".join(
                getattr(k, "key", getattr(k, "name", str(k))) for k in kp
            )
            flat[key] = np.asarray(leaf)
        path = self.dir / filename
        np.savez(path, __epoch__=epoch, **flat)
        return path

    def load_weights(self, path: Path | str, template_params: Any):
        """Restore a weights-only export onto a param-tree template."""
        with np.load(Path(path)) as z:
            flat = {k: z[k] for k in z.files if k != "__epoch__"}
            epoch = int(z["__epoch__"])

        leaves, treedef = jax.tree_util.tree_flatten_with_path(template_params)
        out = []
        consumed = set()
        for kp, leaf in leaves:
            key = "/".join(
                getattr(k, "key", getattr(k, "name", str(k))) for k in kp
            )
            if key not in flat:
                raise ValueError(f"checkpoint is missing parameter '{key}'")
            arr = flat[key]
            if arr.shape != leaf.shape:
                raise ValueError(f"{key}: shape {arr.shape} != {leaf.shape}")
            consumed.add(key)
            out.append(arr.astype(leaf.dtype))
        extra = sorted(set(flat) - consumed)
        if extra:
            # a checkpoint with leftover parameters belongs to a DIFFERENT
            # architecture (e.g. deeper model whose early blocks happen to
            # match shapes) — loading it silently would evaluate the wrong
            # model; the config snapshot next to the checkpoint is the
            # train/eval contract (reference eval.py:21-31)
            raise ValueError(
                "checkpoint has parameters absent from the model "
                f"(architecture mismatch): {extra[:6]}"
                f"{'...' if len(extra) > 6 else ''}"
            )
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template_params), out
        )
        return params, epoch
