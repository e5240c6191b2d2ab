"""Orbax-backed checkpointing: best/latest policy, resume, weights export.

Reference policy (`src/training/trainer.py:94-123, 201-208`, SURVEY.md 5.4):
  * full training state under `{output_dir}/{run}/checkpoints/{name}`
    (params, optimizer z/v iterates, selector temperatures, PRNG, step)
    plus a sidecar with {epoch, best_val_acc, metrics_history},
  * `best_model` saved on val-acc improvement, `latest` every epoch,
  * weights-only `best_model.pth`-equivalent exports for eval,
  * resume returns epoch + 1.

Async-save-capable via orbax (preemption-aware: `latest` always points to a
complete checkpoint because orbax writes are atomic renames).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoint_dir: Path | str):
        self.dir = Path(checkpoint_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- full training state ------------------------------------------------

    def save_state(
        self,
        name: str,
        state: Any,
        *,
        epoch: int,
        best_val_acc: float,
        metrics_history: dict,
    ) -> Path:
        path = self.dir / name
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()
        custom = {
            "epoch": epoch,
            "best_val_acc": best_val_acc,
            "metrics_history": metrics_history,
        }
        with open(self.dir / f"{name}_custom_state.json", "w") as f:
            json.dump(custom, f)
        return path

    def restore_state(self, name_or_path: str, template_state: Any):
        """Returns (state, start_epoch, best_val_acc, metrics_history).
        start_epoch = saved epoch + 1 (reference `trainer.py:113-123`)."""
        path = Path(name_or_path)
        if not path.is_absolute():
            path = self.dir / name_or_path
        state = self._ckptr.restore(path.absolute(), template_state)
        sidecar = path.parent / f"{path.name}_custom_state.json"
        with open(sidecar) as f:
            custom = json.load(f)
        return (
            state,
            custom["epoch"] + 1,
            custom["best_val_acc"],
            custom["metrics_history"],
        )

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
        for kp, leaf in leaves:
            key = "/".join(
                getattr(k, "key", getattr(k, "name", str(k))) for k in kp
            )
            arr = flat[key]
            if arr.shape != leaf.shape:
                raise ValueError(f"{key}: shape {arr.shape} != {leaf.shape}")
            out.append(arr.astype(leaf.dtype))
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template_params), out
        )
        return params, epoch
