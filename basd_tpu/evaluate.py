"""Eval entrypoint: checkpoint-only evaluation (reference `src/eval.py`).

    python -m basd_tpu.evaluate config=outputs/basd_cifar100/config.yaml \
        checkpoint.path=outputs/basd_cifar100/checkpoints/best_model.npz

Rebuilds the student from the run snapshot's `model.arch_overrides`
(the train/eval contract, reference `eval.py:21-27` — the snapshot carries
the teacher-derived architecture), loads a weights-only export, and runs
the full eval suite. Composing from `experiment=...` instead of `config=`
also works when the architecture is fully specified by the experiment.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

from basd_tpu.checkpoint import CheckpointManager
from basd_tpu.config import compose_config, compose_from_snapshot, save_config
from basd_tpu.evaluation.metrics import run_eval_suite, save_metrics
from basd_tpu.models import create_student


def run(config) -> dict:
    output_dir = Path(config.run.output_dir) / config.run.name
    output_dir.mkdir(parents=True, exist_ok=True)

    arch_overrides = dict(config.model.arch_overrides or {})
    student, student_cfg = create_student(
        config.model.student_preset,
        num_classes=config.model.num_classes,
        drop_path_rate=0.0,
        img_size=config.model.vit.img_size,
        arch_overrides={**arch_overrides,
                        "patch_size": config.model.vit.patch_size},
        dtype=jnp.bfloat16
        if config.hardware.precision == "bfloat16"
        else jnp.float32,
        remat=False,
    )

    dummy = jnp.zeros(
        (1, config.model.vit.img_size, config.model.vit.img_size, 3),
        jnp.float32,
    )
    template = jax.jit(
        lambda r, x: student.init(r, x, train=False)
    )(jax.random.PRNGKey(config.run.seed), dummy)["params"]

    ckpt_path = Path(config.checkpoint.path)
    manager = CheckpointManager(ckpt_path.parent)
    params, epoch = manager.load_weights(ckpt_path, template)
    print(f"checkpoint_loaded path={ckpt_path} epoch={epoch}")

    save_config(config, output_dir / "config.yaml")

    sharding = None
    if jax.device_count() > 1:
        from basd_tpu.parallel.mesh import batch_sharding, create_mesh

        mesh = create_mesh(
            data=config.hardware.mesh.data, model=config.hardware.mesh.model
        )
        sharding = batch_sharding(mesh)

    results = run_eval_suite(
        student.apply, params, config,
        config_path=str(output_dir / "config.yaml"),
        model=student,
        sharding=sharding,
    )
    save_metrics(results, output_dir)
    return results


def main() -> None:
    # `config=<run_dir>/config.yaml` evaluates against the run's snapshot —
    # the train/eval contract that carries the teacher-derived student
    # architecture (reference `eval.py:25`); remaining dotted overrides
    # (e.g. `checkpoint.path=...`) apply on top. Without it, the config is
    # composed from the CLI exactly like training.
    args = list(sys.argv[1:])
    snapshot = None
    rest = []
    for ov in args:
        if ov.startswith("config="):
            snapshot = ov.partition("=")[2]
        else:
            rest.append(ov)
    if snapshot is not None:
        config = compose_from_snapshot(snapshot, rest)
    else:
        config = compose_config(args)
    run(config)


if __name__ == "__main__":
    main()
