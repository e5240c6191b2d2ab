"""Train entrypoint: the full BASD pipeline (reference `src/train.py`).

    python -m basd_tpu.train experiment=basd_cifar100 training.num_epochs=10

Stages (reference `main`, `train.py:73-160`, preserved order):
teacher load -> intrinsic-dim calibration -> teacher-derived student
architecture -> data arrays + channel stats -> trainer (jitted step over the
device mesh) -> config snapshot -> optional resume -> train -> final eval
suite -> metrics.json.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.config import compose_config, save_config
from basd_tpu.data.datasets import (
    dataset_info,
    get_channel_stats,
    load_split_arrays,
)
from basd_tpu.evaluation.metrics import run_eval_suite, save_metrics
from basd_tpu.losses import extraction_points
from basd_tpu.models import (
    create_student,
    derive_student_arch,
    estimate_intrinsic_dim,
    load_teacher,
)
from basd_tpu.ops.preprocess import eval_view
from basd_tpu.parallel.mesh import create_mesh
from basd_tpu.training.trainer import Trainer


def run(config) -> dict:
    output_dir = Path(config.run.output_dir) / config.run.name
    output_dir.mkdir(parents=True, exist_ok=True)

    img_size = config.model.vit.img_size
    dtype = (
        jnp.bfloat16 if config.hardware.precision == "bfloat16" else jnp.float32
    )

    mesh = None
    if jax.device_count() > 1:
        mesh = create_mesh(
            data=config.hardware.mesh.data, model=config.hardware.mesh.model
        )

    teacher = load_teacher(
        config.basd.teacher_model_name, img_size=img_size,
        seed=config.run.seed, dtype=dtype,
    )

    # ---- intrinsic-dim calibration + derived student architecture ----
    # (reference train.py:88-118: runs BEFORE the train step is jitted)
    arch_overrides = dict(config.model.arch_overrides or {})
    if teacher.spec.feature_format == "token" and not arch_overrides:
        tokens_per_image = (img_size // config.model.vit.patch_size) ** 2
        num_calib = math.ceil(10 * teacher.spec.embed_dim / tokens_per_image)
        calib_u8, _ = load_split_arrays(
            config.data.dataset,
            dataset_info(config.data.dataset)["train_split"],
            img_size,
        )
        num_calib = min(num_calib, len(calib_u8))
        calib = eval_view(
            jnp.asarray(calib_u8[:num_calib]),
            img_size,
            config.data.eval_crop_ratio,
            teacher.mean,
            teacher.std,
        )
        intrinsic_dim = estimate_intrinsic_dim(teacher, calib)
        arch_overrides = derive_student_arch(teacher.spec, intrinsic_dim)
        print(
            f"student_arch_derived intrinsic_dim={intrinsic_dim} "
            f"embed_dim={arch_overrides['embed_dim']} "
            f"depth={arch_overrides['depth']} "
            f"num_heads={arch_overrides['num_heads']} "
            f"mlp_ratio={arch_overrides['mlp_ratio']:.1f}"
        )
        config.model.arch_overrides = dict(arch_overrides)

    depth = arch_overrides.get("depth") or None
    if depth is None:
        from basd_tpu.models import resolve_preset

        depth = resolve_preset(config.model.student_preset).depth
    points = extraction_points(depth, config.basd.num_extraction_points)

    student, student_cfg = create_student(
        config.model.student_preset,
        num_classes=config.model.num_classes,
        drop_path_rate=config.model.drop_path_rate,
        img_size=img_size,
        arch_overrides={**arch_overrides,
                        "patch_size": config.model.vit.patch_size},
        capture_layers=points,
        dtype=dtype,
        remat=config.hardware.remat,
    )
    print(
        f"student_created embed_dim={student_cfg.embed_dim} "
        f"depth={student_cfg.depth} num_heads={student_cfg.num_heads} "
        f"num_tokens={student_cfg.num_patches} "
        f"extraction_points={list(points)}"
    )

    # ---- data ----
    info = dataset_info(config.data.dataset)
    train_images, train_labels = load_split_arrays(
        config.data.dataset, info["train_split"], img_size
    )
    val_images, val_labels = load_split_arrays(
        config.data.dataset, info["eval_split"], img_size
    )
    dataset_stats = get_channel_stats(config.data.dataset)

    # ---- subspace-K calibration (basd.subspace_k: auto) ----
    # staged like the intrinsic-dim estimate: measure the teacher's MP ranks
    # once (frozen teacher => stable), size the static K-cap with headroom
    if config.basd.get("subspace_k") == "auto":
        from basd_tpu.losses import calibrate_subspace_k

        calib_n = min(config.data.batch_size, len(train_images))
        calib = eval_view(
            jnp.asarray(train_images[:calib_n]),
            img_size,
            config.data.eval_crop_ratio,
            teacher.mean,
            teacher.std,
        )
        config.basd.subspace_k = calibrate_subspace_k(
            teacher,
            student_cfg.embed_dim,
            calib,
            seed=config.run.seed,
            num_extraction_points=config.basd.num_extraction_points,
        )

    trainer = Trainer(
        config,
        student_module=student,
        student_cfg=student_cfg,
        teacher=teacher,
        teacher_stats=(teacher.mean, teacher.std),
        dataset_stats=dataset_stats,
        mesh=mesh,
    )

    save_config(config, output_dir / "config.yaml")

    start_epoch = 0
    if config.checkpoint.resume_from:
        start_epoch = trainer.load_checkpoint(config.checkpoint.resume_from)

    trainer.train(
        (train_images, train_labels), (val_images, val_labels),
        start_epoch=start_epoch,
    )

    from basd_tpu.parallel.mesh import batch_sharding

    results = run_eval_suite(
        student.apply,
        trainer.eval_model_params(),
        config,
        config_path=str(output_dir / "config.yaml"),
        model=student,
        sharding=batch_sharding(mesh) if mesh is not None else None,
    )
    save_metrics(results, output_dir)
    return results


def main() -> None:
    np.random.seed()  # host-side entropy unused; PRNG is threaded explicitly
    config = compose_config(sys.argv[1:])
    run(config)


if __name__ == "__main__":
    main()
