"""Measure the reference's (PyTorch BASD) train-step time on a CUDA GPU.

BASELINE.md's north-star target is "TPU v5e step time >= 5x faster than the
reference GPU step", but the reference never instruments its own step time
(`/root/reference/src/evaluation/metrics.py` only times inference). This
harness makes the target checkable: run it on a CUDA machine with the
reference's own dependencies installed and it times the reference's REAL
hot loop — it constructs the reference's `Trainer` unmodified (compile,
Accelerate prepare, MixUp/CutMix, ScheduleFree — `src/training/trainer.py:
41-92`) and times `Trainer._train_epoch` (`:125-169`) over pre-staged
device batches on the same Table-3 workload this repo's `bench.py` reports
(batch 128, img 32, DeiT-Tiny student, DINOv2 ViT-B/14 teacher, 4
extraction points).

Usage (on the GPU host):

    git clone https://github.com/indrajeetadityaroy9/vit-inductive-bias-distillation ref
    cd ref && pip install -e .          # torch+CUDA, timm, schedulefree, hydra
    python /path/to/tools/reference_gpu_baseline.py --reference ./ref

Prints ONE JSON line with the same schema as our `bench.py`:

    {"metric": "reference_gpu_step_time", "value": <ms>, "unit": "ms", ...}

Methodology notes (mirrors bench.py so the comparison is honest):
- synthetic inputs, fixed seed, shapes identical to bench.py;
- dual views pre-staged on device: the reference's host dataloader cost is
  excluded, which *favors* the reference (our TPU number includes the
  on-device dual-view normalization + augmentation);
- one throwaway `_train_epoch` pass for torch.compile(max-autotune)
  warmup, then the timed pass bracketed by `torch.cuda.synchronize` —
  the CUDA analogue of our chained-slope fetch timing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True, help="path to the reference checkout")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--teacher", default="dinov2_vitb14")
    p.add_argument("--num-classes", type=int, default=100)
    args = p.parse_args()

    import torch

    if not torch.cuda.is_available():
        print(
            json.dumps(
                {
                    "metric": "reference_gpu_step_time",
                    "value": None,
                    "unit": "ms",
                    "error": "CUDA unavailable - run this on the reference's GPU host",
                }
            )
        )
        return 1

    sys.path.insert(0, str(Path(args.reference).resolve()))
    from accelerate import Accelerator
    from omegaconf import OmegaConf

    from src.models.teacher import load_teacher, probe_model
    from src.train import _create_student
    from src.training.trainer import Trainer

    torch.manual_seed(0)
    torch.set_float32_matmul_precision("high")
    torch.backends.cudnn.benchmark = True

    config = OmegaConf.create(
        {
            "run": {"output_dir": "/tmp/ref_baseline", "name": "baseline"},
            "model": {"num_classes": args.num_classes},
            "training": {
                "learning_rate": 5e-4,
                "weight_decay": 0.05,
                "label_smoothing": 1.0 / args.num_classes,
            },
            "basd": {"num_extraction_points": 4},
        }
    )
    teacher = load_teacher(args.teacher, img_size=args.img)
    student = _create_student(
        "deit_tiny_patch16_224",
        num_classes=args.num_classes,
        drop_path_rate=0.0,
        img_size=args.img,
        arch_overrides={"patch_size": 4},
    )
    student_info = probe_model(student, img_size=args.img)
    trainer = Trainer(
        student,
        config,
        Accelerator(mixed_precision="bf16"),
        teacher,
        student_info=student_info,
    )

    gen = torch.Generator(device="cuda").manual_seed(0)

    def batches(n: int) -> list[dict]:
        return [
            {
                "clean": torch.rand(
                    (args.batch, 3, args.img, args.img), device="cuda", generator=gen
                ),
                "augmented": torch.rand(
                    (args.batch, 3, args.img, args.img), device="cuda", generator=gen
                ),
                "label": torch.randint(
                    0, args.num_classes, (args.batch,), device="cuda", generator=gen
                ),
            }
            for _ in range(n)
        ]

    trainer.optimizer.train()
    trainer.model.train()
    trainer._train_epoch(batches(args.warmup))  # compile/autotune warmup
    torch.cuda.synchronize()

    timed = batches(args.steps)
    t0 = time.perf_counter()
    trainer._train_epoch(timed)
    torch.cuda.synchronize()
    ms = (time.perf_counter() - t0) * 1e3 / args.steps

    print(
        json.dumps(
            {
                "metric": "reference_gpu_step_time",
                "value": round(ms, 3),
                "unit": "ms",
                "detail": {
                    "batch": args.batch,
                    "img": args.img,
                    "teacher": args.teacher,
                    "student": "deit_tiny_patch4",
                    "gpu": torch.cuda.get_device_name(0),
                    "img_per_sec": round(args.batch / (ms / 1e3), 1),
                    "steps": args.steps,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
