"""Stage-by-stage profile of the BASD train step on the current backend.

Usage:
    python tools/profile_step.py                      # Table-3 workload
    python tools/profile_step.py --imagenet           # Table-1 workload
    python tools/profile_step.py --img 224 --batch 256 --student vit_small_patch16

Reports per-stage times so kernel work (Pallas candidates) is targeted at
measured hot spots, not guesses.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

# same persistent compile cache as bench.py — stage programs are large and
# the remote transport's compile round-trips are slow
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from basd_tpu.losses import basd_loss, extraction_points, init_selector
from basd_tpu.losses.selector import select_and_mix
from basd_tpu.models import create_student, load_teacher
from basd_tpu.models.teacher import extract_intermediates
from basd_tpu.ops.mixup import mixup_cutmix
from basd_tpu.ops.preprocess import dual_view


def timeit(f, *args, n=30):
    """Per-call time via the queue-drain slope.

    On the remote TPU transport `block_until_ready` returns before remote
    execution completes — only a device->host VALUE fetch truly
    synchronizes (~33 ms RTT; see bench.py). The device executes enqueued
    programs in order, so (time of k2 calls + fetch) - (time of k1 calls +
    fetch) over (k2 - k1) cancels both the RTT and dispatch overhead."""
    first = jax.tree_util.tree_leaves(f(*args))[0]
    np.asarray(jax.device_get(first.ravel()[0]))  # compile + settle

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = f(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))  # value fetch = sync
        return time.perf_counter() - t0

    run(3)  # warm the dispatch path
    t_small = run(5)
    t_big = run(5 + n)
    return (t_big - t_small) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imagenet", action="store_true",
                    help="Table-1 workload: ViT-Small 224px batch 256")
    ap.add_argument("--cross-arch", action="store_true",
                    help="Table-2 workload: ConvNeXt-V2-Tiny teacher -> "
                    "ViT-Tiny student, 224px batch 256 (bench.py "
                    "--cross-arch shapes)")
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--student", default=None)
    ap.add_argument("--teacher", default="dinov2_vitb14")
    ap.add_argument("--n", type=int, default=None, help="timed calls per stage")
    ap.add_argument("--only", default=None,
                    help="comma-separated stage-name substrings to run "
                    "(e.g. 'teacher,student fwd+bwd')")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable gradient checkpointing on the student "
                    "(bench.py --imagenet runs remat OFF; the default here "
                    "keeps the historical remat-on stage numbers comparable)")
    args = ap.parse_args()

    wanted = (
        [s.strip() for s in args.only.split(",")] if args.only else None
    )

    def stage_on(name: str) -> bool:
        return wanted is None or any(w in name for w in wanted)

    if args.imagenet:
        img_size, batch, num_classes = 224, 256, 1000
        student_name, patch_override = "vit_small_patch16", None
        remat, n = True, 8
    elif args.cross_arch:
        img_size, batch, num_classes = 224, 256, 1000
        student_name, patch_override = "vit_tiny_patch16", None
        args.teacher = (
            "convnextv2_tiny" if args.teacher == "dinov2_vitb14"
            else args.teacher
        )
        remat, n = True, 8
    else:
        img_size, batch, num_classes = 32, 128, 100
        student_name, patch_override = "vit_tiny_patch16", 4
        remat, n = False, 30
    img_size = args.img or img_size
    batch = args.batch or batch
    student_name = args.student or student_name
    n = args.n or n
    if args.no_remat:
        remat = False
    global timeit
    _timeit = timeit
    timeit = lambda f, *a: _timeit(f, *a, n=n)

    t0 = time.perf_counter()
    teacher = load_teacher(args.teacher, img_size=img_size, dtype=jnp.bfloat16)
    print(f"teacher init: {time.perf_counter() - t0:.1f}s")

    points = extraction_points(12, 4)
    overrides = {"patch_size": patch_override} if patch_override else None
    student, cfg = create_student(
        student_name, num_classes=num_classes, drop_path_rate=0.05,
        img_size=img_size, arch_overrides=overrides,
        capture_layers=points, dtype=jnp.bfloat16, remat=remat,
    )
    selector = init_selector(
        jax.random.PRNGKey(1), len(points), cfg.embed_dim, teacher.spec.embed_dim
    )
    t0 = time.perf_counter()
    variables = jax.jit(lambda r, x: student.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3))
    )
    params = variables["params"]
    print(f"student init: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    # same raw-size formula as bench.py (eval_crop_ratio resolver: raw =
    # img + 2*patch) so stage profiles attribute the SAME input pipeline
    # the headline bench runs
    raw = img_size + 2 * cfg.patch_size
    u8 = jnp.asarray((rng.random((batch, raw, raw, 3)) * 255).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, batch, dtype=np.int32))
    key = jax.random.PRNGKey(0)

    kwargs = dict(
        img_size=img_size, crop_ratio=img_size / raw,
        teacher_stats=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        dataset_stats=((0.5,) * 3, (0.25,) * 3),
    )

    f_view = jax.jit(lambda u, k: dual_view(u, k, **kwargs))
    if stage_on("dual_view"):
        print(f"dual_view:        {timeit(f_view, u8, key):7.3f} ms")

    clean, aug = f_view(u8, key)
    f_mix = jax.jit(
        lambda a, l, k: mixup_cutmix(a, l, k, num_classes=num_classes)
    )
    if stage_on("mixup_cutmix"):
        print(f"mixup_cutmix:     {timeit(f_mix, aug, labels, key):7.3f} ms")

    f_teacher = jax.jit(
        lambda v, x: extract_intermediates(teacher._replace(variables=v), x)
    )
    if stage_on("teacher forward"):
        print(f"teacher forward:  {timeit(f_teacher, teacher.variables, clean):7.3f} ms")
    t_tokens, t_imp = f_teacher(teacher.variables, clean)

    f_student = jax.jit(
        lambda p, x, k: student.apply(
            {"params": p}, x, train=True, rngs={"droppath": k}
        ).logits
    )
    if stage_on("student fwd:"):
        print(f"student fwd:      {timeit(f_student, params, aug, key):7.3f} ms")

    def ce_only(p, x, l, k):
        out = student.apply({"params": p}, x, train=True, rngs={"droppath": k})
        return jnp.mean(
            -jax.nn.log_softmax(out.logits)[jnp.arange(batch), l]
        )

    f_ce_grad = jax.jit(jax.grad(ce_only))
    if stage_on("student fwd+bwd"):
        print(f"student fwd+bwd (CE): {timeit(f_ce_grad, params, aug, labels, key):7.3f} ms")

    if stage_on("selector fwd"):
        f_select = jax.jit(
            lambda sel, s_tok, t_tok, t_i: select_and_mix(sel, s_tok, t_tok, t_i)[0]
        )
        out = student.apply({"params": params}, aug, train=False)
        print(f"selector fwd:     {timeit(f_select, selector, out.tokens, t_tokens, t_imp):7.3f} ms")

    onehot = jax.nn.one_hot(labels, num_classes)

    # differentiate only the trainable leaves (student params + selector
    # temperatures), exactly like the production train step — the frozen
    # projection buffers must not receive tangents
    def full_loss(p, log_temps, x, oh, k):
        sel = selector._replace(log_temperatures=log_temps)
        o = student.apply({"params": p}, x, train=True, rngs={"droppath": k})
        loss, _ = basd_loss(
            sel, o.logits, oh, o.tokens, t_tokens, t_imp,
            label_smoothing=0.01,
        )
        return loss

    if stage_on("full loss"):
        f_full_grad = jax.jit(jax.grad(full_loss, argnums=(0, 1)))
        print(f"full loss fwd+bwd: {timeit(f_full_grad, params, selector.log_temperatures, aug, onehot, key):7.3f} ms")


if __name__ == "__main__":
    main()
