"""Post-tuning budget split of the BASD step on real TPU (slope timing).

Breaks the headline step into: dual_view+mixup, teacher fwd, student
fwd+bwd(CE), selector fwd, selector fwd+bwd, full loss fwd+bwd, full step.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.losses import basd_loss, extraction_points, init_selector
from basd_tpu.losses.selector import select_and_mix
from basd_tpu.models import create_student, load_teacher
from basd_tpu.models.teacher import extract_intermediates
from basd_tpu.ops.mixup import mixup_cutmix
from basd_tpu.ops.preprocess import dual_view


def slope(f, *args, n1=5, n2=35):
    """Chained-slope ms/call via fori_loop with a data dependency."""
    @jax.jit
    def chained(args, iters):
        def body(_, a0):
            out = f(*a0[1:], a0[0])
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (jnp.sum(leaf) * 0.0).astype(a0[0].dtype)
            return (a0[0] + bump, *a0[1:])
        return jax.lax.fori_loop(0, iters, body, args)

    # rotate so the chained arg is the FIRST element
    args = (args[-1], *args[:-1])

    def run(iters):
        t0 = time.perf_counter()
        r = chained(args, iters)
        float(jnp.sum(r[0]))
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    img_size, batch, num_classes = 32, 128, 100
    teacher = load_teacher("dinov2_vitb14", img_size=img_size, dtype=jnp.bfloat16)
    points = extraction_points(12, 4)
    student, cfg = create_student(
        "vit_tiny_patch16", num_classes=num_classes, drop_path_rate=0.05,
        img_size=img_size, arch_overrides={"patch_size": 4},
        capture_layers=points, dtype=jnp.bfloat16, remat=False,
    )
    selector = init_selector(
        jax.random.PRNGKey(1), len(points), cfg.embed_dim, teacher.spec.embed_dim
    )
    params = jax.jit(lambda r, x: student.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3))
    )["params"]

    rng = np.random.default_rng(0)
    u8 = jnp.asarray((rng.random((batch, 40, 40, 3)) * 255).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, batch, dtype=np.int32))
    key = jax.random.PRNGKey(0)

    kwargs = dict(
        img_size=img_size, crop_ratio=0.8,
        teacher_stats=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        dataset_stats=((0.5,) * 3, (0.25,) * 3),
    )
    clean, aug = jax.jit(partial(dual_view, **kwargs))(u8, key)
    t_tokens, t_imp = jax.jit(
        lambda v, x: extract_intermediates(teacher._replace(variables=v), x)
    )(teacher.variables, clean)
    out0 = jax.jit(lambda p, x: student.apply({"params": p}, x, train=False))(
        params, aug
    )

    print(f"dual_view:         "
          f"{slope(lambda k, u: dual_view(u, k, **kwargs)[0], key, u8):7.3f} ms")
    print(f"teacher fwd:       "
          f"{slope(lambda v, x: extract_intermediates(teacher._replace(variables=v), x)[0], teacher.variables, clean):7.3f} ms")

    def s_fwd(p, x):
        return student.apply({"params": p}, x, train=False).logits
    print(f"student fwd:       {slope(s_fwd, params, aug):7.3f} ms")

    def ce_grad(p, x):
        def f(p):
            o = student.apply({"params": p}, x, train=False)
            return jnp.mean(
                -jax.nn.log_softmax(o.logits)[jnp.arange(batch), labels]
            )
        return jax.grad(f)(p)["cls_token"]
    print(f"student fwd+bwd:   {slope(ce_grad, params, aug):7.3f} ms")

    def sel_fwd(t_tok, t_i, s_tok):
        return select_and_mix(selector, s_tok, t_tok, t_i)[0]
    print(f"selector fwd:      {slope(sel_fwd, t_tokens, t_imp, out0.tokens):7.3f} ms")

    def sel_grad(t_tok, t_i, s_tok):
        def f(s_tok):
            mixed, imp, _ = select_and_mix(selector, s_tok, t_tok, t_i)
            return jnp.sum(mixed.astype(jnp.float32)) + jnp.sum(imp)
        return jax.grad(f)(s_tok)
    print(f"selector fwd+bwd:  {slope(sel_grad, t_tokens, t_imp, out0.tokens):7.3f} ms")

    onehot = jax.nn.one_hot(labels, num_classes)

    def full_grad(p, x):
        def f(p):
            o = student.apply({"params": p}, x, train=False)
            loss, _ = basd_loss(
                selector, o.logits, onehot, o.tokens, t_tokens, t_imp,
                label_smoothing=0.01,
            )
            return loss
        return jax.grad(f)(p)["cls_token"]
    print(f"full loss fwd+bwd: {slope(full_grad, params, aug):7.3f} ms")


if __name__ == "__main__":
    main()
