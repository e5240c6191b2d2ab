"""Attribute the Table-1 loss tail: time the BASD loss stack fwd and
fwd+bwd wrt (student tokens, logits, log-temps) with the student/teacher
token tensors as INPUTS — isolates selector-bwd + procrustes +
interpolation + UW-SO from the model graphs, which the stage profile
already covers. Also times one optax update on the real param tree."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from basd_tpu.losses import basd_loss, extraction_points, init_selector
from basd_tpu.losses.selector import select_and_mix
from basd_tpu.models import create_student, load_teacher


def timeit(f, *args, n=8):
    first = jax.tree_util.tree_leaves(f(*args))[0]
    np.asarray(jax.device_get(first.ravel()[0]))

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = f(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.perf_counter() - t0

    run(3)
    t_small = run(5)
    t_big = run(5 + n)
    return (t_big - t_small) / n * 1e3


def main():
    # BASD_PROBE_SMOKE=1: tiny shapes + interpret-mode kernels off-TPU —
    # full offline execution of the probe's code path (timings meaningless).
    smoke = os.environ.get("BASD_PROBE_SMOKE") == "1"
    img_size, batch, num_classes = (56, 4, 16) if smoke else (224, 256, 1000)
    teacher = load_teacher("dinov2_vitb14", img_size=img_size,
                           dtype=jnp.bfloat16)
    points = extraction_points(12, 4)
    student, cfg = create_student(
        "vit_small_patch16", num_classes=num_classes, img_size=img_size,
        drop_path_rate=0.05, capture_layers=points, dtype=jnp.bfloat16,
    )
    selector = init_selector(
        jax.random.PRNGKey(1), len(points), cfg.embed_dim,
        teacher.spec.embed_dim,
    )
    rng = np.random.default_rng(0)
    L = len(points)
    n_s = cfg.num_patches + 1
    n_t = teacher.spec.num_tokens(img_size)
    d_s, d_t = cfg.embed_dim, teacher.spec.embed_dim
    s_tok = jnp.asarray(rng.standard_normal((L, batch, n_s, d_s)),
                        jnp.bfloat16)
    t_tok = jnp.asarray(rng.standard_normal((L, batch, n_t, d_t)),
                        jnp.bfloat16)
    t_imp = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((L, batch, n_t)), jnp.float32))
    logits = jnp.asarray(rng.standard_normal((batch, num_classes)),
                         jnp.float32)
    onehot = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, num_classes, batch)), num_classes)

    K = 8 if smoke else 192  # bench.py --imagenet calibrated subspace_k
    f_sel = jax.jit(lambda sel, s, t, ti: select_and_mix(
        sel, s, t, ti, subspace_k=K)[0])
    print(f"selector fwd:        {timeit(f_sel, selector, s_tok, t_tok, t_imp):7.2f} ms",
          flush=True)

    # teacher tensors as ARGS, not closure constants — closed-over
    # 400 MB constants blow the tunnel's remote_compile request limit
    def loss_fn(s, lt, lg, tt, ti, oh):
        sel = selector._replace(log_temperatures=lt)
        loss, _ = basd_loss(sel, lg, oh, s, tt, ti,
                            label_smoothing=0.01, subspace_k=K)
        return loss

    largs = (s_tok, selector.log_temperatures, logits, t_tok, t_imp, onehot)
    f_loss = jax.jit(loss_fn)
    print(f"basd_loss fwd:       {timeit(f_loss, *largs):7.2f} ms",
          flush=True)
    f_grad = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    print(f"basd_loss fwd+bwd:   {timeit(f_grad, *largs):7.2f} ms",
          flush=True)

    # one optimizer update on the real student tree
    import optax

    variables = jax.jit(lambda r, x: student.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)))
    params = variables["params"]
    opt = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = opt.init(params)

    def upd(p, s, g):
        u, s2 = opt.update(g, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u)

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    f_upd = jax.jit(upd)
    print(f"adamw update:        {timeit(f_upd, params, opt_state, grads):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
