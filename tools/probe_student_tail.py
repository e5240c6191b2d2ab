"""Attribute the student CE fwd+bwd stage (Table-1: ~the largest single
stage after the teacher) into block halves, at the real bench shapes.

Times jax.grad (wrt params AND input) of:
  * the full capture-4 student with the CE-shaped scalar loss,
  * a 12-deep blocks-only stack from pre-embedded tokens,
  * a 12-deep attention-half-only stack (LN1 + attn + droppath + residual),
  * a 12-deep MLP-half-only stack   (LN2 + mlp  + droppath + residual),
so kernel work targets the measured backward hot spot, not a guess.
All timings use the queue-drain slope (bench.py methodology).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from basd_tpu.losses import extraction_points
from basd_tpu.models import create_student
from basd_tpu.models.vit import Attention, Block, DropPath, Mlp


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


class _Blocks(nn.Module):
    dim: int
    heads: int
    depth: int = 12
    drop_path: float = 0.05

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.depth):
            rate = self.drop_path * i / max(self.depth - 1, 1)
            x, _ = Block(self.dim, self.heads, 4.0, rate, True,
                         jnp.bfloat16, name=f"block{i}")(x, not train)
        return x


class _AttnHalf(nn.Module):
    dim: int
    heads: int
    depth: int = 12
    drop_path: float = 0.05

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.depth):
            rate = self.drop_path * i / max(self.depth - 1, 1)
            y = nn.LayerNorm(dtype=jnp.bfloat16, name=f"norm{i}")(x)
            y, _ = Attention(self.dim, self.heads, True, jnp.bfloat16,
                             name=f"attn{i}")(y, not train)
            x = x + DropPath(rate, name=f"dp{i}")(y, not train)
        return x


class _MlpHalf(nn.Module):
    dim: int
    heads: int
    depth: int = 12
    drop_path: float = 0.05

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.depth):
            rate = self.drop_path * i / max(self.depth - 1, 1)
            y = nn.LayerNorm(dtype=jnp.bfloat16, name=f"norm{i}")(x)
            y = Mlp(self.dim, 4 * self.dim, jnp.bfloat16, name=f"mlp{i}")(y)
            x = x + DropPath(rate, name=f"dp{i}")(y, not train)
        return x


def main():
    img, batch, classes = 224, 256, 1000
    d, heads, n_tok = 384, 6, 197
    points = extraction_points(12, 4)
    rng = np.random.default_rng(0)
    dp_key = jax.random.PRNGKey(7)

    # 1. full student, CE-shaped loss, grads wrt params + input
    student, cfg = create_student(
        "vit_small_patch16", num_classes=classes, img_size=img,
        drop_path_rate=0.05, capture_layers=points, dtype=jnp.bfloat16,
        remat=False,
    )
    variables = jax.jit(lambda r, x: student.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))
    params = variables["params"]
    imgs = jnp.asarray(rng.standard_normal((batch, img, img, 3)) * 0.5,
                       jnp.float32)
    onehot = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, classes, batch)), classes)

    def full_loss(p, x):
        out = student.apply({"params": p}, x, train=True,
                            rngs={"droppath": dp_key})
        ce = -jnp.mean(jnp.sum(
            jax.nn.log_softmax(out.logits) * onehot, axis=-1))
        # captured tokens participate in the real loss graph; stand in
        # with a cheap reduction so their bwd paths stay live
        return ce + 0.0 * jnp.sum(out.tokens.astype(jnp.float32) ** 2)

    f = jax.jit(jax.grad(full_loss, argnums=(0, 1)))
    print(f"student CE f+b (full):   {timeit(f, params, imgs):7.2f} ms",
          flush=True)

    # 2-4. block-stack decompositions from pre-embedded tokens
    x_tok = jnp.asarray(rng.standard_normal((batch, n_tok, d)) * 0.5,
                        jnp.bfloat16)
    for name, mod in (
        ("blocks-only stack", _Blocks(d, heads)),
        ("attention halves", _AttnHalf(d, heads)),
        ("mlp halves", _MlpHalf(d, heads)),
    ):
        p = jax.jit(lambda m=mod: m.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, n_tok, d), jnp.bfloat16), False)["params"])()

        def loss(pp, xx, m=mod):
            out = m.apply({"params": pp}, xx, True,
                          rngs={"droppath": dp_key})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        print(f"{name + ' f+b:':24s} {timeit(g, p, x_tok):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
