"""Dissect the student backward at the Table-1 shape (ViT-Small, b256,
224 px, bf16, remat OFF — the bench composition).

Motivation: profile_step --imagenet --no-remat measures student fwd
22.5 ms (~52% MFU) but fwd+bwd 96.7 ms — bwd alone is 3.3x fwd where
the matmul FLOP ratio says 2x.

Adjudicated 2026-08-19 (v5e, slope-timed; kept as the reference record
for the student stage):
  * patch_embed fwd 0.80 / f+b(w+igrad) 70.4 / WGRAD-ONLY 0.72 ms —
    the XLA:TPU conv backward pathology is ENTIRELY the input-image
    gradient (transposed conv at 16x16/stride-16). Production never
    computes it (the train step differentiates params only), so this
    is a hazard note for saliency/visualization paths, NOT a train-step
    bug. A reshape+dot patchify (parity 1.6e-2 in bf16, exact on CPU)
    is no faster for the wgrad path production pays (0.70 vs 0.72).
  * block fwd 1.83 / f+b 7.10; attn_half f+b 3.89 (the flash-style
    attention VJP recomputes e by design — its ~3x fwd is intrinsic
    and still beats the XLA chain 3.00 vs 3.82); mlp_half f+b 2.77.
    12 x 7.1 + patch + head ~= 96.6 — the whole-model number is the
    SUM of its isolated parts: no cross-block scheduling fat to win.
  * droppath nil (96.2 nodp vs 96.7), eval-mode nil (96.4),
    dots_saveable remat 109.6 (elementwise recompute does not pay).
  Conclusion: the student stage is at XLA's practical floor; the bwd
  ratio above 2x is the flash-VJP recompute + LN/GELU elementwise,
  both already adjudicated (whole-block kernels lost their A/Bs —
  models/vit.py Block docstring).

Block-level grads flow to params AND input x (q-only-style dead-code
hazards — see CLAUDE.md probe laws); whole-model grads are params-only,
matching the production step.
"""

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

import flax.linen as nn

from basd_tpu.models.vit import Attention, Block, Mlp
from basd_tpu.models import create_student
from basd_tpu.losses import extraction_points

SMOKE = os.environ.get("BASD_PROBE_SMOKE") == "1"


def timeit(f, *args, n=20):
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

    if SMOKE:
        return float("nan")
    run(3)
    t_small = run(5)
    t_big = run(5 + n)
    return (t_big - t_small) / n * 1e3


def loss_of(y):
    return jnp.sum(y.astype(jnp.float32) * 1e-4)


def main():
    if SMOKE:
        b, n_tok, d, h, depth, img, patch = 4, 17, 64, 2, 3, 32, 8
    else:
        b, n_tok, d, h, depth, img, patch = 256, 197, 384, 6, 12, 224, 16
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n_tok, d)) * 0.02, dt)
    imgs = jnp.asarray(rng.standard_normal((b, img, img, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    # ---- patch embed alone (conv wgrad suspect) ----
    conv = nn.Conv(d, kernel_size=(patch, patch), strides=(patch, patch),
                   padding="VALID", dtype=dt)
    cp = jax.jit(lambda: conv.init(key, jnp.zeros((1, img, img, 3), dt))
                 )()["params"]
    f_pe = jax.jit(lambda p, im: loss_of(conv.apply({"params": p}, im)))
    g_pe = jax.jit(jax.grad(f_pe, argnums=(0, 1)))
    g_pe_w = jax.jit(jax.grad(f_pe, argnums=0))  # production: no image grad
    print(f"patch_embed fwd:    {timeit(f_pe, cp, imgs):7.3f} ms", flush=True)
    print(f"patch_embed f+b:    {timeit(g_pe, cp, imgs):7.3f} ms", flush=True)
    print(f"patch_embed wgrad:  {timeit(g_pe_w, cp, imgs):7.3f} ms", flush=True)

    # ---- patchify-as-dot equivalent (identical param shapes) ----
    def patchify(p, im):
        kern, bias = p["kernel"], p["bias"]
        bb, hh, ww, cc = im.shape
        x = im.astype(dt).reshape(bb, hh // patch, patch, ww // patch, patch, cc)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bb, -1, patch * patch * cc)
        y = jnp.dot(x, kern.astype(dt).reshape(patch * patch * cc, d),
                    preferred_element_type=dt)
        return y + bias.astype(dt)

    f_dot = jax.jit(lambda p, im: loss_of(patchify(p, im)))
    g_dot_w = jax.jit(jax.grad(f_dot, argnums=0))
    # parity vs the conv lowering (same contraction, fp32 accumulate)
    y_conv = jax.jit(lambda p, im: conv.apply({"params": p}, im))(cp, imgs)
    y_dot = jax.jit(patchify)(cp, imgs)
    diff = float(jnp.max(jnp.abs(
        y_conv.astype(jnp.float32)
        - y_dot.reshape(y_conv.shape).astype(jnp.float32))))
    print(f"patchify parity:    max|conv-dot| = {diff:.3e}", flush=True)
    print(f"patchify fwd:       {timeit(f_dot, cp, imgs):7.3f} ms", flush=True)
    print(f"patchify wgrad:     {timeit(g_dot_w, cp, imgs):7.3f} ms", flush=True)

    # ---- one block (deterministic; x12 ~ whole trunk) ----
    block = Block(d, h, 4.0, 0.0, True, dt)
    bp = jax.jit(lambda: block.init(key, jnp.zeros((1, n_tok, d), dt), True
                                    )["params"])()
    f_blk = jax.jit(lambda p, x: loss_of(block.apply({"params": p}, x, True)[0]))
    g_blk = jax.jit(jax.grad(f_blk, argnums=(0, 1)))
    print(f"block fwd:          {timeit(f_blk, bp, x):7.3f} ms", flush=True)
    print(f"block f+b:          {timeit(g_blk, bp, x):7.3f} ms", flush=True)

    # ---- halves ----
    class AttnHalf(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=dt)(x)
            y, _ = Attention(d, h, True, dt)(y, True)
            return x + y

    class MlpHalf(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=dt)(x)
            return x + Mlp(d, int(d * 4.0), dt)(y)

    for nm, mod in (("attn_half", AttnHalf()), ("mlp_half", MlpHalf())):
        p = jax.jit(lambda mod=mod: mod.init(key, jnp.zeros((1, n_tok, d), dt))
                    ["params"])()
        g = jax.jit(jax.grad(
            lambda p, x, mod=mod: loss_of(mod.apply({"params": p}, x)),
            argnums=(0, 1)))
        print(f"{nm} f+b:      {timeit(g, p, x):7.3f} ms", flush=True)

    # ---- whole student, bench composition (no remat) + ablations ----
    points = extraction_points(depth, 4)

    def student_grad(drop_path, remat, train=True):
        # (a dots_saveable remat policy was also tried here via a
        # temporary factory knob: 109.6 ms vs 96.7 base — elementwise
        # recompute does NOT pay at these shapes; plumbing deleted)
        student, cfg = create_student(
            "vit_small_patch16" if not SMOKE else "vit_tiny_patch16",
            num_classes=1000 if not SMOKE else 10,
            drop_path_rate=drop_path, img_size=img,
            arch_overrides=(None if not SMOKE else
                            {"patch_size": patch, "embed_dim": d,
                             "depth": depth, "num_heads": h}),
            capture_layers=points, dtype=dt, remat=remat,
        )
        params = jax.jit(lambda: student.init(
            key, jnp.zeros((1, img, img, 3)), train=False)["params"])()
        labels = jnp.asarray(rng.integers(0, 10, b, dtype=np.int32))

        def ce(p, im, l, k):
            out = student.apply({"params": p}, im, train=train,
                                rngs={"droppath": k} if train else None)
            return jnp.mean(
                -jax.nn.log_softmax(out.logits)[jnp.arange(b), l])

        return jax.jit(jax.grad(ce)), params, labels

    # Measured 2026-08-19 (v5e, slope-timed): nodp 96.2 / eval 96.4 /
    # dots_saveable-remat 109.6 vs base 96.7 — droppath, train-mode RNG,
    # and the elementwise-recompute policy are all nil or negative; the
    # excess is ENTIRELY the patch-embed conv backward (70.5 ms f+b,
    # 0.69 fwd). Only the base cross-check still runs.
    for nm, kw in (
        ("student f+b base", dict(drop_path=0.05, remat=False)),
    ):
        g, p, l = student_grad(**kw)
        print(f"{nm}: {timeit(g, p, imgs, l, key):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
