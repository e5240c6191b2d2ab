"""Ground truth: run the identical batched flip+warp graph on CPU and on
TPU, plus the TPU isolated result, and report who disagrees with whom.
Run once with JAX_PLATFORMS unset (axon/TPU) -> saves /tmp/warp_tpu.npz;
then with JAX_PLATFORMS=cpu -> compares."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build():
    import jax
    import jax.numpy as jnp

    from basd_tpu.ops.augment import _geometric_warp

    b, n = 256, 224
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, n, n, 3)).astype(np.float32))
    op = rng.integers(0, 14, b)
    mag = (rng.integers(0, 31, b) / 30.0) * np.where(rng.random(b) < 0.5, 1, -1)
    angle = np.where(op == 5, mag * 135.0 * np.pi / 180.0, 0).astype(np.float32)
    shx = np.where(op == 1, mag * 0.99, 0).astype(np.float32)
    shy = np.where(op == 2, mag * 0.99, 0).astype(np.float32)
    tx = np.where(op == 3, mag * 32.0, 0).astype(np.float32)
    ty = np.where(op == 4, mag * 32.0, 0).astype(np.float32)
    flip = rng.random(b) < 0.5
    A = jnp.asarray
    fm = A(flip)[:, None, None, None]

    def f(x, a, sx, sy, tx_, ty_):
        return _geometric_warp(
            jnp.where(fm, x[:, :, ::-1, :], x), a, sx, sy, tx_, ty_)

    out = np.asarray(
        jax.jit(f)(x, A(angle), A(shx), A(shy), A(tx), A(ty)))
    iso4 = np.asarray(jax.jit(_geometric_warp)(
        x[4:5], A(angle[4:5]), A(shx[4:5]), A(shy[4:5]), A(tx[4:5]),
        A(ty[4:5])))[0]
    return out, iso4


def main():
    path = Path("/tmp/warp_tpu.npz")
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        out_c, iso_c = build()
        d = np.load(path)
        for tag, a_, b_ in (
            ("cpu-batched vs cpu-iso4   ", out_c[4], iso_c),
            ("cpu-batched vs tpu-batched", out_c[4], d["out"][4]),
            ("cpu-batched vs tpu-iso4   ", out_c[4], d["iso4"]),
            ("tpu-batched vs tpu-iso4   ", d["out"][4], d["iso4"]),
        ):
            print(f"{tag}: {np.abs(a_ - b_).max():.3e}", flush=True)
    else:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parents[1] / ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        out, iso4 = build()
        np.savez(path, out=out, iso4=iso4)
        print("saved", flush=True)


if __name__ == "__main__":
    main()
