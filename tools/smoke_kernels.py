"""Mosaic smoke-compile of every Pallas kernel at small real shapes on
the live backend — run FIRST when hardware returns so an un-compilable
kernel is caught (and its auto-dispatch flipped off) before any bench or
probe runs at full shape. Prints one PASS/FAIL line per kernel."""

from __future__ import annotations

import sys
import traceback
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

INTERPRET = "--interpret" in sys.argv  # CPU self-test of the harness


def check(name, fn):
    try:
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        print(f"PASS {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        traceback.print_exc(limit=3)
        return False


def main():
    rng = np.random.default_rng(0)
    ok = True

    def attention():
        from basd_tpu.ops.attention import fused_attention

        x = jnp.asarray(rng.standard_normal((4, 33, 3, 2, 32)), jnp.bfloat16)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        qf = q.reshape(4, 33, 64)
        return jax.jit(
            lambda q, k, v: fused_attention(q, k, v, 32, interpret=INTERPRET)
        )(qf, qf, qf)

    def block_fwd():
        from basd_tpu.models.vit import Block

        blk = Block(64, 2, 4.0, 0.0, True, jnp.bfloat16)
        xx = jnp.asarray(rng.standard_normal((4, 17, 64)) * 0.5, jnp.bfloat16)
        variables = blk.init(jax.random.PRNGKey(0), xx, True)
        import os

        os.environ["BASD_TPU_BLOCK"] = (
            "fused_interpret" if INTERPRET else "fused")
        try:
            return jax.jit(
                lambda v, x: blk.apply(v, x, True)
            )(variables, xx)
        finally:
            os.environ.pop("BASD_TPU_BLOCK", None)

    def block_train():
        from basd_tpu.ops.block_train import fused_block_train
        from basd_tpu.models.vit import Block

        blk = Block(64, 2, 4.0, 0.0, True, jnp.bfloat16)
        xx = jnp.asarray(rng.standard_normal((4, 17, 64)) * 0.5, jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), xx, True)["params"]
        ones = jnp.ones((4,), jnp.float32)

        def loss(p, x):
            out, _ = fused_block_train(x, p, ones, ones, 32, 1.0, 1.0, INTERPRET)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(params, xx)

    def mlp():
        from basd_tpu.ops.mlp_kernel import fused_mlp_block

        x = jnp.asarray(rng.standard_normal((4, 17, 64)) * 0.5, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((64, 256)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((256, 64)) * 0.05, jnp.float32)
        return jax.jit(
            lambda x: fused_mlp_block(
                x, jnp.ones((64,), jnp.float32), jnp.zeros((64,), jnp.float32),
                w1, jnp.zeros((256,), jnp.float32),
                w2, jnp.zeros((64,), jnp.float32), None,
                interpret=INTERPRET,
            )
        )(x)

    def warp():
        from basd_tpu.ops.warp_kernel import fused_geometric_warp

        x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
        a = jnp.asarray([0.0, 0.3, -0.8, 1.6], jnp.float32)
        z = jnp.zeros((4,), jnp.float32)
        return jax.jit(
            lambda x: fused_geometric_warp(
                x, a, z, z, z, z, None, interpret=INTERPRET)
        )(x)

    def jacobi():
        from basd_tpu.spectral.pallas_jacobi import pallas_jacobi_eigh

        a = rng.standard_normal((6, 32, 32)).astype(np.float32)
        a = jnp.asarray(a @ a.transpose(0, 2, 1))
        return jax.jit(lambda a: pallas_jacobi_eigh(a, sweeps=4, interpret=INTERPRET))(a)

    def subspace():
        from basd_tpu.spectral.subspace_kernel import subspace_iterate

        a = rng.standard_normal((3, 48, 48)).astype(np.float32)
        g = jnp.asarray(a @ a.transpose(0, 2, 1))
        return jax.jit(
            lambda g: subspace_iterate(g, k=8, interpret=INTERPRET)
        )(g)

    def ns_pair():
        from basd_tpu.spectral.ns_sqrt_kernel import ns_sqrt_pair_fused
        from basd_tpu.spectral.ops import _NS_SQRT_SCHED

        a = rng.standard_normal((4, 24, 16)).astype(np.float32)
        g = jnp.asarray(a @ a.transpose(0, 2, 1))
        return jax.jit(
            lambda g: ns_sqrt_pair_fused(
                g, g, _NS_SQRT_SCHED, interpret=INTERPRET)
        )(g)

    for name, fn in [
        ("attention", attention),
        ("block_fwd", block_fwd),
        ("block_train", block_train),
        ("mlp", mlp),
        ("warp", warp),
        ("jacobi", jacobi),
        ("subspace", subspace),
        ("ns_pair", ns_pair),
    ]:
        ok = check(name, fn) and ok

    print("ALL PASS" if ok else "SOME FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
