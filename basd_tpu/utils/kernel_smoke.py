"""Self-healing Pallas dispatch: tiny-shape Mosaic smoke-compiles.

Every fused kernel in the framework ships with an XLA fallback behind an
env-var policy (`BASD_TPU_ATTENTION`, `BASD_TPU_WARP`, ...). Mosaic
availability is a property of the live backend/toolchain that cannot be
proven from a CPU test environment, so long-running entrypoints (bench,
the driver's entry compile check) call `validate_kernel_dispatches()`
once up front: each kernel is compiled and executed at a tiny real
shape; any failure flips THAT kernel's policy to `xla` for the process
and is reported — one miscompiling kernel degrades performance instead
of killing the run. Compile results land in the persistent XLA cache,
so repeat validations are ~free.

`tools/smoke_kernels.py` is the standalone CLI over the same checks.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _attention(interpret):
    from basd_tpu.ops.attention import fused_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((4, 33, 64)), jnp.bfloat16)
    return jax.jit(
        lambda q: fused_attention(q, q, q, 32, interpret=interpret)
    )(q)


def _attention_bwd(interpret):
    from basd_tpu.ops.attention import fused_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((4, 33, 64)), jnp.bfloat16)

    def loss(q, k, v):
        o = fused_attention(q, k, v, 32, interpret)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)


def _warp(interpret):
    from basd_tpu.ops.warp_kernel import fused_geometric_warp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    a = jnp.asarray([0.0, 0.3, -0.8, 1.6], jnp.float32)
    z = jnp.zeros((4,), jnp.float32)
    return jax.jit(
        lambda x: fused_geometric_warp(
            x, a, z, z, z, z, None, interpret=interpret)
    )(x)


def _jacobi(interpret):
    from basd_tpu.spectral.pallas_jacobi import pallas_jacobi_eigh

    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 32, 32)).astype(np.float32)
    a = jnp.asarray(a @ a.transpose(0, 2, 1))
    return jax.jit(
        lambda a: pallas_jacobi_eigh(a, sweeps=4, interpret=interpret)
    )(a)


# (name, policy env var flipped to "xla" on failure, check fn, auto_on).
# Round-5 adjudication: every kernel that survives ships with auto_on
# (the five pending outage-built kernels all lost their in-context
# hardware A/Bs and were deleted — docs/DESIGN.md section 9).
KERNEL_CHECKS = (
    ("attention", "BASD_TPU_ATTENTION", _attention, True),
    ("attention_bwd", "BASD_TPU_ATTENTION", _attention_bwd, True),
    ("warp", "BASD_TPU_WARP", _warp, True),
    ("jacobi", "BASD_TPU_JACOBI", _jacobi, True),
)


def validate_kernel_dispatches(
    *, interpret: bool = False, verbose: bool = True
) -> dict:
    """Smoke-compile every Pallas kernel; flip failures to their XLA
    fallback via the policy env var. Returns {name: error string} for
    failures (empty dict = all good). No-op on non-TPU backends unless
    `interpret` (auto dispatch already falls back there)."""
    if not interpret:
        try:
            if jax.default_backend() != "tpu":
                return {}
        except RuntimeError:  # pragma: no cover
            return {}
    failures: dict[str, str] = {}
    for name, env, fn, auto_on in KERNEL_CHECKS:
        setting = os.environ.get(env)
        if setting == "xla":
            continue  # already forced off (possibly by an earlier failure)
        if (
            not interpret
            and not auto_on
            and setting not in ("fused", "fused_interpret")
        ):
            continue  # pending-measurement kernel: cannot dispatch on auto
            # (interpret-mode validation still covers every kernel)
        try:
            out = fn(interpret)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf.ravel()[0]))
            if verbose:
                print(f"kernel_smoke {name} ok", flush=True)
        except Exception as e:  # noqa: BLE001 — any failure means: use XLA
            failures[name] = f"{type(e).__name__}: {e}"
            os.environ[env] = "xla"
            if verbose:
                print(
                    f"kernel_smoke {name} FAILED -> {env}=xla "
                    f"({type(e).__name__})",
                    flush=True,
                )
    return failures
