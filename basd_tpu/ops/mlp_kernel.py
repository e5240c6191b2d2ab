"""Fused transformer MLP half-block (Pallas, TPU).

One VMEM-resident pass computing

    out = x + ls * ( GELU( LN(x) @ W1 + b1 ) @ W2 + b2 )

for x (B, N, D) bf16 — the `norm2 -> mlp -> ls2 -> residual` tail of a
ViT block (`models/vit.py` Block). The XLA graph round-trips x through
HBM for the LayerNorm, the (B, N, 4D) hidden, and the residual add;
holding the slab in VMEM leaves only one read + one write of x per
layer. Weights (W1, W2 — ~9.4 MB bf16 at D=768) ride constant-index
BlockSpecs, so Mosaic keeps them resident across grid steps.

Numerics contract: the kernel replicates the XLA path's exact
dtype chain — flax LayerNorm statistics and affine in fp32 with one
bf16 cast at the end (`flax.linen.normalization._normalize`,
force_float32_reductions), Dense outputs rounded to bf16 before the
bias add, GELU in fp32 via the tanh-form exact erf
(`ops/activations.py`), LayerScale and residual in bf16 — so fused and
XLA dispatches agree to the last bf16 rounding.

Forward-only: dispatched for gradient-free forwards (teacher, eval)
like the fused attention kernel; the train-mode student stays on XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basd_tpu.ops.activations import _ERF_TANH_COEFFS, _INV_SQRT2, _U_CLAMP

_LN_EPS = 1e-6  # flax nn.LayerNorm default epsilon


def _gelu_f32(h):
    u = jnp.clip(h * jnp.float32(_INV_SQRT2), -_U_CLAMP, _U_CLAMP)
    t = u * u
    s = jnp.full_like(u, _ERF_TANH_COEFFS[-1])
    for c in _ERF_TANH_COEFFS[-2::-1]:
        s = s * t + c
    return h * 0.5 * (1.0 + jnp.tanh(u * s))


_MM = (((2,), (0,)), ((), ()))  # (G, N, D) x (D, F) -> (G, N, F)


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ls_ref, o_ref, *, has_ls):
    x = x_ref[:, :, :]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    # flax _compute_stats: mean and mean-of-squares in fp32
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    ln = (xf - mu) * (jax.lax.rsqrt(var + _LN_EPS) * g_ref[0, :])
    ln = (ln + b_ref[0, :]).astype(dt)  # one bf16 cast, like flax
    # Dense: bf16 matmul output, bias added in bf16
    h = jax.lax.dot_general(
        ln, w1_ref[:, :], _MM, preferred_element_type=jnp.float32
    ).astype(dt) + b1_ref[0, :].astype(dt)
    h = _gelu_f32(h.astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(
        h, w2_ref[:, :], _MM, preferred_element_type=jnp.float32
    ).astype(dt) + b2_ref[0, :].astype(dt)
    if has_ls:
        y = y * ls_ref[0, :].astype(dt)
    o_ref[:, :, :] = x + y


def _pick_group(b: int) -> int:
    """BASD_TPU_MLP_G overrides (trace-time, must divide B) so the
    hardware probe can sweep slab sizes."""
    env = (os.environ.get("BASD_TPU_MLP_G") or "").strip()
    if env.isdigit() and int(env) >= 1 and b % int(env) == 0:
        return int(env)
    for g in (8, 4, 2):
        if b % g == 0:
            return g
    return 1


def fused_mlp_block(
    x: jax.Array,  # (B, N, D) bf16
    ln_scale: jax.Array,  # (D,) fp32
    ln_bias: jax.Array,  # (D,) fp32
    w1: jax.Array,  # (D, F) fp32 master (cast to x.dtype like nn.Dense)
    b1: jax.Array,  # (F,)
    w2: jax.Array,  # (F, D)
    b2: jax.Array,  # (D,)
    ls_gamma: jax.Array | None = None,  # (D,) LayerScale, or None
    *,
    interpret: bool = False,
) -> jax.Array:
    b, n, d = x.shape
    f = w1.shape[1]
    g = _pick_group(b)
    dt = x.dtype
    slab = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    has_ls = ls_gamma is not None
    ls_in = ls_gamma if has_ls else jnp.ones((d,), dt)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, has_ls=has_ls),
        grid=(b // g,),
        in_specs=[slab, const(1, d), const(1, d), const(d, f), const(1, f),
                  const(f, d), const(1, d), const(1, d)],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((b, n, d), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * f + 30 * b * n * (d + f),
            bytes_accessed=2 * b * n * d * x.dtype.itemsize
            + 2 * d * f * x.dtype.itemsize,
            transcendentals=b * n * f,
        ),
        interpret=interpret,
    )(x, ln_scale.astype(jnp.float32).reshape(1, d),
      ln_bias.astype(jnp.float32).reshape(1, d),
      w1.astype(dt), b1.reshape(1, f), w2.astype(dt), b2.reshape(1, d),
      ls_in.astype(dt).reshape(1, d))


def mlp_impl() -> str:
    """Policy override via BASD_TPU_MLP in
    {auto, xla, fused, fused_interpret}."""
    return os.environ.get("BASD_TPU_MLP", "auto")


def use_fused_mlp(d: int, train: bool) -> bool:
    """Fused half-block for gradient-free forwards on TPU (teacher,
    eval) — mirrors the fused-attention dispatch policy. Tensor-parallel
    meshes stay on XLA (the island would need a full-D LayerNorm)."""
    impl = mlp_impl()
    if impl == "xla" or train:
        return False
    mesh = _MLP_MESH.get()
    if mesh is not None and mesh.size > 1 and _model_sharded(mesh):
        return False
    if impl in ("fused", "fused_interpret"):
        return True
    if d % 8 != 0:
        return False
    # auto stays on XLA until the in-context hardware stage profile
    # confirms the win (docs/DESIGN.md §7 day-3 "pending measurement").
    # Force with BASD_TPU_MLP=fused; probes A/B explicitly.
    return False


# ---------------------------------------------------------------------------
# Mesh dispatch (same pattern as ops/attention.py)
# ---------------------------------------------------------------------------

import contextlib
import contextvars

from jax.sharding import PartitionSpec as _P

_MLP_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "basd_mlp_mesh", default=None
)


@contextlib.contextmanager
def mlp_mesh(mesh):
    """Scope the ambient device mesh for fused-MLP dispatch."""
    token = _MLP_MESH.set(mesh)
    try:
        yield
    finally:
        _MLP_MESH.reset(token)


def _model_sharded(mesh) -> bool:
    return "model" in mesh.axis_names and mesh.shape["model"] > 1


def fused_mlp_sharded(x, ln_scale, ln_bias, w1, b1, w2, b2,
                      ls_gamma=None, *, interpret: bool = False):
    """`fused_mlp_block` in a batch-sharded shard_map island under a
    multi-device ambient mesh. Tensor-parallel meshes (model axis > 1)
    never reach here — `use_fused_mlp` routes them to the XLA path,
    because the LayerNorm needs the full feature axis."""
    mesh = _MLP_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                               ls_gamma, interpret=interpret)
    params = (ln_scale, ln_bias, w1, b1, w2, b2)
    if ls_gamma is not None:
        params = params + (ls_gamma,)

    def inner(x, *ps):
        ls = ps[6] if len(ps) > 6 else None
        return fused_mlp_block(x, *ps[:6], ls, interpret=interpret)

    data = "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1 \
        else None
    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(_P(data, None, None),) + (_P(),) * len(params),
        out_specs=_P(data, None, None),
        check_vma=False,
    )
    return fn(x, *params)
