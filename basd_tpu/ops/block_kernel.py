"""Whole ViT block as ONE fused Pallas kernel (TPU, forward-only).

    h   = x + ls1 * Proj( Attn( LN1(x) @ Wqkv ) )
    out = h + ls2 * FC2( GELU( FC1( LN2(h) ) ) )

per (G, N, D) batch slab, with the CLS attention row of every head
emitted as a free byproduct (the per-token importance the BASD loss
needs — reference `relational.py:24`). The XLA graph round-trips x
through HBM at every op boundary (~8 tensor passes per layer plus the
(B, N, 3D) qkv and (B, N, 4D) hidden materializations); here x enters
VMEM once and leaves once per LAYER. All weights (~14 MB bf16 at
D=768) ride constant-index BlockSpecs and stay resident across grid
steps.

Numerics: identical contract to the XLA path and the standalone fused
attention kernel — flax-LayerNorm fp32 statistics with one bf16 cast,
Dense bf16 rounding before bias adds, q pre-scaled in fp32 then bf16
(`models/vit.py` Attention), fp32 softmax, tanh-form exact GELU. The
emitted importance shares the attention's own bf16-matmul contract
(the reference captures its attention maps under torch autocast, i.e.
bf16 — `src/models/teacher.py:27-39` — so this is the faithful
contract; the XLA path's fp32 side-recompute is strictly tighter).

Forward-only: dispatched for gradient-free forwards (teacher, eval);
train mode uses the XLA path + the fused attention fwd+bwd kernels.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as _P

from basd_tpu.ops.mlp_kernel import _LN_EPS, _gelu_f32

_MM = (((2,), (0,)), ((), ()))  # (G, N, D) x (D, F) -> (G, N, F)
_BQK = (((2,), (2,)), ((0,), (0,)))  # (G,N,hd) x (G,N,hd) -> (G,N,N)
_BAV = (((2,), (1,)), ((0,), (0,)))  # (G,N,N) x (G,N,hd) -> (G,N,hd)


def _layernorm(x, scale_ref, bias_ref):
    """flax nn.LayerNorm dtype chain: fp32 stats + affine, one bf16
    cast at the end."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    ln = (xf - mu) * (jax.lax.rsqrt(var + _LN_EPS) * scale_ref[0, :])
    return (ln + bias_ref[0, :]).astype(x.dtype)


def _dense(x, w_ref, b_ref):
    """nn.Dense dtype chain: fp32-accumulate matmul rounded to bf16,
    bias added in bf16."""
    y = jax.lax.dot_general(
        x, w_ref[:, :], _MM, preferred_element_type=jnp.float32
    )
    return y.astype(x.dtype) + b_ref[0, :].astype(x.dtype)


def _block_kernel(
    x_ref, n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls1_ref, ls2_ref,
    o_ref, imp_ref, ao_ref, *, head_dim, has_ls,
):
    x = x_ref[:, :, :]
    dt = x.dtype
    d = x.shape[-1]
    scale = head_dim ** -0.5

    # ---- attention half ----
    ln1 = _layernorm(x, n1s_ref, n1b_ref)
    qkv = _dense(ln1, wqkv_ref, bqkv_ref)  # (G, N, 3D)
    for hi_idx, lo in enumerate(range(0, d, head_dim)):
        q = qkv[:, :, lo : lo + head_dim]
        q = (q.astype(jnp.float32) * scale).astype(dt)
        k = qkv[:, :, d + lo : d + lo + head_dim]
        v = qkv[:, :, 2 * d + lo : 2 * d + lo + head_dim]
        s = jax.lax.dot_general(q, k, _BQK, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        eb = e.astype(dt)
        o = jax.lax.dot_general(eb, v, _BAV, preferred_element_type=jnp.float32)
        ao_ref[:, :, lo : lo + head_dim] = (o / denom).astype(dt)
        # CLS attention row (exact softmax row 0), lane-stacked per head
        row = e[:, 0:1, :] / denom[:, 0:1, :]  # (G, 1, N)
        imp_ref[:, :, hi_idx : hi_idx + 1] = jnp.swapaxes(row, 1, 2)
    y = _dense(ao_ref[:, :, :], wproj_ref, bproj_ref)
    if has_ls:
        y = y * ls1_ref[0, :].astype(dt)
    h = x + y

    # ---- MLP half ----
    ln2 = _layernorm(h, n2s_ref, n2b_ref)
    hid = _dense(ln2, w1_ref, b1_ref)
    hid = _gelu_f32(hid.astype(jnp.float32)).astype(dt)
    y2 = _dense(hid, w2_ref, b2_ref)
    if has_ls:
        y2 = y2 * ls2_ref[0, :].astype(dt)
    o_ref[:, :, :] = h + y2


def _pick_group(b: int) -> int:
    """Batch rows per grid step. BASD_TPU_BLOCK_G overrides (trace-time,
    must divide B) so the hardware probe can sweep slab sizes — the
    VMEM working set scales with g while the resident weights (~14 MB
    bf16 at D=768) are amortized across the whole grid either way."""
    env = (os.environ.get("BASD_TPU_BLOCK_G") or "").strip()
    if env.isdigit() and int(env) >= 1 and b % int(env) == 0:
        return int(env)
    return 2 if b % 2 == 0 else 1


def fused_vit_block(
    x: jax.Array,  # (B, N, D) bf16
    params: dict,  # Block-level param pytree (norm1/attn/norm2/mlp[/ls])
    head_dim: int,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (block output (B, N, D), per-head CLS attention rows
    (B, N, H) fp32 — softmax row 0 over keys, lane-stacked by head)."""
    b, n, d = x.shape
    f = params["mlp"]["fc1"]["kernel"].shape[1]
    h = d // head_dim
    g = _pick_group(b)
    dt = x.dtype
    slab = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    imp = pl.BlockSpec((g, n, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    has_ls = "ls1" in params
    v1 = lambda a: a.astype(jnp.float32).reshape(1, -1)
    ls1 = v1(params["ls1"]) if has_ls else jnp.ones((1, d), jnp.float32)
    ls2 = v1(params["ls2"]) if has_ls else jnp.ones((1, d), jnp.float32)
    out, cls = pl.pallas_call(
        functools.partial(_block_kernel, head_dim=head_dim, has_ls=has_ls),
        grid=(b // g,),
        in_specs=[slab, const(1, d), const(1, d), const(d, 3 * d),
                  const(1, 3 * d), const(d, d), const(1, d), const(1, d),
                  const(1, d), const(d, f), const(1, f), const(f, d),
                  const(1, d), const(1, d), const(1, d)],
        out_specs=(slab, imp),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), dt),
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((g, n, d), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n * (8 * d * d + 4 * d * f) + 4 * b * n * n * d,
            bytes_accessed=2 * b * n * d * dt.itemsize,
            transcendentals=b * n * (n * h + f),
        ),
        interpret=interpret,
    )(
        x,
        v1(params["norm1"]["scale"]), v1(params["norm1"]["bias"]),
        params["attn"]["qkv"]["kernel"].astype(dt),
        params["attn"]["qkv"]["bias"].reshape(1, -1),
        params["attn"]["proj"]["kernel"].astype(dt),
        params["attn"]["proj"]["bias"].reshape(1, -1),
        v1(params["norm2"]["scale"]), v1(params["norm2"]["bias"]),
        params["mlp"]["fc1"]["kernel"].astype(dt),
        params["mlp"]["fc1"]["bias"].reshape(1, -1),
        params["mlp"]["fc2"]["kernel"].astype(dt),
        params["mlp"]["fc2"]["bias"].reshape(1, -1),
        ls1, ls2,
    )
    return out, cls


# ---------------------------------------------------------------------------
# Mesh dispatch + policy
# ---------------------------------------------------------------------------

_BLOCK_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "basd_block_mesh", default=None
)


@contextlib.contextmanager
def block_mesh(mesh):
    """Scope the ambient device mesh for fused-block dispatch."""
    token = _BLOCK_MESH.set(mesh)
    try:
        yield
    finally:
        _BLOCK_MESH.reset(token)


def fused_vit_block_sharded(x, params, head_dim, *, interpret=False):
    """`fused_vit_block` in a batch-sharded shard_map island under a
    multi-device ambient mesh (TP meshes never reach here — see
    `use_fused_block`)."""
    mesh = _BLOCK_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fused_vit_block(x, params, head_dim, interpret=interpret)
    data = "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1 \
        else None
    fn = jax.shard_map(
        functools.partial(fused_vit_block, head_dim=head_dim,
                          interpret=interpret),
        mesh=mesh,
        in_specs=(_P(data, None, None), jax.tree_util.tree_map(
            lambda _: _P(), params)),
        out_specs=(_P(data, None, None), _P(data, None, None)),
        check_vma=False,
    )
    return fn(x, params)


def block_impl() -> str:
    """Policy override via BASD_TPU_BLOCK in
    {auto, xla, fused, fused_interpret}."""
    return os.environ.get("BASD_TPU_BLOCK", "auto")


def use_fused_block(n: int, d: int, head_dim: int, has_cls: bool,
                    train: bool) -> bool:
    """Whole-block kernel for gradient-free forwards on TPU with a CLS
    token (the emitted importance is the CLS row); TP meshes stay on
    XLA (LayerNorm needs the full feature axis)."""
    impl = block_impl()
    if impl == "xla" or train or not has_cls:
        return False
    mesh = _BLOCK_MESH.get()
    if mesh is not None and mesh.size > 1 and (
        "model" in mesh.axis_names and mesh.shape["model"] > 1
    ):
        return False
    if impl in ("fused", "fused_interpret"):
        return True
    # same static gate family as the standalone attention kernel
    # (supports_fused): both BASD shapes qualify (D=192 h=3 and
    # D=768 h=12, hd=64)
    if d % head_dim != 0 or head_dim % 16 != 0 or n < 2:
        return False
    # auto stays on XLA until the in-context hardware stage profile
    # confirms the win (docs/DESIGN.md §7 day-3 "pending measurement").
    # Force with BASD_TPU_BLOCK=fused; probes A/B explicitly.
    return False
