"""Fused whole-sequence multi-head attention (Pallas, TPU).

Specialized for the short sequences ViT distillation lives at (N ~ 60-260
tokens): each grid program holds a group of G batch elements of one head
with the ENTIRE (N, N) score matrix in VMEM and fuses QK^T -> fp32
softmax -> AV into a single kernel, so the (B, H, N, N) attention tensor
never round-trips HBM. Reference equivalence target: the attention math
of `/root/reference/src/models/teacher.py:27-39` (softmax(QK^T)V with
bf16 matmuls and fp32 softmax arithmetic under torch autocast).

Why not the generic flash_attention: at N ~ 257 the streaming-KV online
softmax pays rescaling traffic it never amortizes (measured 2.5x WORSE in
round 2, docs/DESIGN.md section 6); with the whole row resident in VMEM
the softmax is one max/exp pass and both matmuls read operands already
on-chip.

The kernel is VPU-bound at these shapes (the MXU work is ~0.5 ms/layer at
peak while the softmax element passes are ~1-2 ms), so the design centers
on minimizing VPU passes over (N, N) fp32 data and on exact lane
alignment:

  * exp writes the bf16 probability numerator DIRECTLY (one fused
    sub+exp+cast pass) — no fp32 probability tensor exists;
  * the softmax denominator rides the MXU for free: V gets a ones column
    appended into lanes the (N, 64->128-padded) AV output wastes anyway,
    so rowsum(e) falls out of the AV matmul as column 64;
  * N = 257 is one past the 256-lane boundary (a (N, N) tile pads to 384
    lanes, +50% on every VPU pass). When N % 128 == 1 the kernel splits
    keys into an exactly-aligned [0:N-1] block and a final key handled as
    a VPU rank-1 correction — all (N, N)-scale work runs at 256 lanes;
  * the backward is a custom VJP saving (o, rowmax, denom): dS needs no
    re-softmax (e = exp(s - m) from the saved max), the softmax-VJP
    rowsum collapses to rowsum(dO * O) computed OUTSIDE the kernel on
    (N, hd) data, and P is never materialized (dV = e^T (dO / denom)).

Layout contract: q, k, v arrive as (B, N, H, hd) -- the native layout the
qkv projection's reshape produces (`models/vit.py`). Mosaic needs the
kernel's block last-two dims tile-aligned, so the wrapper transposes to
(B, H, N, hd) around the pallas_call; XLA's layout assignment typically
folds those transposes into the adjacent projection matmuls. q arrives
pre-scaled by hd**-0.5 (matching `models/vit.py`).

Numerics: scores accumulate fp32 on the MXU from bf16 operands, softmax
max/exp run fp32, probabilities are rounded to the input dtype for the AV
matmul with the 1/denom normalization deferred to the fp32 AV output --
the same contract as the XLA path in `models/vit.py` (which additionally
rounds scores to bf16 before the softmax; the kernel keeps them fp32,
strictly more precise). The denominator accumulates the bf16-rounded
numerators in fp32 on the MXU — self-consistent with the numerator the
AV matmul actually uses.
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

# Whole-(N,N)-tile-in-VMEM bound: the per-group fp32 score block plus the
# bf16 numerator and double-buffered I/O must fit VMEM. Every BASD
# workload sits at N <= 257.
MAX_FUSED_SEQ = 512
MAX_FUSED_HEAD_DIM = 128


def supports_fused(n: int, head_dim: int) -> bool:
    """Static shape gate for the fused kernel."""
    return n <= MAX_FUSED_SEQ and head_dim <= MAX_FUSED_HEAD_DIM


def _qkv_spec(g, n, hd):
    """One program reads/writes full-sequence (G, N, hd) slabs — G batch
    elements of one head. G amortizes the per-grid-step pipeline overhead
    that dominates at tiny per-head workloads (measured ~1 us/step: a
    (B, H) grid at B=256, H=12 ran 3072 steps for ~0.5 ms of MXU work)."""
    return pl.BlockSpec(
        (g, 1, n, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )


def _stat_spec(g, n):
    """Per-row softmax stats (B, H, N, 1); last-two block dims (N, 1)
    equal the array dims, satisfying Mosaic's tiling rule."""
    return pl.BlockSpec(
        (g, 1, n, 1), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )


def _pick_group(b: int, n: int, score_bufs: int) -> int:
    """Largest batch group keeping `score_bufs` live fp32 (N, N) buffers
    inside a ~6 MB VMEM budget (the rest goes to double-buffered I/O
    blocks and the bf16 numerator copy)."""
    budget = 6 * 1024 * 1024
    per = score_bufs * n * ((n + 127) // 128 * 128) * 4  # physical fp32 bytes
    g = max(1, min(8, budget // per))
    while b % g:
        g -= 1
    return g


def _split_tail(n: int) -> bool:
    """Key-split policy: when N is one past a 128-lane boundary (ViT
    grids: 256 patches + CLS = 257), peel the last key into a VPU rank-1
    correction so every (N, N)-scale tensor is exactly lane-aligned
    (257 -> 384 physical lanes costs +50% on every VPU pass)."""
    return n % 128 == 1 and n >= 129


def _ones_column(x):
    """Append a ones column (the MXU-denominator lane) to (G, N, hd)."""
    g, n, _ = x.shape
    return jnp.concatenate([x, jnp.ones((g, n, 1), x.dtype)], axis=-1)


_BQK = (((2,), (2,)), ((0,), (0,)))  # q @ k^T per group element
_BAV = (((2,), (1,)), ((0,), (0,)))  # probs @ v per group element
_BROWS = (((1,), (1,)), ((0,), (0,)))  # contract over query rows


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, d_ref):
    q = q_ref[:, 0, :, :]
    k = k_ref[:, 0, :, :]
    v = v_ref[:, 0, :, :]
    dt = q.dtype
    n = q.shape[1]

    if _split_tail(n):
        c = n - 1
        k_main, k_tail = k[:, :c, :], k[:, c:, :]
        v_main, v_tail = v[:, :c, :], v[:, c:, :]
        s = jax.lax.dot_general(
            q, k_main, _BQK, preferred_element_type=jnp.float32
        )  # (G, N, N-1), exactly lane-aligned
        s_tail = jnp.sum(
            q.astype(jnp.float32) * k_tail.astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )  # (G, N, 1)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_tail)
        e = jnp.exp(s - m).astype(dt)
        e_tail = jnp.exp(s_tail - m)
        o_ext = jax.lax.dot_general(
            e, _ones_column(v_main), _BAV, preferred_element_type=jnp.float32
        )  # (G, N, hd+1): AV plus the free rowsum(e) lane
        hd = v.shape[-1]
        denom = o_ext[:, :, hd:] + e_tail
        o = o_ext[:, :, :hd] + e_tail * v_tail.astype(jnp.float32)
    else:
        s = jax.lax.dot_general(
            q, k, _BQK, preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        o_ext = jax.lax.dot_general(
            e, _ones_column(v), _BAV, preferred_element_type=jnp.float32
        )
        hd = v.shape[-1]
        denom = o_ext[:, :, hd:]
        o = o_ext[:, :, :hd]

    o_ref[:, 0, :, :] = (o / denom).astype(o_ref.dtype)
    m_ref[:, 0, :, :] = m
    d_ref[:, 0, :, :] = denom


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, d_ref, dd_ref,
    dq_ref, dk_ref, dv_ref,
):
    """Grads from saved softmax stats: e = exp(s - m) re-derives the bf16
    numerator with no max/sum passes; dd (= rowsum(dO * O), computed
    outside on (N, hd) data) replaces the (N, N) softmax-VJP rowsum."""
    q = q_ref[:, 0, :, :]
    k = k_ref[:, 0, :, :]
    v = v_ref[:, 0, :, :]
    do = do_ref[:, 0, :, :].astype(jnp.float32)
    m = m_ref[:, 0, :, :]
    rdenom = 1.0 / d_ref[:, 0, :, :]
    dd = dd_ref[:, 0, :, :]  # (G, N, 1) fp32
    dt = q.dtype
    n = q.shape[1]
    do_scaled = (do * rdenom).astype(dt)

    if _split_tail(n):
        c = n - 1
        k_main, k_tail = k[:, :c, :], k[:, c:, :]
        v_main, v_tail = v[:, :c, :], v[:, c:, :]
        s = jax.lax.dot_general(
            q, k_main, _BQK, preferred_element_type=jnp.float32
        )
        s_tail = jnp.sum(
            q.astype(jnp.float32) * k_tail.astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )
        e = jnp.exp(s - m).astype(dt)  # (G, N, N-1)
        e_tail = jnp.exp(s_tail - m)  # (G, N, 1) fp32

        # dV = P^T dO = e^T (dO / denom)
        dv_main = jax.lax.dot_general(
            e, do_scaled, _BROWS, preferred_element_type=jnp.float32
        )
        dv_tail = jnp.sum(
            e_tail * do_scaled.astype(jnp.float32), axis=1, keepdims=True
        )
        # dP = dO V^T (split on keys to stay lane-aligned)
        dp = jax.lax.dot_general(
            do, v_main.astype(jnp.float32), _BQK,
            preferred_element_type=jnp.float32,
        )
        dp_tail = jnp.sum(do * v_tail.astype(jnp.float32), axis=-1,
                          keepdims=True)
        # dS = P * (dP - dd)
        ds = (e.astype(jnp.float32) * rdenom * (dp - dd)).astype(dt)
        ds_tail = e_tail * rdenom * (dp_tail - dd)  # (G, N, 1) fp32
        dq = jax.lax.dot_general(
            ds, k_main, _BAV, preferred_element_type=jnp.float32
        ) + ds_tail * k_tail.astype(jnp.float32)
        dk_main = jax.lax.dot_general(
            ds, q, _BROWS, preferred_element_type=jnp.float32
        )
        dk_tail = jnp.sum(
            ds_tail * q.astype(jnp.float32), axis=1, keepdims=True
        )
        dq_ref[:, 0, :, :] = dq.astype(dq_ref.dtype)
        dk_ref[:, 0, :c, :] = dk_main.astype(dk_ref.dtype)
        dk_ref[:, 0, c:, :] = dk_tail.astype(dk_ref.dtype)
        dv_ref[:, 0, :c, :] = dv_main.astype(dv_ref.dtype)
        dv_ref[:, 0, c:, :] = dv_tail.astype(dv_ref.dtype)
    else:
        s = jax.lax.dot_general(
            q, k, _BQK, preferred_element_type=jnp.float32
        )
        e = jnp.exp(s - m).astype(dt)
        dv = jax.lax.dot_general(
            e, do_scaled, _BROWS, preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), _BQK,
            preferred_element_type=jnp.float32,
        )
        ds = (e.astype(jnp.float32) * rdenom * (dp - dd)).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, _BAV, preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, _BROWS, preferred_element_type=jnp.float32
        )
        dq_ref[:, 0, :, :] = dq.astype(dq_ref.dtype)
        dk_ref[:, 0, :, :] = dk.astype(dk_ref.dtype)
        dv_ref[:, 0, :, :] = dv.astype(dv_ref.dtype)


def _to_bhnd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _fwd_call(q, k, v, *, interpret: bool):
    b, n, h, hd = q.shape
    g = _pick_group(b, n, score_bufs=2)
    spec = _qkv_spec(g, n, hd)
    stat = _stat_spec(g, n)
    flops = 4 * b * h * n * n * hd
    o, m, denom = pl.pallas_call(
        _fwd_kernel,
        grid=(b // g, h),
        in_specs=[spec, spec, spec],
        out_specs=(spec, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(_to_bhnd(q), _to_bhnd(k), _to_bhnd(v))
    return _to_bhnd(o), m, denom


def _bwd_call(q, k, v, do, m, denom, dd, *, interpret: bool):
    b, n, h, hd = q.shape
    g = _pick_group(b, n, score_bufs=3)
    spec = _qkv_spec(g, n, hd)
    stat = _stat_spec(g, n)
    shape = jax.ShapeDtypeStruct((b, h, n, hd), q.dtype)
    flops = 10 * b * h * n * n * hd  # 5 (N,N,hd) contractions
    grads = pl.pallas_call(
        _bwd_kernel,
        grid=(b // g, h),
        in_specs=[spec, spec, spec, spec, stat, stat, stat],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=7 * q.size * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(_to_bhnd(q), _to_bhnd(k), _to_bhnd(v), _to_bhnd(do), m, denom, dd)
    return tuple(_to_bhnd(grad) for grad in grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret: bool = False):
    """softmax(q k^T) v per (batch, head); q pre-scaled by hd**-0.5.

    Shapes: q, k, v (B, N, H, hd) -> out (B, N, H, hd), same dtype as q.
    """
    o, _, _ = _fwd_call(q, k, v, interpret=interpret)
    return o


def _fused_fwd(q, k, v, interpret):
    o, m, denom = _fwd_call(q, k, v, interpret=interpret)
    return o, (q, k, v, o, m, denom)


def _fused_bwd(interpret, res, do):
    q, k, v, o, m, denom = res
    # softmax-VJP rowsum: rowsum(dP * P) == rowsum(dO * O) — (N, hd) work
    # in plain XLA instead of an (N, N) pass inside the kernel.
    dd = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (B, N, H)
    dd = jnp.transpose(dd, (0, 2, 1))[..., None]  # (B, H, N, 1)
    dq, dk, dv = _bwd_call(
        q, k, v, do.astype(q.dtype), m, denom, dd, interpret=interpret
    )
    return dq, dk, dv


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Mesh dispatch + implementation policy
# ---------------------------------------------------------------------------

# Ambient mesh for dispatch under multi-device programs (same pattern as
# `spectral/ops.py`): a Pallas kernel inside a GSPMD-partitioned jit must
# live in a manual shard_map island. Attention is embarrassingly parallel
# over (batch, heads) — the island shards batch over 'data' and heads over
# 'model' (matching `parallel/sharding_rules.py`: column-parallel qkv puts
# heads on the model axis), so the kernel runs on exactly the shards GSPMD
# would have given the einsum path, with zero extra collectives.
_ATTENTION_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "basd_attention_mesh", default=None
)


@contextlib.contextmanager
def attention_mesh(mesh):
    """Scope the ambient device mesh for fused-attention dispatch."""
    token = _ATTENTION_MESH.set(mesh)
    try:
        yield
    finally:
        _ATTENTION_MESH.reset(token)


def _island_spec(mesh) -> _P:
    def axis(name):
        return (
            name
            if name in mesh.axis_names and mesh.shape[name] > 1
            else None
        )

    return _P(axis("data"), None, axis("model"), None)


def fused_attention_sharded(q, k, v, interpret: bool = False):
    """`fused_attention`, wrapped in a (batch, heads)-sharded shard_map
    island when tracing under a multi-device ambient mesh."""
    mesh = _ATTENTION_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fused_attention(q, k, v, interpret)
    spec = _island_spec(mesh)
    fn = jax.shard_map(
        functools.partial(fused_attention, interpret=interpret),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def attention_impl() -> str:
    """Implementation policy, overridable via BASD_TPU_ATTENTION in
    {auto, xla, fused, fused_interpret}. 'auto' currently means the XLA
    einsum chain: the in-context Table-1 A/B measured the fused kernel at
    198 ms teacher fwd vs ~176 ms XLA — the (B,N,H,hd)->(B,H,N,hd) HBM
    transposes around the pallas_call cost more than the kernel saves
    (isolated: fused 5.4 ms vs xla 5.9 at the teacher shape). 'fused'
    opts in; `fused_interpret` lets the CPU test mesh exercise the real
    kernel math + island dispatch through the Pallas interpreter."""
    return os.environ.get("BASD_TPU_ATTENTION", "auto")


def use_fused(n: int, head_dim: int, has_cls_token: bool) -> bool:
    """Trace-time dispatch decision for `models/vit.py` (the no-CLS path
    needs the full normalized attention tensor for its importance
    reduction, which the fused kernel never materializes)."""
    impl = attention_impl()
    if impl in ("fused", "fused_interpret"):
        return (
            has_cls_token and supports_fused(n, head_dim)
        )
    return False
