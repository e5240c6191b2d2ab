"""Fused whole-sequence multi-head attention (Pallas, TPU).

Specialized for the short sequences ViT distillation lives at (N ~ 60-260
tokens). Reference equivalence target: the attention math of
`/root/reference/src/models/teacher.py:27-39` (softmax(QK^T)V with bf16
matmuls and fp32 softmax arithmetic under torch autocast).

Design history (probes under tools/, measured on v5e via the axon
transport; all slope-timed):

  * generic flash_attention: 2.5x WORSE at N=257 (round 2) — streaming-KV
    online softmax pays rescaling it never amortizes at short N.
  * (B, H, N, hd)-layout whole-tile kernel (round 3, first cut): 5.4 ms
    isolated vs 5.9 XLA at the teacher shape, but 198 ms vs ~176 in the
    full teacher forward — the HBM transposes into head-major layout
    around the pallas_call cost more than the fused softmax saves.
  * THIS design (lane-sliced slab): the kernel consumes the NATIVE
    (B, N, D) layout the qkv projection produces (D = H * hd, heads
    major) — no transposes exist anywhere. The grid runs over batch
    groups only; each program holds (G, N, D) q/k/v slabs in VMEM and
    carves heads out of the lane dimension with static slices. Per head:
    QK^T (fp32 accumulate) -> rowmax -> exp -> bf16 numerator -> AV with
    the fp32 VPU rowsum denominator. Measured isolated vs the XLA einsum
    chain from the same layout: teacher (256, 257, 12, 64) 2.73 vs
    4.95 ms (1.81x); student (256, 197, 6, 64) 0.77 vs 1.29 ms (1.67x).
    Feature probes (tools/probe_attn_internals.py): the matmuls+exp floor
    is ~3.7 ms at the teacher shape in the head-major layout and every
    normalization trick (MXU ones-column, key-split lane alignment) is a
    wash, so the kernel keeps the plain rowsum.

The kernel is forward-optimized: the production dispatch uses it where no
gradient flows (frozen-teacher forward, eval). Differentiating through it
is CORRECT but not fast — the custom VJP recomputes gradients through the
XLA einsum chain (numerically the same softmax contract), so autodiff
users pay roughly the XLA fwd+bwd cost plus the kernel forward.

Sharding: under a multi-device ambient mesh the wrapper runs the kernel
inside a (batch='data', lanes='model') shard_map island. Column-parallel
qkv puts whole heads contiguously on the model axis (D = H * hd, heads
major), so each shard sees a smaller D carrying complete heads and the
kernel runs on exactly the shards GSPMD would have given the einsum path,
with zero extra collectives.
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

# Whole-(N, N)-tile-in-VMEM bound: fp32 score blocks for a batch group of
# G=2 plus double-buffered (G, N, D) slabs. Every BASD workload sits at
# N <= 257, D <= 1024.
MAX_FUSED_SEQ = 512
MAX_FUSED_HEAD_DIM = 128
MAX_FUSED_WIDTH = 2048


def supports_fused(n: int, d: int, head_dim: int) -> bool:
    """Static shape gate for the fused kernel."""
    return (
        n <= MAX_FUSED_SEQ
        and d <= MAX_FUSED_WIDTH
        and head_dim <= MAX_FUSED_HEAD_DIM
        and head_dim % 16 == 0
        and d % head_dim == 0
    )


_BQK = (((2,), (2,)), ((0,), (0,)))  # (G,N,hd) x (G,N,hd) -> (G,N,N)
_BAV = (((2,), (1,)), ((0,), (0,)))  # (G,N,N) x (G,N,hd) -> (G,N,hd)


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim):
    """One (G, N, D) slab per program; heads = static lane slices."""
    d = q_ref.shape[-1]
    for lo in range(0, d, head_dim):
        hi = lo + head_dim
        q = q_ref[:, :, lo:hi]
        k = k_ref[:, :, lo:hi]
        v = v_ref[:, :, lo:hi]
        dt = q.dtype
        s = jax.lax.dot_general(
            q, k, _BQK, preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e, v, _BAV, preferred_element_type=jnp.float32
        )
        o_ref[:, :, lo:hi] = (o / denom).astype(o_ref.dtype)


def _pick_group(b: int) -> int:
    """g=2 measured fastest at both BASD shapes (g=4 slower or VMEM-OOM);
    odd batches fall back to per-element programs."""
    return 2 if b % 2 == 0 else 1


def _fwd_call(q, k, v, head_dim: int, *, interpret: bool):
    b, n, d = q.shape
    g = _pick_group(b)
    spec = pl.BlockSpec(
        (g, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    h = d // head_dim
    return pl.pallas_call(
        functools.partial(_fused_kernel, head_dim=head_dim),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * head_dim,
            bytes_accessed=4 * b * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v)


def xla_attention_ref(q, k, v, head_dim: int):
    """The models/vit.py einsum-chain numerics contract from (B, N, D):
    logits in the compute dtype, fp32 softmax arithmetic, bf16 numerator,
    normalization deferred to the fp32 AV output. Used as the VJP
    recompute path and as the test oracle."""
    b, n, d = q.shape
    h = d // head_dim
    dt = q.dtype
    qh = q.reshape(b, n, h, head_dim)
    kh = k.reshape(b, n, h, head_dim)
    vh = v.reshape(b, n, h, head_dim)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh, preferred_element_type=dt)
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf - m)
    denom = jnp.sum(e, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", e.astype(dt), vh,
        preferred_element_type=jnp.float32,
    ) / jnp.swapaxes(denom, 1, 2)[..., None]
    return out.astype(dt).reshape(b, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, head_dim: int, interpret: bool = False):
    """Per-head softmax(q k^T) v from the native (B, N, D) layout
    (D = num_heads * head_dim, heads major); q pre-scaled by
    head_dim**-0.5. Output (B, N, D), same dtype as q.
    """
    return _fwd_call(q, k, v, head_dim, interpret=interpret)


def _fused_fwd(q, k, v, head_dim, interpret):
    o = _fwd_call(q, k, v, head_dim, interpret=interpret)
    return o, (q, k, v)


def _fused_bwd(head_dim, interpret, res, do):
    # Gradient through the XLA einsum chain (same numerics contract as the
    # kernel). The production hot paths never differentiate the kernel —
    # training-mode student forwards dispatch to the XLA chain outright
    # (`use_fused`); this keeps autodiff CORRECT for tools and tests.
    q, k, v = res
    _, vjp = jax.vjp(
        functools.partial(xla_attention_ref, head_dim=head_dim), q, k, v
    )
    return vjp(do)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Mesh dispatch + implementation policy
# ---------------------------------------------------------------------------

# Ambient mesh for dispatch under multi-device programs (same pattern as
# `spectral/ops.py`): a Pallas kernel inside a GSPMD-partitioned jit must
# live in a manual shard_map island. Attention is embarrassingly parallel
# over (batch, heads) — the island shards batch over 'data' and the lane
# dimension over 'model' (matching `parallel/sharding_rules.py`: column-
# parallel qkv puts whole heads contiguously on the model axis), with zero
# extra collectives.
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

    return _P(axis("data"), None, axis("model"))


def fused_attention_sharded(q, k, v, head_dim: int, interpret: bool = False):
    """`fused_attention`, wrapped in a (batch, heads)-sharded shard_map
    island when tracing under a multi-device ambient mesh. Each shard
    carries D_local = D / tp lanes = complete heads, so the kernel's
    static head slicing stays valid on the local shape."""
    mesh = _ATTENTION_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fused_attention(q, k, v, head_dim, interpret)
    spec = _island_spec(mesh)
    fn = jax.shard_map(
        functools.partial(
            fused_attention, head_dim=head_dim, interpret=interpret
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def attention_impl() -> str:
    """Implementation policy, overridable via BASD_TPU_ATTENTION in
    {auto, xla, fused, fused_interpret}. 'auto' picks the fused kernel on
    TPU for gradient-free forwards (frozen teacher, eval) at supported
    shapes and the XLA einsum chain everywhere else — training-mode
    student forwards stay on XLA, whose fwd+bwd measured faster than any
    kernel backward at these short sequences. `fused` forces the kernel
    (also for train-mode forwards); `fused_interpret` lets the CPU test
    mesh exercise the real kernel math + island dispatch through the
    Pallas interpreter."""
    return os.environ.get("BASD_TPU_ATTENTION", "auto")


def use_fused(n: int, d: int, head_dim: int, has_cls_token: bool,
              train: bool) -> bool:
    """Trace-time dispatch decision for `models/vit.py`.

    The no-CLS path needs the full normalized attention tensor for its
    importance reduction, which the fused kernel never materializes.
    `train=True` applies are the differentiated student forwards — those
    stay on the XLA chain under 'auto' (see `attention_impl`)."""
    impl = attention_impl()
    if impl == "xla" or not has_cls_token:
        return False
    if not supports_fused(n, d, head_dim):
        return False
    if impl in ("fused", "fused_interpret"):
        return True
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False
    return on_tpu and not train
