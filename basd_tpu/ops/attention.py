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

The backward is a flash-style custom VJP in the same slab layout: the
forward saves per-head (rowmax, denom) as (B, N, H) lane-stacked stats;
the backward recomputes e = exp(s - m) with no reduction passes and takes
the softmax-VJP rowsum from the identity rowsum(dP*P) == rowsum(dO*O)
computed outside on (N, D) data. Measured against the XLA chain with
gradients to ALL of q/k/v (earlier probes differentiated q only, letting
XLA dead-code dk/dv): student shape 3.00 vs 3.82 ms (1.27x), teacher
shape 7.91 vs 15.03 (1.90x).

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


def _fused_fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, d_ref, *,
                      head_dim):
    """One (G, N, D) slab per program; heads = static lane slices. Emits
    per-head softmax stats m, denom as (G, N, H) lane-stacked outputs
    (3 MB at the teacher shape — measured free) so the backward never
    re-reduces."""
    d = q_ref.shape[-1]
    for hi_idx, lo in enumerate(range(0, d, head_dim)):
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
        m_ref[:, :, hi_idx : hi_idx + 1] = m
        d_ref[:, :, hi_idx : hi_idx + 1] = denom


_BROWS = (((1,), (1,)), ((0,), (0,)))  # contract over query rows


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, d_ref, dd_ref,
    dq_ref, dk_ref, dv_ref, *, head_dim,
):
    """Flash-style backward in the same slab layout: recompute
    s = QK^T and e = exp(s - m) from the saved rowmax (no max/sum
    passes); dd = rowsum(dO * O) per head arrives precomputed (an
    (N, D) pass outside, not an (N, N) pass here). Measured vs the XLA
    chain with gradients to ALL of q/k/v: student shape 3.00 vs 3.82 ms
    (1.27x), teacher shape 7.91 vs 15.03 (1.90x)."""
    d = q_ref.shape[-1]
    for hi_idx, lo in enumerate(range(0, d, head_dim)):
        hi = lo + head_dim
        q = q_ref[:, :, lo:hi]
        k = k_ref[:, :, lo:hi]
        v = v_ref[:, :, lo:hi]
        do = do_ref[:, :, lo:hi].astype(jnp.float32)
        m = m_ref[:, :, hi_idx : hi_idx + 1]
        rdenom = 1.0 / d_ref[:, :, hi_idx : hi_idx + 1]
        dd = dd_ref[:, :, hi_idx : hi_idx + 1]
        dt = q.dtype

        s = jax.lax.dot_general(
            q, k, _BQK, preferred_element_type=jnp.float32
        )
        e = jnp.exp(s - m).astype(dt)
        do_scaled = (do * rdenom).astype(dt)
        # dV = P^T dO = e^T (dO / denom)
        dv = jax.lax.dot_general(
            e, do_scaled, _BROWS, preferred_element_type=jnp.float32
        )
        # dp = dP / denom (from the pre-scaled dO), so the softmax-VJP
        # rowsum dd carries the same factor: dS = e * (dP - dd) / denom
        dp = jax.lax.dot_general(
            do_scaled, v, _BQK, preferred_element_type=jnp.float32
        )
        ds = (e.astype(jnp.float32) * (dp - dd * rdenom)).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, _BAV, preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, _BROWS, preferred_element_type=jnp.float32
        )
        dq_ref[:, :, lo:hi] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, lo:hi] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, lo:hi] = dv.astype(dv_ref.dtype)


def _pick_group(b: int) -> int:
    """g=2 measured fastest at both BASD shapes (g=4 slower or VMEM-OOM);
    odd batches fall back to per-element programs."""
    return 2 if b % 2 == 0 else 1


def _specs(b, n, d, h):
    g = _pick_group(b)
    spec = pl.BlockSpec(
        (g, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    stat = pl.BlockSpec(
        (g, n, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return g, spec, stat


def _fwd_call(q, k, v, head_dim: int, *, interpret: bool):
    b, n, d = q.shape
    h = d // head_dim
    g, spec, stat = _specs(b, n, d, h)
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, head_dim=head_dim),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),
        ),
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


def _bwd_call(q, k, v, do, m, denom, dd, head_dim: int, *, interpret: bool):
    b, n, d = q.shape
    h = d // head_dim
    g, spec, stat = _specs(b, n, d, h)
    shape = jax.ShapeDtypeStruct((b, n, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_fused_bwd_kernel, head_dim=head_dim),
        grid=(b // g,),
        in_specs=[spec, spec, spec, spec, stat, stat, stat],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * head_dim,
            bytes_accessed=7 * b * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v, do, m, denom, dd)


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
    o, _, _ = _fwd_call(q, k, v, head_dim, interpret=interpret)
    return o


def _fused_fwd(q, k, v, head_dim, interpret):
    o, m, denom = _fwd_call(q, k, v, head_dim, interpret=interpret)
    return o, (q, k, v, o, m, denom)


def _fused_bwd(head_dim, interpret, res, do):
    q, k, v, o, m, denom = res
    b, n, d = q.shape
    h = d // head_dim
    # softmax-VJP rowsum per head: rowsum(dP * P) == rowsum(dO * O) —
    # an (N, D) pass in plain XLA instead of an (N, N) pass in the kernel
    dd = jnp.sum(
        (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
            b, n, h, head_dim
        ),
        axis=-1,
    )  # (B, N, H)
    return _bwd_call(
        q, k, v, do.astype(q.dtype), m, denom, dd, head_dim,
        interpret=interpret,
    )


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
    tp = mesh.shape["model"] if "model" in mesh.axis_names else 1
    d = q.shape[-1]
    if tp > 1 and (d % tp or (d // tp) % head_dim):
        # tp does not divide the heads: a local shard would split a head
        # and the kernel's static lane slicing would go out of bounds
        # (cryptic Mosaic trace error). Route to the XLA chain instead —
        # GSPMD partitions it fine without an island. (ADVICE r3.)
        return xla_attention_ref(q, k, v, head_dim)
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
    TPU at supported shapes for BOTH gradient-free forwards (frozen
    teacher, eval) and differentiated train-mode forwards (the custom VJP
    runs the flash-style backward kernel: 1.27x over the XLA chain's
    all-gradients fwd+bwd at the student shape, 1.90x at the teacher
    shape). `fused` forces the kernel; `fused_interpret` lets the CPU
    test mesh exercise the real kernel math + island dispatch through the
    Pallas interpreter."""
    return os.environ.get("BASD_TPU_ATTENTION", "auto")


def use_fused(n: int, d: int, head_dim: int, has_cls_token: bool,
              train: bool) -> bool:
    """Trace-time dispatch decision for `models/vit.py`.

    The no-CLS path needs the full normalized attention tensor for its
    importance reduction, which the fused kernel never materializes."""
    del train  # both train and eval forwards dispatch to the kernel
    impl = attention_impl()
    if impl == "xla" or not has_cls_token:
        return False
    if not supports_fused(n, d, head_dim):
        return False
    if impl in ("fused", "fused_interpret"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False
