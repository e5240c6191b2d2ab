"""Whole ViT block as ONE fused Pallas kernel pair (TPU, fwd + bwd) for
the TRAIN path — the student side of the distillation step.

    h   = x + dp1 * Proj( Attn( LN1(x) @ Wqkv ) )
    out = h + dp2 * FC2( GELU( FC1( LN2(h) ) ) )

The XLA backward for one block issues separate kernels for both
LayerNorm VJPs, the GELU VJP, the droppath masks, the residual adds and
the softmax VJP, each round-tripping (B, N, D)/(B, N, 4D) tensors
through HBM. Here the forward saves exactly four bf16 residual tensors
(qkv, attention output, post-attention tokens, fc1 pre-activation) plus
the per-head softmax stats, and the backward walks the whole chain in
one VMEM-resident pass per batch slab: LayerNorm statistics are
recomputed on the VPU, e = exp(s - m) is recomputed flash-style from the
saved rowmax (the (B, H, N, N) tensor never exists in HBM in either
direction), and all weight/bias/LN gradients accumulate in fp32 VMEM
across the sequential batch grid, written out on the last grid step.

Numerics: forward is the same contract as the XLA path and
`ops/block_kernel.py` (flax fp32 LayerNorm stats, bf16 Dense rounding
before bias adds, fp32 softmax arithmetic with a bf16 numerator, fp32
tanh-form exact GELU). The backward matches jax.grad of the XLA chain
to bf16 tolerance (cotangent rounding points differ where XLA rounds
between kernels; weight grads accumulate per-slab fp32 partials instead
of one monolithic matmul). DropPath masks are sampled OUTSIDE by the
flax module and enter as per-sample {0, 1} vectors, so the kernel stays
deterministic given its inputs.

Scope: plain pre-LN blocks (no LayerScale — students are DeiT-style;
the LayerScale-carrying DINOv2 teachers are frozen and never reach the
train path) with a CLS token. The CLS attention row comes out of the
forward as a stop-gradient byproduct like `block_kernel.py` (the BASD
loss only consumes TEACHER importance — `losses/combined.py`).

Reference equivalence target: one torch-autocast transformer block of
the student under autograd (`/root/reference/src/training/trainer.py:
141-157` differentiates the timm student forward; the per-op math is
`src/models/teacher.py:27-39` attention + timm's Mlp/LayerNorm chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basd_tpu.ops.mlp_kernel import _LN_EPS, _gelu_f32
from basd_tpu.ops.activations import _ERF_TANH_COEFFS, _INV_SQRT2, _U_CLAMP

_MM = (((2,), (0,)), ((), ()))  # (G, N, D) x (D, F) -> (G, N, F)
_MMT = (((2,), (1,)), ((), ()))  # (G, N, F) x (D, F) -> (G, N, D)
_BQK = (((2,), (2,)), ((0,), (0,)))  # (G,N,hd) x (G,N,hd) -> (G,N,N)
_BAV = (((2,), (1,)), ((0,), (0,)))  # (G,N,N) x (G,N,hd) -> (G,N,hd)
_BROWS = (((1,), (1,)), ((0,), (0,)))  # contract over query rows
# (G, N, A) x (G, N, B) -> sum_gn (A, B): weight-grad partial per slab.
# Mosaic's tpu.matmul only lowers a SINGLE contracting dim (hardware
# finding: the two-dim form verifies in interpret mode but fails Mosaic
# verification on a real chip — "lhs contracting dims must be of size
# 1"), so collapse the (slab, token) dims first; merging majormost dims
# is a free relayout.
_WGRAD1 = (((0,), (0,)), ((), ()))  # (GN, A) x (GN, B) -> (A, B)


def _wgrad(a, b):
    g, n, fa = a.shape
    return jax.lax.dot_general(
        a.reshape(g * n, fa), b.reshape(g * n, b.shape[-1]), _WGRAD1,
        preferred_element_type=jnp.float32,
    )


def _ln_fwd_f32(x, scale, bias):
    """flax LayerNorm forward returning the pieces the VJP needs."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    r = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * r
    y = (xhat * scale + bias).astype(x.dtype)
    return y, xhat, r


def _ln_bwd_f32(dy, xhat, r, scale):
    """dx for y = xhat * scale + bias (fp32). Returns (dx_f32,
    dscale_partial (1, D), dbias_partial (1, D)) with the partials
    reduced over (slab, tokens)."""
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = r * (dxhat - m1 - xhat * m2)
    dscale = jnp.sum(dy * xhat, axis=(0, 1)).reshape(1, -1)
    dbias = jnp.sum(dy, axis=(0, 1)).reshape(1, -1)
    return dx, dscale, dbias


def _gelu_grad_f32(h):
    """d/dh of the tanh-form exact GELU (`ops/activations.py`), fp32.
    Analytic derivative of the same composition autodiff differentiates:
    clip grad is a mask, tanh' = 1 - tanh^2, poly by Horner."""
    u = h * np.float32(_INV_SQRT2)
    uc = jnp.clip(u, -_U_CLAMP, _U_CLAMP)
    t = uc * uc
    s = jnp.full_like(uc, _ERF_TANH_COEFFS[-1])
    sp = jnp.zeros_like(uc)
    for c in _ERF_TANH_COEFFS[-2::-1]:
        sp = sp * t + s
        s = s * t + c
    th = jnp.tanh(uc * s)
    inner = s + 2.0 * t * sp  # d(uc * s(uc^2)) / duc
    derf = (1.0 - th * th) * inner * (jnp.abs(u) <= _U_CLAMP)
    phi = 0.5 * (1.0 + th)
    return phi + h * (0.5 * np.float32(_INV_SQRT2)) * derf


def _dense_f(x, w_ref, b_ref, dims=_MM):
    y = jax.lax.dot_general(
        x, w_ref[:, :], dims, preferred_element_type=jnp.float32
    )
    return y.astype(x.dtype) + b_ref[0, :].astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _train_fwd_kernel(
    x_ref, n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, m1_ref, m2_ref,
    o_ref, imp_ref, qkv_ref, ao_ref, x1_ref, h1_ref, mst_ref, dst_ref,
    *, head_dim, keep1, keep2,
):
    x = x_ref[:, :, :]
    dt = x.dtype
    d = x.shape[-1]
    scale = head_dim ** -0.5

    ln1, _, _ = _ln_fwd_f32(x, n1s_ref[0, :], n1b_ref[0, :])
    qkv = _dense_f(ln1, wqkv_ref, bqkv_ref)  # (G, N, 3D)
    qkv_ref[:, :, :] = qkv
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
        mst_ref[:, :, hi_idx : hi_idx + 1] = m
        dst_ref[:, :, hi_idx : hi_idx + 1] = denom
        row = e[:, 0:1, :] / denom[:, 0:1, :]  # CLS softmax row (G, 1, N)
        imp_ref[:, :, hi_idx : hi_idx + 1] = jnp.swapaxes(row, 1, 2)
    y = _dense_f(ao_ref[:, :, :], wproj_ref, bproj_ref)
    if keep1 < 1.0:
        y = jnp.where(m1_ref[:, :, :] > 0.0, y / keep1, jnp.zeros_like(y))
    x1 = x + y
    x1_ref[:, :, :] = x1

    ln2, _, _ = _ln_fwd_f32(x1, n2s_ref[0, :], n2b_ref[0, :])
    h1 = _dense_f(ln2, w1_ref, b1_ref)
    h1_ref[:, :, :] = h1
    h2 = _gelu_f32(h1.astype(jnp.float32)).astype(dt)
    y2 = _dense_f(h2, w2_ref, b2_ref)
    if keep2 < 1.0:
        y2 = jnp.where(m2_ref[:, :, :] > 0.0, y2 / keep2, jnp.zeros_like(y2))
    o_ref[:, :, :] = x1 + y2


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _train_bwd_kernel(
    x_ref, qkv_ref, ao_ref, x1_ref, h1_ref, mst_ref, dst_ref,
    m1_ref, m2_ref, do_ref,
    n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dx_ref, dn1s_ref, dn1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
    dbproj_ref, dn2s_ref, dn2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dqkv_scr,
    *, head_dim, keep1, keep2,
):
    first = pl.program_id(0) == 0
    x = x_ref[:, :, :]
    dt = x.dtype
    d = x.shape[-1]
    scale = head_dim ** -0.5

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:, :] = jnp.zeros_like(ref)

        ref[:, :] += val

    # ---- MLP half backward ----
    x1 = x1_ref[:, :, :]
    _, xhat2, r2 = _ln_fwd_f32(x1, n2s_ref[0, :], n2b_ref[0, :])
    y2 = (xhat2 * n2s_ref[0, :] + n2b_ref[0, :]).astype(dt)
    h1 = h1_ref[:, :, :]
    h1f = h1.astype(jnp.float32)
    h2 = _gelu_f32(h1f).astype(dt)
    do = do_ref[:, :, :]
    if keep2 < 1.0:
        gb2 = jnp.where(m2_ref[:, :, :] > 0.0, do / keep2,
                        jnp.zeros_like(do))
    else:
        gb2 = do
    acc(dw2_ref, _wgrad(h2, gb2))
    acc(db2_ref, jnp.sum(gb2.astype(jnp.float32), axis=(0, 1),
                         keepdims=False).reshape(1, -1))
    dh2 = jax.lax.dot_general(
        gb2, w2_ref[:, :], _MMT, preferred_element_type=jnp.float32
    )
    dh1 = (dh2 * _gelu_grad_f32(h1f)).astype(dt)
    acc(dw1_ref, _wgrad(y2, dh1))
    acc(db1_ref, jnp.sum(dh1.astype(jnp.float32), axis=(0, 1),
                         keepdims=False).reshape(1, -1))
    dy2 = jax.lax.dot_general(
        dh1, w1_ref[:, :], _MMT, preferred_element_type=jnp.float32
    )
    dx1_ln, dn2s, dn2b = _ln_bwd_f32(dy2, xhat2, r2, n2s_ref[0, :])
    acc(dn2s_ref, dn2s)
    acc(dn2b_ref, dn2b)
    dx1 = do.astype(jnp.float32) + dx1_ln

    # ---- attention half backward ----
    if keep1 < 1.0:
        gb1 = jnp.where(m1_ref[:, :, :] > 0.0, dx1 / keep1,
                        jnp.zeros_like(dx1)).astype(dt)
    else:
        gb1 = dx1.astype(dt)
    ao = ao_ref[:, :, :]
    acc(dwproj_ref, _wgrad(ao, gb1))
    acc(dbproj_ref, jnp.sum(gb1.astype(jnp.float32), axis=(0, 1),
                            keepdims=False).reshape(1, -1))
    d_o = jax.lax.dot_general(
        gb1, wproj_ref[:, :], _MMT, preferred_element_type=jnp.float32
    )  # (G, N, D) fp32

    qkv = qkv_ref[:, :, :]
    for hi_idx, lo in enumerate(range(0, d, head_dim)):
        hi = lo + head_dim
        q = qkv[:, :, lo:hi]
        qs = (q.astype(jnp.float32) * scale).astype(dt)
        k = qkv[:, :, d + lo : d + hi]
        v = qkv[:, :, 2 * d + lo : 2 * d + hi]
        m = mst_ref[:, :, hi_idx : hi_idx + 1]
        rdenom = 1.0 / dst_ref[:, :, hi_idx : hi_idx + 1]
        doh = d_o[:, :, lo:hi]
        oh = ao[:, :, lo:hi].astype(jnp.float32)
        dd = jnp.sum(doh * oh, axis=-1, keepdims=True)  # rowsum(dP*P)

        s = jax.lax.dot_general(qs, k, _BQK,
                                preferred_element_type=jnp.float32)
        e = jnp.exp(s - m).astype(dt)
        do_scaled = (doh * rdenom).astype(dt)
        dv = jax.lax.dot_general(e, do_scaled, _BROWS,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_scaled, v, _BQK,
                                 preferred_element_type=jnp.float32)
        ds = (e.astype(jnp.float32) * (dp - dd * rdenom)).astype(dt)
        dq = jax.lax.dot_general(ds, k, _BAV,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, qs, _BROWS,
                                 preferred_element_type=jnp.float32)
        dqkv_scr[:, :, lo:hi] = (dq * scale).astype(dt)
        dqkv_scr[:, :, d + lo : d + hi] = dk.astype(dt)
        dqkv_scr[:, :, 2 * d + lo : 2 * d + hi] = dv.astype(dt)

    dqkv = dqkv_scr[:, :, :]
    ln1, xhat1, r1 = _ln_fwd_f32(x, n1s_ref[0, :], n1b_ref[0, :])
    acc(dwqkv_ref, _wgrad(ln1, dqkv))
    acc(dbqkv_ref, jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1),
                           keepdims=False).reshape(1, -1))
    dy1 = jax.lax.dot_general(
        dqkv, wqkv_ref[:, :], _MMT, preferred_element_type=jnp.float32
    )
    dx_ln, dn1s, dn1b = _ln_bwd_f32(dy1, xhat1, r1, n1s_ref[0, :])
    acc(dn1s_ref, dn1s)
    acc(dn1b_ref, dn1b)
    dx_ref[:, :, :] = (dx1 + dx_ln).astype(dt)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pick_group(b: int) -> int:
    """BASD_TPU_TRAIN_BLOCK_G overrides (trace-time, must divide B) so
    the hardware probe can sweep slab sizes; the fwd+bwd kernel's VMEM
    working set (4 saved bf16 residuals + flash stats) scales with g."""
    env = (os.environ.get("BASD_TPU_TRAIN_BLOCK_G") or "").strip()
    if env.isdigit() and int(env) >= 1 and b % int(env) == 0:
        return int(env)
    return 2 if b % 2 == 0 else 1


def _flat_weights(params, dt):
    v1 = lambda a: a.astype(jnp.float32).reshape(1, -1)
    return (
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
    )


def _fwd_call(x, params, mask1, mask2, head_dim, keep1, keep2, interpret):
    b, n, d = x.shape
    f = params["mlp"]["fc1"]["kernel"].shape[1]
    h = d // head_dim
    g = _pick_group(b)
    dt = x.dtype
    slab = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    slab3 = pl.BlockSpec((g, n, 3 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    slabf = pl.BlockSpec((g, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((g, n, h), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    maskspec = pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_train_fwd_kernel, head_dim=head_dim,
                          keep1=keep1, keep2=keep2),
        grid=(b // g,),
        in_specs=[slab, const(1, d), const(1, d), const(d, 3 * d),
                  const(1, 3 * d), const(d, d), const(1, d), const(1, d),
                  const(1, d), const(d, f), const(1, f), const(f, d),
                  const(1, d), maskspec, maskspec],
        out_specs=(slab, stat, slab3, slab, slab, slabf, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), dt),       # out
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),  # CLS rows
            jax.ShapeDtypeStruct((b, n, 3 * d), dt),   # qkv
            jax.ShapeDtypeStruct((b, n, d), dt),       # attention out
            jax.ShapeDtypeStruct((b, n, d), dt),       # x1
            jax.ShapeDtypeStruct((b, n, f), dt),       # fc1 pre-act
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),  # rowmax
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),  # denom
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n * (8 * d * d + 4 * d * f) + 4 * b * n * n * d,
            bytes_accessed=(8 * d * d + 4 * d * f) // 2
            + b * n * (8 * d + 2 * f) * dt.itemsize,
            transcendentals=b * n * (n * h + f),
        ),
        interpret=interpret,
    )(x, *_flat_weights(params, dt),
      mask1.reshape(b, 1, 1), mask2.reshape(b, 1, 1))


def _bwd_call(res, do, head_dim, keep1, keep2, interpret):
    x, qkv, ao, x1, h1, mst, dst, mask1, mask2, params = res
    b, n, d = x.shape
    f = h1.shape[-1]
    h = d // head_dim
    g = _pick_group(b)
    dt = x.dtype
    slab = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    slab3 = pl.BlockSpec((g, n, 3 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    slabf = pl.BlockSpec((g, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((g, n, h), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    maskspec = pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    gradspec = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_train_bwd_kernel, head_dim=head_dim,
                          keep1=keep1, keep2=keep2),
        grid=(b // g,),
        in_specs=[slab, slab3, slab, slab, slabf, stat, stat,
                  maskspec, maskspec, slab,
                  const(1, d), const(1, d), const(d, 3 * d),
                  const(1, 3 * d), const(d, d), const(1, d), const(1, d),
                  const(1, d), const(d, f), const(1, f), const(f, d),
                  const(1, d)],
        out_specs=(slab, gradspec(1, d), gradspec(1, d),
                   gradspec(d, 3 * d), gradspec(1, 3 * d),
                   gradspec(d, d), gradspec(1, d), gradspec(1, d),
                   gradspec(1, d), gradspec(d, f), gradspec(1, f),
                   gradspec(f, d), gradspec(1, d)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), dt),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((g, n, 3 * d), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * n * (8 * d * d + 4 * d * f)
                       + 5 * b * n * n * d),
            bytes_accessed=3 * (8 * d * d + 4 * d * f) // 2
            + b * n * (12 * d + 3 * f) * dt.itemsize,
            transcendentals=b * n * (n * h + f),
        ),
        interpret=interpret,
    )(x, qkv, ao, x1, h1, mst, dst,
      mask1.reshape(b, 1, 1), mask2.reshape(b, 1, 1),
      do.astype(dt), *_flat_weights(params, dt))
    (dx, dn1s, dn1b, dwqkv, dbqkv, dwproj, dbproj, dn2s, dn2b,
     dw1, db1, dw2, db2) = outs
    as_p = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    dparams = {
        "norm1": {"scale": as_p(dn1s, params["norm1"]["scale"]),
                  "bias": as_p(dn1b, params["norm1"]["bias"])},
        "attn": {"qkv": {"kernel": as_p(dwqkv, params["attn"]["qkv"]["kernel"]),
                         "bias": as_p(dbqkv, params["attn"]["qkv"]["bias"])},
                 "proj": {"kernel": as_p(dwproj, params["attn"]["proj"]["kernel"]),
                          "bias": as_p(dbproj, params["attn"]["proj"]["bias"])}},
        "norm2": {"scale": as_p(dn2s, params["norm2"]["scale"]),
                  "bias": as_p(dn2b, params["norm2"]["bias"])},
        "mlp": {"fc1": {"kernel": as_p(dw1, params["mlp"]["fc1"]["kernel"]),
                        "bias": as_p(db1, params["mlp"]["fc1"]["bias"])},
                "fc2": {"kernel": as_p(dw2, params["mlp"]["fc2"]["kernel"]),
                        "bias": as_p(db2, params["mlp"]["fc2"]["bias"])}},
    }
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_block_train(x, params, mask1, mask2, head_dim: int,
                      keep1: float, keep2: float, interpret: bool = False):
    """One plain pre-LN ViT block, fwd+bwd fused (TPU Pallas).

    x (B, N, D) bf16; params the Block pytree (norm1/attn/norm2/mlp, no
    LayerScale); mask1/mask2 per-sample droppath keep masks (B,) fp32 in
    {0, 1} (all-ones when keep == 1.0). Returns (out (B, N, D),
    importance (B, N, H) fp32 CLS softmax rows — a stop-gradient
    byproduct: its cotangent is discarded, matching the BASD loss which
    never differentiates student importance)."""
    out, imp, *_ = _fwd_call(x, params, mask1, mask2, head_dim,
                             keep1, keep2, interpret)
    return out, imp


def _vjp_fwd(x, params, mask1, mask2, head_dim, keep1, keep2, interpret):
    out, imp, qkv, ao, x1, h1, mst, dst = _fwd_call(
        x, params, mask1, mask2, head_dim, keep1, keep2, interpret)
    return (out, imp), (x, qkv, ao, x1, h1, mst, dst, mask1, mask2, params)


def _vjp_bwd(head_dim, keep1, keep2, interpret, res, cts):
    do, _dimp = cts  # importance is a stop-gradient byproduct
    dx, dparams = _bwd_call(res, do, head_dim, keep1, keep2, interpret)
    mask1, mask2 = res[7], res[8]
    return dx, dparams, jnp.zeros_like(mask1), jnp.zeros_like(mask2)


fused_block_train.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Mesh dispatch + policy (same pattern as ops/block_kernel.py)
# ---------------------------------------------------------------------------

import contextlib
import contextvars
import os

from jax.sharding import PartitionSpec as _P

_TRAIN_BLOCK_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "basd_train_block_mesh", default=None
)


@contextlib.contextmanager
def train_block_mesh(mesh):
    """Scope the ambient device mesh for fused train-block dispatch."""
    token = _TRAIN_BLOCK_MESH.set(mesh)
    try:
        yield
    finally:
        _TRAIN_BLOCK_MESH.reset(token)


def fused_block_train_sharded(x, params, mask1, mask2, head_dim,
                              keep1, keep2, *, interpret=False):
    """`fused_block_train` in a batch-sharded shard_map island under a
    multi-device ambient mesh (TP meshes never reach here — see
    `use_fused_train_block`)."""
    mesh = _TRAIN_BLOCK_MESH.get()
    if mesh is None or mesh.size <= 1:
        return fused_block_train(x, params, mask1, mask2, head_dim,
                                 keep1, keep2, interpret)
    data = "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1 \
        else None
    fn = jax.shard_map(
        functools.partial(fused_block_train, head_dim=head_dim,
                          keep1=keep1, keep2=keep2, interpret=interpret),
        mesh=mesh,
        in_specs=(_P(data, None, None),
                  jax.tree_util.tree_map(lambda _: _P(), params),
                  _P(data), _P(data)),
        out_specs=(_P(data, None, None), _P(data, None, None)),
        check_vma=False,
    )
    return fn(x, params, mask1, mask2)


def train_block_impl() -> str:
    """Policy override via BASD_TPU_TRAIN_BLOCK in
    {auto, xla, fused, fused_interpret}."""
    return os.environ.get("BASD_TPU_TRAIN_BLOCK", "auto")


def use_fused_train_block(n: int, d: int, head_dim: int, has_cls: bool,
                          has_layer_scale: bool) -> bool:
    """Fused fwd+bwd block for differentiated train-mode forwards on TPU:
    plain blocks (no LayerScale) with a CLS token; TP meshes stay on XLA
    (LayerNorm needs the full feature axis)."""
    impl = train_block_impl()
    if impl == "xla" or has_layer_scale or not has_cls:
        return False
    mesh = _TRAIN_BLOCK_MESH.get()
    if mesh is not None and mesh.size > 1 and (
        "model" in mesh.axis_names and mesh.shape["model"] > 1
    ):
        return False
    if impl in ("fused", "fused_interpret"):
        return True
    if d % head_dim != 0 or head_dim % 16 != 0 or n < 2:
        return False
    # auto stays on XLA until the in-context hardware stage profile
    # confirms the win (docs/DESIGN.md §7 day-3 "pending measurement";
    # fused attention take 1 regressed in context despite an isolated
    # win). Force with BASD_TPU_TRAIN_BLOCK=fused; probes A/B explicitly.
    return False
