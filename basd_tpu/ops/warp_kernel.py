"""Fused TrivialAugment geometric pipeline (Pallas, TPU).

Per-sample hflip + quarter-turn + Paeth three-shear warp in ONE
VMEM-resident kernel. Semantics target: `hflip` followed by
`augment._geometric_warp` (the TPU-native re-design of torchvision's
affine geometry ops used by TrivialAugmentWide — reference
`/root/reference/src/data/datasets.py:140`).

Why a kernel: the XLA tap-sweep path performs ~100 dense-shift passes,
each reading the full padded image batch from HBM (~15 GB of traffic at
the Table-1 shape; measured 29.9 ms of the 54.9 ms dual_view stage,
`tools/probe_dualview.py`). Holding each batch-group slab in VMEM reduces
HBM traffic to one read + one write of the image batch; the tap sweeps
become VPU work (~77 MFLOP/tap over the whole batch).

Kernel shape rules (Mosaic):
  * The image lives as (G, C, n, n) fp32 blocks; the minor two dims are
    the (sublane, lane) tile. All tap shifts run along the SUBLANE axis
    (lane-axis slicing compiles pathologically — see the Jacobi kernel
    note in docs/DESIGN.md §3), so the three shear passes alternate
    layout via in-VMEM transposes of the minor dims.
  * Mosaic has no `rev` lowering, so hflip / quarter-turn flips are
    exchange-matrix matmuls (right-multiply by J on the MXU; left
    multiplies go through the transposes the pass structure already
    needs). With Y = X J^f (hflip) and quarter-turn k, the pass-1 layout
    (the TRANSPOSE of the turned image) is

        T1 = J^a M J^b,  M = X^T (k even) | X (k odd),
        a = [f, 0, 1-f, 1][k],  b = [0, 1-f, 1, f][k].

  * Tap weights vary along the LANE axis (the shear delta is linear in
    the perpendicular coordinate) and broadcast over channels/sublanes.
  * Non-geometric samples carry exact-identity parameters: delta == 0
    selects coarse tap 0 with weight 1 and fine tap 0 with weight 1, so
    the kernel IS the identity for them — no select against the input.

Shift-range fidelity: pass bounds cover the full TrivialAugmentWide
parameter space (|shear| <= 0.99 => |delta| <= 0.99*cy). The round-2 XLA
path budgeted only for rotation+translation (max_x = 0.415*cy + 32) and
silently zero-filled pixels for |shear_x| > ~0.71 (measured: 17,670
wrongly-zeroed pixels at shear 0.99 on 224 px); both paths now use the
correct bounds and agree exactly.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as _P

_PAETH_MAX = float(np.tan(np.pi / 8.0))  # residual rotation |psi_r| <= 45 deg
_SHEAR_MAX = 0.99
_TRANS_MAX = 32.0
# dense single-level sweep below this range; two-level (nearest coarse +
# bilinear fine) above — same policy as augment._shift_axis
_DENSE_MAX = 20


def pass_bounds(n: int) -> tuple[int, int, int]:
    """Max |delta| per shear pass for an n x n image, covering every
    TrivialAugmentWide op (exactly one op is active per sample):
    pass1 x-shear alpha in {paeth, shear} + trans_x; pass2 y-shear
    beta in {sin(residual), shear} + trans_y; pass3 x-shear gamma=paeth."""
    cy = (n - 1) / 2.0
    b12 = int(math.ceil(max(_SHEAR_MAX * cy, _TRANS_MAX))) + 1
    b3 = int(math.ceil(_PAETH_MAX * cy)) + 1
    return min(b12, n), min(b12, n), min(b3, n)


def _levels(max_shift: int) -> tuple[int, int, int]:
    """(stride, kmax, fine) for the two-level sweep."""
    stride = max(2, int(math.ceil(math.sqrt(float(max_shift)))))
    kmax = int(math.ceil(max_shift / stride))
    fine = int(math.ceil(stride / 2.0)) + 1
    return stride, kmax, fine


def _pad_capacity(n: int) -> int:
    """Sublane margin the scratch pad must hold: the largest tap offset
    any pass/level reaches (the coarse level writes at margin
    stride*kmax + fine so its output can extend by the fine range)."""
    cap = 0
    for b in pass_bounds(n):
        if b <= _DENSE_MAX:
            cap = max(cap, b)
        else:
            stride, kmax, fine = _levels(b)
            cap = max(cap, stride * kmax + fine)
    return cap


def _tap_sweep(slab, wgt_fn, taps, pad_ref, margin, out_margin=0):
    """acc[.., s, l] = sum_t wgt_fn(t)[.., l] * slab[.., s + t, l] with
    zero fill, via the scratch pad ref; the output extends `out_margin`
    beyond the slab on both sides (s in [-out_margin, n + out_margin)).
    Requires margin >= max |tap| + out_margin."""
    n = slab.shape[2]
    t0 = margin
    pad_ref[:, :, :t0, :] = jnp.zeros_like(pad_ref[:, :, :t0, :])
    pad_ref[:, :, t0 : t0 + n, :] = slab
    pad_ref[:, :, t0 + n : t0 + n + t0, :] = jnp.zeros_like(
        pad_ref[:, :, t0 + n : t0 + n + t0, :]
    )
    size = n + 2 * out_margin
    acc = None
    for t in taps:
        w = wgt_fn(t)
        lo = t0 + t - out_margin
        term = w * pad_ref[:, :, lo : lo + size, :]
        acc = term if acc is None else acc + term
    return acc


def _shift_pass(slab, delta, pad_ref, max_shift):
    """Shift along the sublane axis by per-lane continuous `delta`
    ((G, 1, 1, n), sampling out[s] = in[s + delta]) with bilinear weights
    and zero fill — the VMEM mirror of `augment._shift_axis`. The coarse
    level emits a fine-margin-extended intermediate, which makes the
    two-level sweep bit-equal to a dense bilinear sweep (no boundary
    zero-fill band)."""
    if max_shift <= _DENSE_MAX:
        taps = list(range(-max_shift, max_shift + 1))
        bilin = lambda t: jnp.maximum(0.0, 1.0 - jnp.abs(delta - t))
        return _tap_sweep(slab, bilin, taps, pad_ref, max_shift)

    stride, kmax, fine = _levels(max_shift)
    kq = jnp.clip(jnp.round(delta / stride), -kmax, kmax)
    coarse_ext = _tap_sweep(
        slab,
        lambda t: (kq == (t // stride)).astype(jnp.float32),
        [stride * j for j in range(-kmax, kmax + 1)],
        pad_ref,
        stride * kmax + fine,
        out_margin=fine,
    )
    residual = delta - kq * stride
    bilin = lambda t: jnp.maximum(0.0, 1.0 - jnp.abs(residual - t))
    # coarse_ext covers exactly the taps' reach: place it at offset 0
    n = slab.shape[2]
    pad_ref[:, :, : n + 2 * fine, :] = coarse_ext
    acc = None
    for t in range(-fine, fine + 1):
        w = bilin(t)
        term = w * pad_ref[:, :, fine + t : fine + t + n, :]
        acc = term if acc is None else acc + term
    return acc


_RMUL = (((3,), (0,)), ((), ()))  # (G,C,n,j) x (j,k) -> (G,C,n,k)


def _warp_kernel(par_ref, x_ref, o_ref, pad_ref):
    """One (G, C, n, n) slab per program. par_ref is the flat (B*8,)
    scalar-prefetch array in SMEM — per-sample rows are
    [alpha, beta, gamma, trans_x, trans_y, quarter_k, hflip, 0].
    (A (B, 8) VMEM operand read with a dynamic sublane slice returned
    wrong rows for a handful of programs at B=256 — scalar reads from
    SMEM are the robust path.)"""
    g, c, n, _ = x_ref.shape
    cy = (n - 1) / 2.0
    base = pl.program_id(0) * g * 8

    def p(i):
        sel = jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1, 1), 0)
        out = jnp.zeros((g, 1, 1, 1), jnp.float32)
        for s in range(g):
            out = jnp.where(sel == s, par_ref[base + s * 8 + i], out)
        return out

    alpha, beta, gamma = p(0), p(1), p(2)
    tx, ty = p(3), p(4)
    kq, flip = p(5), p(6)

    x = x_ref[:, :, :, :]
    jmat = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        + jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        == n - 1
    ).astype(x.dtype)
    # HIGHEST: the default single-pass bf16 MXU dot truncates the image
    # values (~2e-3 error measured); J is a 0/1 permutation so full-fp32
    # passes make the flip exact
    rj = lambda a: jax.lax.dot_general(
        a, jmat, _RMUL, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    swap = lambda a: jnp.swapaxes(a, -1, -2)

    # hflip + quarter-turn -> pass-1 layout T1 = J^a M J^b (module doc)
    k_even = (kq == 0.0) | (kq == 2.0)
    a_mask = jnp.where(
        k_even, jnp.where(kq == 0.0, flip, 1.0 - flip),
        jnp.where(kq == 1.0, 0.0, 1.0),
    )
    b_mask = jnp.where(
        k_even, jnp.where(kq == 0.0, 0.0, 1.0),
        jnp.where(kq == 1.0, 1.0 - flip, flip),
    )
    m = jnp.where(k_even, swap(x), x)
    mb = jnp.where(b_mask > 0.5, rj(m), m)
    mbt = swap(mb)
    t1 = swap(jnp.where(a_mask > 0.5, rj(mbt), mbt))  # J^a (M J^b)

    # int32 iota + cast: Mosaic rejects float iota results
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3).astype(
            jnp.float32
        )
        - cy
    )
    b1, b2, b3 = pass_bounds(n)

    # pass 1: x-shear (+ x-translation), layout (W, H)
    p1 = _shift_pass(t1, alpha * lane + tx, pad_ref, b1)
    # pass 2: y-shear (+ y-translation), layout (H, W)
    p2 = _shift_pass(swap(p1), beta * lane + ty, pad_ref, b2)
    # pass 3: x-shear, layout (W, H)
    p3 = _shift_pass(swap(p2), gamma * lane, pad_ref, b3)
    o_ref[:, :, :, :] = swap(p3)


def _pick_group(b: int) -> int:
    return 2 if b % 2 == 0 else 1


def _warp_call(x, params, *, interpret: bool):
    b, c, n, _ = x.shape
    g = _pick_group(b)
    cap = _pad_capacity(n)
    # index maps under PrefetchScalarGridSpec receive the scalar-prefetch
    # ref as a trailing argument
    spec = pl.BlockSpec(
        (g, c, n, n), lambda i, _par: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    taps = sum(
        (2 * bnd + 1)
        if bnd <= _DENSE_MAX
        else (2 * _levels(bnd)[1] + 1) + (2 * _levels(bnd)[2] + 1)
        for bnd in pass_bounds(n)
    )
    return pl.pallas_call(
        _warp_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // g,),
            in_specs=[spec],
            out_specs=spec,
            scratch_shapes=[
                pltpu.VMEM((g, c, n + 2 * cap, n), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, n, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the unrolled tap sweeps + pass intermediates exceed the 16 MB
            # default scoped-vmem budget at G=2 (measured 32 MB); v5e VMEM
            # is 128 MB — give the kernel headroom
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * taps + 6) * b * c * n * n + 4 * b * c * n * n * n,
            bytes_accessed=2 * b * c * n * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(params.reshape(-1), x)


def fused_geometric_warp(
    images: jax.Array,  # (B, H, W, C) fp32, H == W
    angle: jax.Array,  # (B,) inverse-map rotation, radians
    shear_x: jax.Array,
    shear_y: jax.Array,
    trans_x: jax.Array,
    trans_y: jax.Array,
    flip: jax.Array | None = None,  # (B,) or (B,1,1,1) bool hflip mask
    *,
    interpret: bool = False,
) -> jax.Array:
    """hflip (optional) then `_geometric_warp`, fused in one Pallas call.

    Identity parameters produce the input exactly (bit-identical), so
    callers need no select for non-geometric samples."""
    b, h, w, _ = images.shape
    assert h == w, "fused warp expects square images"
    quarter = jnp.round(angle / (jnp.pi / 2.0))
    kq = jnp.mod(quarter.astype(jnp.int32), 4).astype(jnp.float32)
    residual = angle - quarter * (jnp.pi / 2.0)
    paeth = -jnp.tan(residual / 2.0)
    fl = (
        jnp.zeros((b,), jnp.float32)
        if flip is None
        else flip.reshape(b).astype(jnp.float32)
    )
    params = jnp.stack(
        [
            paeth + shear_x,
            jnp.sin(residual) + shear_y,
            paeth,
            trans_x,
            trans_y,
            kq,
            fl,
            jnp.zeros((b,), jnp.float32),
        ],
        axis=-1,
    )  # (B, 8)
    x = jnp.transpose(images, (0, 3, 1, 2))
    out = _warp_with_mesh(x, params, interpret)
    return jnp.transpose(out, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Mesh dispatch + implementation policy (same pattern as ops/attention.py)
# ---------------------------------------------------------------------------

_WARP_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "basd_warp_mesh", default=None
)


@contextlib.contextmanager
def warp_mesh(mesh):
    """Scope the ambient device mesh for fused-warp dispatch."""
    token = _WARP_MESH.set(mesh)
    try:
        yield
    finally:
        _WARP_MESH.reset(token)


def _warp_with_mesh(x, params, interpret):
    mesh = _WARP_MESH.get()
    call = functools.partial(_warp_call, interpret=interpret)
    if mesh is None or mesh.size <= 1:
        return call(x, params)
    data = "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1 else None
    fn = jax.shard_map(
        call,
        mesh=mesh,
        in_specs=(_P(data, None, None, None), _P(data, None)),
        out_specs=_P(data, None, None, None),
        check_vma=False,
    )
    return fn(x, params)


def warp_impl() -> str:
    """Policy override via BASD_TPU_WARP in
    {auto, xla, fused, fused_interpret}."""
    return os.environ.get("BASD_TPU_WARP", "auto")


def use_fused_warp(images: jax.Array) -> bool:
    """Trace-time dispatch for `augment.trivial_augment_wide`: the fused
    kernel on TPU for square fp32 images."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    if h != w or images.dtype != jnp.float32:
        return False
    impl = warp_impl()
    if impl == "xla":
        return False
    if impl in ("fused", "fused_interpret"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False
