"""On-device image augmentation: the TPU-native input path.

The reference runs RandomResizedCrop + HFlip + TrivialAugmentWide +
Normalize on 8 host worker processes (`src/data/datasets.py:137-144`) and
ships fp32 tensors to the device. Here the host ships ONE uint8 array per
image and every augmentation is a jitted device op fused into the train
step (BASELINE.json north star: "on-device image input path").

Design notes (TPU-first):
  * Separable resampling (crop/resize/shear/translate along one axis) is
    expressed as per-sample interpolation-weight matrices applied with
    batched matmuls — MXU work instead of gathers.
  * Rotation (the one non-separable warp) uses a bilinear gather via
    map_coordinates, batched with vmap.
  * Per-image TrivialAugment op selection uses "neutral-parameter
    composition": every op runs once on the whole batch with per-image
    parameters that default to identity, instead of a 14-way vmapped
    switch (which would multiply activation memory by the branch count).
  * Interpolation is bilinear throughout (torchvision defaults NEAREST for
    TrivialAugment geometry; parity is statistical — final accuracy — per
    SURVEY.md hard part 5).

All ops take/return float32 images in [0, 1], NHWC.
"""

from __future__ import annotations



import math

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: static constants in this module are NUMPY arrays on purpose. A
# module-level jnp array lives on the accelerator; embedding it as a jit
# constant forces device round-trips during lowering and a separate buffer
# at runtime (measured: 322 s lowering / 80x slower kernels on the remote
# TPU relay). numpy constants fold into the compiled program for free.


def normalize(images: jax.Array, mean, std) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images - mean) / std


def _axis_weights(src: jax.Array, n_in: int) -> jax.Array:
    """(..., n_out) fractional source coords -> (..., n_out, n_in) bilinear
    weight matrices: w[.., i, k] = max(0, 1 - |src_i - k|)."""
    grid = jnp.arange(n_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - grid))


def _resample_separable(
    images: jax.Array, src_y: jax.Array, src_x: jax.Array
) -> jax.Array:
    """Sample images (B, H, W, C) at per-sample axis coords
    src_y (B, H_out), src_x (B, W_out) with bilinear weights; out-of-range
    coords clamp at the border (weights renormalize to nearest pixel)."""
    h, w = images.shape[1], images.shape[2]
    wy = _axis_weights(jnp.clip(src_y, 0.0, h - 1.0), h)  # (B, H_out, H)
    wx = _axis_weights(jnp.clip(src_x, 0.0, w - 1.0), w)  # (B, W_out, W)
    out = jnp.einsum(
        "bih,bhwc->biwc", wy, images, preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "bjw,biwc->bijc", wx, out, preferred_element_type=jnp.float32
    )


def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Half-pixel bilinear resize (matches torch antialias=False)."""
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    sy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    sx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    sy = jnp.broadcast_to(sy, (b, out_h))
    sx = jnp.broadcast_to(sx, (b, out_w))
    return _resample_separable(images, sy, sx)


def hflip(images: jax.Array, rng: jax.Array, p: float = 0.5) -> jax.Array:
    flip = jax.random.bernoulli(rng, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_resized_crop(
    images: jax.Array,
    rng: jax.Array,
    out_size: int,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    attempts: int = 10,
) -> jax.Array:
    """torchvision RandomResizedCrop semantics: sample (area-scale, aspect)
    up to `attempts` times, take the first in-bounds candidate, else fall
    back to a max center crop — fully vectorized over batch x attempts."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_area, k_ratio, k_i, k_j = jax.random.split(rng, 4)

    area = h * w
    target_area = area * jax.random.uniform(
        k_area, (b, attempts), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (b, attempts),
        minval=jnp.log(ratio[0]),
        maxval=jnp.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)

    cw = jnp.sqrt(target_area * aspect)
    ch = jnp.sqrt(target_area / aspect)
    valid = (cw <= w) & (ch <= h)  # (B, attempts)

    u_i = jax.random.uniform(k_i, (b, attempts))
    u_j = jax.random.uniform(k_j, (b, attempts))
    top = u_i * (h - ch)
    left = u_j * (w - cw)

    # first valid attempt per sample (argmax of boolean picks first True)
    idx = jnp.argmax(valid, axis=1)
    any_valid = jnp.any(valid, axis=1)
    take = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    ch_s, cw_s, top_s, left_s = take(ch), take(cw), take(top), take(left)

    # fallback: torchvision center-crops the largest in-ratio rectangle
    fb_cw = jnp.minimum(jnp.float32(w), jnp.float32(h) * ratio[1])
    fb_ch = jnp.minimum(jnp.float32(h), jnp.float32(w) / ratio[0])
    ch_s = jnp.where(any_valid, ch_s, fb_ch)
    cw_s = jnp.where(any_valid, cw_s, fb_cw)
    top_s = jnp.where(any_valid, top_s, (h - fb_ch) / 2.0)
    left_s = jnp.where(any_valid, left_s, (w - fb_cw) / 2.0)

    ys = (jnp.arange(out_size, dtype=jnp.float32)[None, :] + 0.5) * (
        ch_s[:, None] / out_size
    ) - 0.5 + top_s[:, None]
    xs = (jnp.arange(out_size, dtype=jnp.float32)[None, :] + 0.5) * (
        cw_s[:, None] / out_size
    ) - 0.5 + left_s[:, None]
    return _resample_separable(images, ys, xs)


# ---------------------------------------------------------------------------
# TrivialAugmentWide
# ---------------------------------------------------------------------------

_TA_NUM_OPS = 14
(
    _OP_IDENTITY,
    _OP_SHEAR_X,
    _OP_SHEAR_Y,
    _OP_TRANSLATE_X,
    _OP_TRANSLATE_Y,
    _OP_ROTATE,
    _OP_BRIGHTNESS,
    _OP_COLOR,
    _OP_CONTRAST,
    _OP_SHARPNESS,
    _OP_POSTERIZE,
    _OP_SOLARIZE,
    _OP_AUTOCONTRAST,
    _OP_EQUALIZE,
) = range(_TA_NUM_OPS)

_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


def _affine_warp(images: jax.Array, mats: jax.Array) -> jax.Array:
    """Warp (B, H, W, C) by per-sample inverse affine 2x3 matrices mapping
    output pixel coords -> input coords (about the image center), bilinear,
    zero fill. Gather-based fallback path for large images (TPU gathers are
    slow; small images use the shear decomposition in `_geometric_warp`)."""
    b, h, w, c = images.shape
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    coords = np.stack([yy - cy, xx - cx, np.ones_like(yy)])  # (3, H, W)

    def warp_one(img, mat):
        src = jnp.einsum("ik,khw->ihw", mat, coords)  # (2, H, W)
        src_y = src[0] + cy
        src_x = src[1] + cx
        per_channel = lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, [src_y, src_x], order=1, mode="constant", cval=0.0
        )
        return jnp.stack(
            [per_channel(img[..., k]) for k in range(c)], axis=-1
        )

    return jax.vmap(warp_one)(images, mats)


def _shift_axis_taps(
    images: jax.Array,
    delta: jax.Array,
    axis: int,
    taps: list[int],
    *,
    nearest: bool,
    stride: int = 1,
) -> jax.Array:
    """out[x] = interp(in[x + delta]) using the given static tap offsets.

    Static slices of a zero-padded array are pure relayouts, so this is
    VPU-only work — no gathers. `nearest` selects indicator weights
    (coarse level of the hierarchical shift, stride > 1); otherwise
    bilinear tent weights (stride == 1)."""
    n = images.shape[axis]
    t0 = max(abs(t) for t in taps)
    pad = [(0, 0)] * images.ndim
    pad[axis] = (t0, t0)
    # materialize the padded input ONCE: without the barrier XLA fuses the
    # upstream producer chain (e.g. the random-resized-crop einsums) into
    # every tap consumer and recomputes it per tap (measured 690 ms for a
    # 224px dual-view that is ~50 ms with the barrier)
    padded = jax.lax.optimization_barrier(jnp.pad(images, pad))
    acc = jnp.zeros_like(images)
    for t in taps:
        if nearest:
            wgt = (jnp.abs(delta - t) <= stride / 2.0).astype(jnp.float32)
        else:
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(delta - t))
        shape = [1] * images.ndim
        shape[0] = images.shape[0]
        shape[1 if axis == 2 else 2] = wgt.shape[1]
        acc = acc + wgt.reshape(shape) * jax.lax.slice_in_dim(
            padded, t0 + t, t0 + t + n, axis=axis
        )
    return acc


def _shift_axis(images: jax.Array, delta: jax.Array, axis: int,
                max_shift: int) -> jax.Array:
    """Shift rows/columns by a per-(sample, line) CONTINUOUS amount with
    bilinear weights and zero fill.

    axis=2: shift along W with delta (B, H). axis=1: shift along H with
    delta (B, W). Sampling convention: out[x] = in[x + delta].

    Small ranges use one dense tap sweep; large ranges decompose
    hierarchically as delta = stride*k + r (a nearest-neighbor coarse
    shift over strided taps, then a bilinear fine shift), turning O(range)
    image passes into O(sqrt(range))."""
    if max_shift <= 40:
        taps = list(range(-max_shift, max_shift + 1))
        return _shift_axis_taps(images, delta, axis, taps, nearest=False)

    stride = max(2, int(np.ceil(np.sqrt(float(max_shift)))))
    kmax = int(np.ceil(max_shift / stride))
    k = jnp.clip(jnp.round(delta / stride), -kmax, kmax)
    residual = delta - k * stride  # |residual| <= stride/2 (+clip slack)
    fine = int(np.ceil(stride / 2.0)) + 1

    # extend the coarse intermediate by the fine range so the fine pass
    # reads true pixels (not the coarse result's zero pad) near the
    # boundary — makes the two-level sweep bit-equal to a dense bilinear
    # sweep. (The pre-fix version zero-filled a ~stride/2 band at the
    # shifted edge.)
    n = images.shape[axis]
    pad = [(0, 0)] * images.ndim
    pad[axis] = (fine, fine)
    ext = jnp.pad(images, pad)

    coarse_taps = [stride * j for j in range(-kmax, kmax + 1)]
    out = _shift_axis_taps(
        ext, k * stride, axis, coarse_taps, nearest=True, stride=stride
    )
    fine_taps = list(range(-fine, fine + 1))
    out = _shift_axis_taps(out, residual, axis, fine_taps, nearest=False)
    return jax.lax.slice_in_dim(out, fine, fine + n, axis=axis)


def _quarter_turn(images: jax.Array, k: jax.Array) -> jax.Array:
    """Per-sample lossless rotation by k*90 degrees (k in {0,1,2,3})."""
    r0 = images
    r1 = jnp.flip(jnp.swapaxes(images, 1, 2), axis=1)  # 90 ccw
    r2 = jnp.flip(jnp.flip(images, axis=1), axis=2)  # 180
    r3 = jnp.flip(jnp.swapaxes(images, 1, 2), axis=2)  # 270 ccw
    stack = jnp.stack([r0, r1, r2, r3])  # (4, B, H, W, C)
    sel = jax.nn.one_hot(k, 4, dtype=images.dtype)  # (B, 4)
    return jnp.einsum("rbhwc,br->bhwc", stack, sel)


def _geometric_warp(
    images: jax.Array,
    angle: jax.Array,  # (B,) inverse-map rotation, radians
    shear_x: jax.Array,  # (B,) inverse-map x shear
    shear_y: jax.Array,  # (B,) inverse-map y shear
    trans_x: jax.Array,  # (B,) inverse-map x translation, pixels
    trans_y: jax.Array,  # (B,) inverse-map y translation, pixels
) -> jax.Array:
    """TPU-native rotate/shear/translate: quarter-turn + Paeth three-shear
    decomposition, each shear a dense-shift separable pass (no gathers).

    Exactly one of {angle, shear_x, shear_y, (trans_x, trans_y)} is nonzero
    per sample (TrivialAugment applies a single op), so the shear passes
    compose without cross terms. The inverse rotation R(psi) splits into a
    lossless k*90-degree turn plus a residual |psi_r| <= 45 degrees =
    Sx(-tan(psi_r/2)) Sy(sin(psi_r)) Sx(-tan(psi_r/2)); translations fold
    into the shear passes. Requires square images.
    """
    b, h, w, c = images.shape
    assert h == w, "geometric warp expects square images"
    cy = (h - 1) / 2.0

    # split inverse rotation into quarter turns + residual
    quarter = jnp.round(angle / (jnp.pi / 2.0))
    k = jnp.mod(quarter.astype(jnp.int32), 4)
    residual = angle - quarter * (jnp.pi / 2.0)  # [-45, 45] degrees

    out = _quarter_turn(images, k)

    paeth = -jnp.tan(residual / 2.0)
    alpha = paeth + shear_x  # first x pass shear
    beta = jnp.sin(residual) + shear_y
    gamma = paeth

    lane = jnp.arange(h, dtype=jnp.float32) - cy  # (H,)

    # pass bounds cover the full TrivialAugmentWide parameter space
    # (|shear| <= 0.99 => |delta| <= 0.99*cy; the former 0.415*cy + 32
    # budget silently zero-filled pixels for |shear_x| > ~0.71)
    from basd_tpu.ops.warp_kernel import pass_bounds

    b1, b2, b3 = pass_bounds(h)

    # pass 1: x shear (alpha) + x translation
    delta_x1 = alpha[:, None] * lane[None, :] + trans_x[:, None]  # (B, H)
    out = _shift_axis(out, delta_x1, axis=2, max_shift=b1)

    # pass 2: y shear (beta) + y translation
    delta_y = beta[:, None] * lane[None, :] + trans_y[:, None]  # (B, W)
    out = _shift_axis(out, delta_y, axis=1, max_shift=b2)

    # pass 3: x shear (gamma)
    delta_x2 = gamma[:, None] * lane[None, :]  # (B, H)
    out = _shift_axis(out, delta_x2, axis=2, max_shift=b3)
    return out


def _blur3(images: jax.Array) -> jax.Array:
    """PIL SMOOTH-style 3x3 blur used by sharpness (kernel 1/13 with center
    5/13), edges kept (torchvision keeps the border pixels unblurred)."""
    k = np.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    blurred = jax.lax.conv_general_dilated(
        images,
        np.tile(k[:, :, None, None], (1, 1, 1, images.shape[-1])),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=images.shape[-1],
    )
    b, h, w, c = images.shape
    yy = np.arange(h)[:, None]
    xx = np.arange(w)[None, :]
    interior = ((yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1))[None, :, :, None]
    return jnp.where(interior, blurred, images)


def _equalize(images: jax.Array) -> jax.Array:
    """PIL-style histogram equalization per image per channel (uint8 space).

    Scatter-free TPU formulation: pixels are one-hot encoded once (bf16) and
    both the cumulative histogram (matmul with a static upper-triangular
    ones matrix) and the final LUT application (matmul with the LUT) run on
    the MXU — bincount/gather lowered to TPU scatters measured ~5x slower.
    Bit-exact vs PIL (integer LUT arithmetic in int32)."""
    b, h, w, c = images.shape
    u8 = jnp.clip(images * 255.0, 0, 255).astype(jnp.int32)  # trunc = torchvision float->uint8
    flat = u8.transpose(0, 3, 1, 2).reshape(b * c, h * w)

    small = h * w <= 8192  # full one-hot memory gate
    if small:
        onehot = jax.nn.one_hot(flat, 256, dtype=jnp.bfloat16)  # (BC, HW, 256)
        upper = np.triu(np.ones((256, 256), np.float32)).astype(np.float16)
        # cum[p, v] = #pixels <= v ; exact: 0/1 values, fp32 accumulation
        cum = jnp.einsum(
            "phv,vw->pw", onehot, upper, preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (BC, 256)
    else:
        # large images: radix-16 factorization. The full 256-bin histogram
        # is the outer product of high/low-nibble one-hots contracted over
        # pixels — two (HW, 16) one-hots and one batched 16x16 matmul
        # instead of a 256-wide one-hot (~20 GB at 224^2) or a scatter
        # bincount (~800 ms measured). Exact integer counts.
        oh_hi = jax.nn.one_hot(flat >> 4, 16, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(flat & 15, 16, dtype=jnp.bfloat16)
        hist16 = jnp.einsum(
            "pha,phb->pab", oh_hi, oh_lo, preferred_element_type=jnp.float32
        )  # (BC, 16, 16): hist256[16a + b]
        hist_raw = hist16.reshape(-1, 256).astype(jnp.int32)
        cum = jnp.cumsum(hist_raw, axis=-1)
    hist = jnp.diff(cum, axis=-1, prepend=0)

    nonzero = hist > 0
    last_nz = 255 - jnp.argmax(nonzero[:, ::-1], axis=-1)  # (BC,)
    total = cum[:, -1]
    last_count = jnp.take_along_axis(hist, last_nz[:, None], axis=-1)[:, 0]
    step = (total - last_count) // 255  # (BC,)

    ramp = jnp.arange(256, dtype=jnp.int32)
    lut = jnp.where(
        (step > 0)[:, None],
        jnp.clip(
            (cum - hist + (step // 2)[:, None])
            // jnp.maximum(step, 1)[:, None],
            0,
            255,
        ),
        ramp[None, :],
    )  # (BC, 256)

    if small:
        out = jnp.einsum(
            "phv,pv->ph", onehot, lut.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # LUT values <= 255 are exact in bf16
    else:
        # LUT application via the same radix split: out = onehot_hi @ LUT
        # (as a 16x16 table) contracted against onehot_lo — batched
        # matmuls instead of a 38M-element gather. bf16 is exact for the
        # 0/1 one-hots; the LUT contraction accumulates in fp32 and each
        # output receives exactly one table entry (<= 255, bf16-exact).
        lut16 = lut.reshape(-1, 16, 16).astype(jnp.bfloat16)
        tmp = jnp.einsum(
            "pha,pab->phb", oh_hi, lut16, preferred_element_type=jnp.float32
        )  # (BC, HW, 16)
        out = jnp.einsum(
            "phb,phb->ph", tmp.astype(jnp.bfloat16), oh_lo,
            preferred_element_type=jnp.float32,
        )
    out = out.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    return out / 255.0


def _autocontrast(images: jax.Array) -> jax.Array:
    lo = jnp.min(images, axis=(1, 2), keepdims=True)
    hi = jnp.max(images, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.clip((images - lo) * scale, 0.0, 1.0)


def trivial_augment_wide(
    images: jax.Array, rng: jax.Array, flip_mask: jax.Array | None = None
) -> jax.Array:
    """TrivialAugmentWide (Mueller & Hutter 2021) as used by the reference
    train pipeline (`datasets.py:140`): ONE op per image, uniform over 14
    ops, uniform magnitude over 31 bins, random sign. torchvision
    `_AUGMENTATION_SPACE` wide ranges: shear 0.99, translate 32px,
    rotate 135 deg, color factors 0.99, posterize >= 2 bits, solarize
    threshold full range.

    `flip_mask` (optional (B,)/(B,1,1,1) bool): an HFlip applied BEFORE
    the augment op — passed in (rather than pre-applied by the caller) so
    the fused Pallas warp kernel can fold the flip into its first pass."""
    b = images.shape[0]
    k_op, k_mag, k_sign = jax.random.split(rng, 3)
    op = jax.random.randint(k_op, (b,), 0, _TA_NUM_OPS)
    mag = jax.random.randint(k_mag, (b,), 0, 31).astype(jnp.float32) / 30.0
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
    sm = sign * mag

    is_op = lambda o: (op == o)

    # ---- geometric ops -> one fused affine warp (inverse matrices) ----
    shear_x = jnp.where(is_op(_OP_SHEAR_X), sm * 0.99, 0.0)
    shear_y = jnp.where(is_op(_OP_SHEAR_Y), sm * 0.99, 0.0)
    trans_x = jnp.where(is_op(_OP_TRANSLATE_X), sm * 32.0, 0.0)
    trans_y = jnp.where(is_op(_OP_TRANSLATE_Y), sm * 32.0, 0.0)
    angle = jnp.where(is_op(_OP_ROTATE), sm * 135.0, 0.0) * (jnp.pi / 180.0)

    geo = is_op(_OP_SHEAR_X) | is_op(_OP_SHEAR_Y) | is_op(_OP_TRANSLATE_X) \
        | is_op(_OP_TRANSLATE_Y) | is_op(_OP_ROTATE)
    h, w = images.shape[1], images.shape[2]
    from basd_tpu.ops import warp_kernel as _wk

    if _wk.use_fused_warp(images):
        # one VMEM-resident Pallas pass for hflip + quarter-turn + the
        # three shears; identity parameters reproduce the input exactly,
        # so non-geometric samples need no select
        out = _wk.fused_geometric_warp(
            images, angle, shear_x, shear_y, trans_x, trans_y, flip_mask,
            interpret=_wk.warp_impl() == "fused_interpret",
        )
        flip_mask = None  # folded into the kernel's first pass
    elif h == w:
        # gather-free shear-decomposition warp (identity when params are 0;
        # sign conventions are immaterial because magnitudes carry a random
        # sign); non-square images fall back to the gather path.
        #
        # hflip handling: warp(flip(x), p) == flip(warp(x, p~)) where p~
        # negates the x-odd parameters (F R F = R(-psi), F Sx F = Sx(-a),
        # F Sy F = Sy(-b), tx -> -tx). The conjugated form keeps the
        # flip-select OUT of the warp's input: XLA:TPU miscompiles the
        # tap-sweep when its producer is a reverse+select at large mixed
        # batches (6/256 rotations wrong by ~0.9; CPU and isolated-TPU
        # agree, batched-TPU diverges — tools/probe_warp_parity8.py), so
        # the flip is applied to the OUTPUT below instead.
        if flip_mask is not None:
            neg = jnp.where(flip_mask.reshape(b), -1.0, 1.0)
            angle, shear_x, shear_y, trans_x = (
                angle * neg, shear_x * neg, shear_y * neg, trans_x * neg)
        warped = _geometric_warp(images, angle, shear_x, shear_y,
                                 trans_x, trans_y)
        out = jnp.where(geo[:, None, None, None], warped, images)
    else:
        # same hflip conjugation as the square branch (see above)
        if flip_mask is not None:
            neg = jnp.where(flip_mask.reshape(b), -1.0, 1.0)
            angle, shear_x, shear_y, trans_x = (
                angle * neg, shear_x * neg, shear_y * neg, trans_x * neg)
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        # forward op: rotate + shear + translate; build inverse map out->in.
        a11 = cos - sin * shear_y
        a12 = cos * shear_x - sin
        a21 = sin + cos * shear_y
        a22 = sin * shear_x + cos
        det = a11 * a22 - a12 * a21
        inv11, inv12 = a22 / det, -a12 / det
        inv21, inv22 = -a21 / det, a11 / det
        mats = jnp.stack(
            [
                jnp.stack([inv22, inv21, -(inv22 * trans_y + inv21 * trans_x)], -1),
                jnp.stack([inv12, inv11, -(inv12 * trans_y + inv11 * trans_x)], -1),
            ],
            axis=-2,
        )  # (B, 2, 3) acting on (y, x, 1)
        out = jnp.where(
            geo[:, None, None, None], _affine_warp(images, mats), images
        )

    if flip_mask is not None:
        # output-side flip completing the conjugated-parameter hflip;
        # exactly equivalent to flip-then-op for every TA op (geometric
        # by conjugation, photometric/histogram ops by flip-commutation
        # since their params are neutral on geometric samples)
        out = jnp.where(
            flip_mask.reshape(b, 1, 1, 1), out[:, :, ::-1, :], out
        )

    # ---- photometric ops with neutral defaults ----
    factor = 1.0 + sm * 0.99
    f_bright = jnp.where(is_op(_OP_BRIGHTNESS), factor, 1.0)[:, None, None, None]
    out = jnp.clip(out * f_bright, 0.0, 1.0)

    gray = jnp.einsum("bhwc,c->bhw", out, _GRAY)[..., None]
    f_color = jnp.where(is_op(_OP_COLOR), factor, 1.0)[:, None, None, None]
    out = jnp.clip(gray + f_color * (out - gray), 0.0, 1.0)

    mean_gray = jnp.mean(
        jnp.einsum("bhwc,c->bhw", out, _GRAY), axis=(1, 2)
    )[:, None, None, None]
    f_contrast = jnp.where(is_op(_OP_CONTRAST), factor, 1.0)[:, None, None, None]
    out = jnp.clip(mean_gray + f_contrast * (out - mean_gray), 0.0, 1.0)

    blurred = _blur3(out)
    f_sharp = jnp.where(is_op(_OP_SHARPNESS), factor, 1.0)[:, None, None, None]
    out = jnp.clip(blurred + f_sharp * (out - blurred), 0.0, 1.0)

    # posterize: bits in {8..2}: 8 - round(mag * 6); masked select (8-bit
    # quantization is identity on uint8 but not on float images)
    bits = 8.0 - jnp.round(mag * 6.0)
    step = (256.0 / jnp.exp2(bits))[:, None, None, None]
    posterized = jnp.floor(out * 255.0 / step) * step / 255.0
    out = jnp.where(is_op(_OP_POSTERIZE)[:, None, None, None], posterized, out)

    # solarize: invert above threshold; neutral threshold > 1
    thresh = jnp.where(is_op(_OP_SOLARIZE), 1.0 - mag, 2.0)[:, None, None, None]
    out = jnp.where(out >= thresh, 1.0 - out, out)

    out = jnp.where(
        is_op(_OP_AUTOCONTRAST)[:, None, None, None], _autocontrast(out), out
    )
    out = _equalize_masked(out, is_op(_OP_EQUALIZE))
    return out


def _equalize_capacity(b: int) -> int:
    """Gather capacity for the masked-equalize fast path: mean + 8 sigma
    of Binomial(b, 1/14), rounded up to a sublane multiple. P[overflow]
    < 1e-13 at b=256 — and overflow is CORRECT anyway (lax.cond falls
    back to the full-batch path)."""
    if b <= 64:
        return b
    mean = b / 14.0
    return int(min(b, 8 * math.ceil((mean + 8.0 * math.sqrt(mean)) / 8.0)))


def _equalize_masked(
    images: jax.Array, mask: jax.Array, capacity: int | None = None
) -> jax.Array:
    """`where(mask, _equalize(images), images)` without paying the
    histogram machinery for unselected samples.

    TrivialAugment picks equalize for ~1/14 of the batch, but the
    full-batch formulation runs the radix one-hot matmuls (the dominant
    HBM traffic of the photometric chain at 224 px — two (B*C, H*W, 16)
    bf16 one-hots) over every sample. Fast path: pack the selected
    samples into a `capacity`-row gather (static shape, ~mean+8sigma
    rows), equalize the packed subset, scatter back with OOB-drop
    padding rows. A lax.cond falls back to the full-batch path when the
    selection count exceeds capacity, so the semantics are exactly
    `where(mask, ...)` for EVERY mask — the fast path is just the branch
    taken in practice. Same semantics target as torchvision equalize on
    the op-selected samples (reference `src/data/datasets.py:140`)."""
    b = images.shape[0]
    capacity = _equalize_capacity(b) if capacity is None else capacity
    full = lambda imgs: jnp.where(
        mask[:, None, None, None], _equalize(imgs), imgs
    )
    if capacity >= b:
        return full(images)

    def packed(imgs):
        # fill_value=b marks padding rows: clamp for the gather (any
        # valid row; its equalize result is discarded), drop on scatter
        (idx,) = jnp.nonzero(mask, size=capacity, fill_value=b)
        subset = jnp.take(imgs, jnp.minimum(idx, b - 1), axis=0)
        eq = _equalize(subset)
        return imgs.at[idx].set(eq, mode="drop")

    return jax.lax.cond(
        jnp.sum(mask) <= capacity, packed, full, images
    )
