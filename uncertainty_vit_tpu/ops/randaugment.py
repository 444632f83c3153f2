"""On-device RandAugment (timm 'rand-m9-mstd0.5-inc1' semantics).

The reference's finetune transform uses timm's RandAugment
(run_class_finetuning.py:117, `--aa rand-m9-mstd0.5-inc1`) on CPU/PIL. This
is a batched TPU implementation over planar [B, C, H, W] float images in
[0, 1]:

- per sample and per round (2 rounds), one of 15 ops is drawn with the timm
  increasing-severity parameter maps; magnitude ~ N(9, 0.5) clipped [0, 10];
  each draw applies with probability 0.5;
- the geometric ops (rotate/shear/translate) compose ACROSS rounds into one
  affine matrix per sample and execute as a single gather-free 3-shear
  (Paeth) bilinear warp built from binary conditional rolls (shear_warp);
- the 8 pointwise ops evaluate on the 256 uint8 levels and apply as one
  two-level 16×16 LUT matmul per round (apply_lut);
- documented approximations vs PIL: equalize uses a strided-subsample
  histogram; posterize keeps max(4−⌊4m/10⌋, 1) bits; stats-dependent ops
  see the unwarped image when a geometric op fired in an earlier round
  (~1.7% of samples); fill-border behavior of sequential shears differs
  slightly from a single-pass warp.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

_GRAY_W = jnp.asarray([0.299, 0.587, 0.114], jnp.float32).reshape(1, 3, 1, 1)

NUM_OPS = 15
(AUTOCONTRAST, EQUALIZE, INVERT, ROTATE, POSTERIZE, SOLARIZE, SOLARIZE_ADD,
 COLOR, CONTRAST, BRIGHTNESS, SHARPNESS, SHEAR_X, SHEAR_Y, TRANSLATE_X,
 TRANSLATE_Y) = range(NUM_OPS)
_GEOMETRIC = (ROTATE, SHEAR_X, SHEAR_Y, TRANSLATE_X, TRANSLATE_Y)


# ---------------------------------------------------------------------------
# Pixel ops (planar [B, C, H, W], values in [0, 1])
# ---------------------------------------------------------------------------

def _gray(x):
    return (x * _GRAY_W).sum(axis=1, keepdims=True)


def autocontrast(x):
    lo = x.min(axis=(2, 3), keepdims=True)
    hi = x.max(axis=(2, 3), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.clip((x - lo) * scale, 0.0, 1.0)


def apply_lut(x, lut):
    """Apply a per-(sample, channel) 256-entry LUT to [B, C, H, W] pixels.

    TWO-LEVEL 16×16 bilinear form — one-hot(high nibble) @ T, masked by
    one-hot(low nibble) — whose [pixels, 16] intermediates carry 16× less
    HBM than a flat [pixels, 256] one-hot (measured ~30 ms → ~1.5 ms
    in-jit at batch 128×224²). 256-level quantization of the input IS the
    PIL/uint8 semantics every pointwise RandAugment op is defined on."""
    b, c, h, w = x.shape
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0), 0, 255).astype(
        jnp.int32
    ).reshape(b, c, -1)
    hi, lo = q >> 4, q & 15
    table = lut.reshape(b, c, 16, 16).astype(jnp.bfloat16)  # T[hi, lo]
    oh_hi = jax.nn.one_hot(hi, 16, dtype=jnp.bfloat16)
    rows = jnp.einsum("bcpi,bcij->bcpj", oh_hi, table)
    oh_lo = jax.nn.one_hot(lo, 16, dtype=jnp.bfloat16)
    out = (rows * oh_lo).sum(-1)
    return out.reshape(b, c, h, w).astype(x.dtype)


def equalize_lut(x, hist_stride: int = 4):
    """Per-(sample, channel) equalization cdf LUT [B, C, 256] (PIL
    approximation) from a strided subsample. The histogram is a two-level
    one-hot matmul (nibble outer product, f32 accumulation) — sort +
    searchsorted measured 18 ms in-jit at batch 128 (XLA lowers the batched
    binary search to gather chains); this runs in ~1 ms."""
    b, c = x.shape[0], x.shape[1]
    sub = x[:, :, ::hist_stride, ::hist_stride].reshape(b, c, -1)
    q = jnp.clip(jnp.round(sub.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.int32)
    oh_hi = jax.nn.one_hot(q >> 4, 16, dtype=jnp.bfloat16)
    oh_lo = jax.nn.one_hot(q & 15, 16, dtype=jnp.bfloat16)
    hist = jnp.einsum(
        "bcpi,bcpj->bcij", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(b, c, 256)
    cdf = jnp.cumsum(hist, axis=-1)
    return cdf / cdf[..., -1:]


def equalize(x, hist_stride: int = 4):
    """cdf-LUT histogram equalization per channel (PIL approximation)."""
    return apply_lut(x, equalize_lut(x, hist_stride))


def invert(x):
    return 1.0 - x


def posterize(x, bits):
    """Keep `bits` bits per channel; bits: [B] int."""
    levels = (2.0 ** bits.astype(jnp.float32)).reshape(-1, 1, 1, 1)
    return jnp.floor(x * 255.0 / (256.0 / levels)) * (256.0 / levels) / 255.0


def solarize(x, thresh):
    return jnp.where(x >= thresh.reshape(-1, 1, 1, 1), 1.0 - x, x)


def solarize_add(x, add, thresh: float = 128.0 / 255.0):
    return jnp.where(x < thresh, jnp.clip(x + add.reshape(-1, 1, 1, 1), 0.0, 1.0), x)


def color(x, f):
    f = f.reshape(-1, 1, 1, 1)
    return jnp.clip(x * f + _gray(x) * (1.0 - f), 0.0, 1.0)


def contrast(x, f):
    f = f.reshape(-1, 1, 1, 1)
    mean = _gray(x).mean(axis=(2, 3), keepdims=True)
    return jnp.clip(x * f + mean * (1.0 - f), 0.0, 1.0)


def brightness(x, f):
    return jnp.clip(x * f.reshape(-1, 1, 1, 1), 0.0, 1.0)


def sharpness(x, f):
    """PIL SMOOTH kernel blend: 3×3 [[1,1,1],[1,5,1],[1,1,1]]/13."""
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    c = x.shape[1]
    k = jnp.broadcast_to(kernel, (c, 1, 3, 3))
    smooth = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
    )
    f = f.reshape(-1, 1, 1, 1)
    return jnp.clip(x * f + smooth * (1.0 - f), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Affine warp (one pass for all geometric ops)
# ---------------------------------------------------------------------------

def affine_warp(x, mats, method: str = "nearest"):
    """Affine warp with zero fill. mats: [B, 2, 3] mapping OUTPUT pixel
    coords (y, x, 1) around the image center to input coords.

    Per-pixel gathers run at scalar rate on this backend (~90M elem/s), so
    the default is nearest sampling — ONE broadcast-over-channels gather per
    image (timm/PIL use bilinear; divergence documented). Pass
    method='bilinear' for the 4-tap exact version (≈4× cost)."""
    b, c, h, w = x.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - (h - 1) / 2.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - (w - 1) / 2.0
    ones = jnp.ones_like(yy)
    coords = jnp.stack([yy, xx, ones]).reshape(3, -1)  # [3, HW]
    src = jnp.einsum("bij,jp->bip", mats, coords)  # [B, 2, HW]
    sy = src[:, 0] + (h - 1) / 2.0
    sx = src[:, 1] + (w - 1) / 2.0
    flat = x.reshape(b, c, h * w)

    if method == "nearest":
        yi = jnp.round(sy)
        xi = jnp.round(sx)
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        tap = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        out = tap * valid[:, None, :].astype(x.dtype)
        return out.reshape(b, c, h, w)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    out = jnp.zeros((b, c, h * w), x.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            tap = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
            wgt = ((wy if dy else 1 - wy) * (wx if dx else 1 - wx) * valid)[:, None, :]
            out = out + tap * wgt.astype(x.dtype)
    return out.reshape(b, c, h, w)


# ---------------------------------------------------------------------------
# Roll-based shear warp (gather-free)
# ---------------------------------------------------------------------------
#
# take_along_axis gathers run at scalar rate on this backend (~57 ms for one
# nearest warp at batch 128×224²). RandAugment's geometric ops are all
# UNIMODULAR (rotations, shears, translations — never scale), so any
# composition decomposes into three axis-aligned shear passes
# (Paeth/Tanaka 3-shear rotation, generalized):
#     M = Shx(αL, tL=0) · Shy(β, tC) · Shx(αR, tR)
# with β = m01, αL = (m11−1)/m01, αR = (m00−1)/m01 (safe branch for
# m01 → 0). Each pass shifts every row (or column) by a per-row constant —
# expressed as 8 binary conditional jnp.rolls (contiguous vector copies) +
# a 2-tap fractional blend, so the whole warp is rolls, selects, and
# multiplies: no gathers. Bilinear quality matches the classic 3-shear
# rotation; zero fill applied per pass.


def _shift_pass(x, delta, axis: int):
    """out[..., i, ...] = x[..., i + delta, ...] along `axis` (bilinear,
    zero fill). delta: [B, L_other] per-sample per-orthogonal-line shifts."""
    b = x.shape[0]
    n = x.shape[axis]
    k = jnp.floor(delta)
    frac = (delta - k).astype(x.dtype)  # [B, L]
    # out0[i] = x[i + k]  ⇔  roll by −k (mod n)
    neg = jnp.mod(-k.astype(jnp.int32), n)
    if axis == 3:
        expand = lambda t: t[:, None, :, None]   # lines indexed by y
    else:
        expand = lambda t: t[:, None, None, :]   # lines indexed by x
    out = x
    for bit in range(max(1, (n - 1).bit_length())):
        m = ((neg >> bit) & 1).astype(bool)
        out = jnp.where(expand(m), jnp.roll(out, 1 << bit, axis=axis), out)
    tap1 = jnp.roll(out, -1, axis=axis)
    f = expand(frac)
    res = out * (1 - f) + tap1 * f
    # zero-fill where the (pre-wrap) source coordinate leaves the image
    pos = jnp.arange(n, dtype=jnp.float32)
    if axis == 3:
        src = pos[None, None, :] + delta[:, :, None]      # [B, H, W]
        valid = ((src >= 0) & (src <= n - 1))[:, None, :, :]
    else:
        src = pos[None, :, None] + delta[:, None, :]      # [B, H, W]
        valid = ((src >= 0) & (src <= n - 1))[:, None, :, :]
    return res * valid.astype(x.dtype)


def shear_warp(x, mats):
    """Gather-free equivalent of affine_warp(…, 'bilinear') for unimodular
    mats [B, 2, 3] (output (y, x, 1) centered → input (y, x) centered)."""
    b, c, h, w = x.shape
    m00, m01, m02 = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    m10, m11, m12 = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]

    tiny = jnp.abs(m01) < 1e-6
    safe = jnp.where(tiny, 1.0, m01)
    beta = m01
    a_l = jnp.where(tiny, m10, (m11 - 1.0) / safe)
    a_r = jnp.where(tiny, jnp.zeros_like(m00), (m00 - 1.0) / safe)
    t_r = m12 - a_l * m02
    t_c = m02 - beta * t_r

    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0

    # image-order: L pass first, then C, then R (final[p] = x[L·C·R·p])
    x1 = _shift_pass(x, a_l[:, None] * yy[None, :], axis=3)
    x2 = _shift_pass(x1, beta[:, None] * xx[None, :] + t_c[:, None], axis=2)
    return _shift_pass(x2, a_r[:, None] * yy[None, :] + t_r[:, None], axis=3)


def _affine_for_op(op_idx, magnitude, sign, h: int, w: int):
    """Per-sample affine matrix (output→input) for the selected geometric op;
    identity for non-geometric ops. op_idx/magnitude/sign: [B]."""
    m = magnitude * sign
    rot = jnp.deg2rad(m / 10.0 * 30.0)
    shear = m / 10.0 * 0.3
    tx = m / 10.0 * 0.45 * w
    ty = m / 10.0 * 0.45 * h

    cos, sin = jnp.cos(rot), jnp.sin(rot)
    zeros = jnp.zeros_like(m)
    ones = jnp.ones_like(m)

    def mat(a, b_, c_, d, e, f):
        return jnp.stack(
            [jnp.stack([a, b_, c_], -1), jnp.stack([d, e, f], -1)], axis=-2
        )  # [B, 2, 3]

    identity = mat(ones, zeros, zeros, zeros, ones, zeros)
    mats = identity
    # inverse maps (output→input): rotate by −θ; shear subtracts
    mats = jnp.where((op_idx == ROTATE)[:, None, None],
                     mat(cos, -sin, zeros, sin, cos, zeros), mats)
    mats = jnp.where((op_idx == SHEAR_X)[:, None, None],
                     mat(ones, zeros, zeros, shear, ones, zeros), mats)
    mats = jnp.where((op_idx == SHEAR_Y)[:, None, None],
                     mat(ones, shear, zeros, zeros, ones, zeros), mats)
    mats = jnp.where((op_idx == TRANSLATE_X)[:, None, None],
                     mat(ones, zeros, zeros, zeros, ones, tx), mats)
    mats = jnp.where((op_idx == TRANSLATE_Y)[:, None, None],
                     mat(ones, zeros, ty, zeros, ones, zeros), mats)
    return mats


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _one_round(key, x, magnitude_mean: float, magnitude_std: float, prob: float):
    """One RandAugment round. Cost model (the whole point of this layout):

    - 8 of the 15 ops are per-channel POINTWISE maps — their action is fully
      described by a 256-entry LUT, so instead of computing each op on the
      full [B, C, H, W] image and selecting ("compute-all-select", ~80 ms a
      round at batch 128×224²), the ops are evaluated on the 256 LEVELS
      (B·C·256 elements — free), the per-sample LUT is selected, and ONE
      apply_lut pass touches the pixels. 256-level quantization is exactly
      the uint8 domain PIL defines these ops on.
    - color (channel mix) and sharpness (3×3 blend) are not pointwise and
      keep full-image evaluation.
    - geometric ops return their affine matrix; the driver applies ONE
      composed shear warp after all rounds (warps compose exactly as matrix
      products; a single resample halves cost and avoids double-blur).
      Commuting a pixel op past the warp is exact for the pointwise maps
      away from the zero-fill border, but the STATS-dependent ops
      (autocontrast/equalize/contrast) compute their min/max/histogram/mean
      on the unwarped image, where timm would include the fill pixels of an
      earlier-round warp — affects the ~1.7% of samples that draw a
      geometric op in round 1 and a stats op in round 2 (documented
      divergence, also noted in PARITY.md).
    """
    b, c = x.shape[0], x.shape[1]
    h, w = x.shape[2], x.shape[3]
    k_op, k_mag, k_sign, k_apply = jax.random.split(key, 4)
    op_idx = jax.random.randint(k_op, (b,), 0, NUM_OPS)
    mag = jnp.clip(
        magnitude_mean + magnitude_std * jax.random.normal(k_mag, (b,)), 0.0, 10.0
    )
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
    apply = jax.random.bernoulli(k_apply, prob, (b,))

    frac = mag / 10.0
    enhance_f = 1.0 + sign * 0.9 * frac  # timm increasing enhance factor

    # ---- per-sample 256-entry LUTs for the pointwise ops ----
    v = jnp.linspace(0.0, 1.0, 256)[None, None, :]           # [1, 1, 256]
    flat = x.reshape(b, c, -1).astype(jnp.float32)
    lo = flat.min(-1)[..., None]                             # [B, C, 1]
    hi = flat.max(-1)[..., None]
    ac_scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    gray_mean = _gray(x).astype(jnp.float32).mean(axis=(2, 3))  # [B, 1]
    f1 = enhance_f[:, None, None].astype(jnp.float32)
    bits = jnp.maximum(4 - jnp.floor(frac * 4), 1.0)[:, None, None]
    levels = 2.0 ** bits
    keep = 256.0 / levels

    luts = {
        AUTOCONTRAST: jnp.clip((v - lo) * ac_scale, 0.0, 1.0),
        EQUALIZE: equalize_lut(x),
        INVERT: jnp.broadcast_to(1.0 - v, (b, c, 256)),
        POSTERIZE: jnp.floor(v * 255.0 / keep) * keep / 255.0,
        SOLARIZE: jnp.where(v >= (1.0 - frac)[:, None, None], 1.0 - v, v),
        SOLARIZE_ADD: jnp.where(
            v < 128.0 / 255.0,
            jnp.clip(v + (frac * 110.0 / 255.0)[:, None, None], 0.0, 1.0), v,
        ),
        CONTRAST: jnp.clip(v * f1 + gray_mean[:, :, None] * (1.0 - f1), 0.0, 1.0),
        BRIGHTNESS: jnp.clip(v * f1, 0.0, 1.0),
    }
    lut = jnp.broadcast_to(v, (b, c, 256))  # identity
    for i, li in luts.items():
        lut = jnp.where((op_idx == i)[:, None, None], jnp.broadcast_to(li, lut.shape), lut)
    out = apply_lut(x, lut)

    # ---- non-pointwise pixel ops ----
    out = jnp.where((op_idx == COLOR)[:, None, None, None], color(x, enhance_f), out)
    out = jnp.where((op_idx == SHARPNESS)[:, None, None, None], sharpness(x, enhance_f), out)
    is_geo = jnp.isin(op_idx, jnp.asarray(_GEOMETRIC))
    out = jnp.where(is_geo[:, None, None, None], x, out)
    out = jnp.where(apply[:, None, None, None], out, x)

    mats = _affine_for_op(op_idx, mag, sign, h, w)
    identity = jnp.broadcast_to(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), mats.shape
    )
    mats = jnp.where((is_geo & apply)[:, None, None], mats, identity)
    return out, mats


@functools.partial(
    jax.jit, static_argnames=("num_layers", "magnitude", "magnitude_std", "prob")
)
def rand_augment_batch(
    key: jax.Array,
    imgs: jnp.ndarray,
    num_layers: int = 2,
    magnitude: float = 9.0,
    magnitude_std: float = 0.5,
    prob: float = 0.5,
) -> jnp.ndarray:
    """timm rand-m{magnitude}-mstd{magnitude_std} over planar [B,C,H,W].

    Internally runs in bfloat16 (≈ uint8 image precision) to halve the
    elementwise traffic of the compute-all-select op evaluation.
    """
    orig_dtype = imgs.dtype
    imgs = imgs.astype(jnp.bfloat16)
    b = imgs.shape[0]
    hom_row = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), (b, 1, 3))
    total = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    for r in range(num_layers):
        imgs, mats = _one_round(
            jax.random.fold_in(key, r), imgs, magnitude, magnitude_std, prob
        )
        # warp_{A2}(warp_{A1}(x)) ≡ warp_{A1·A2}(x) for out→in maps
        total = jnp.einsum(
            "bij,bjk->bik", total, jnp.concatenate([mats, hom_row], axis=1)
        )
    imgs = shear_warp(imgs, total[:, :2, :])
    return imgs.astype(orig_dtype)
