"""On-device image augmentation kernels (jit + vmap, NHWC float32).

Replaces the reference's CPU/PIL transform stack (transforms.py,
datasets.py:32-128, timm create_transform pieces) with batched XLA programs
that run on TPU between host decode and the model: random-resized crop
(scale_and_translate), horizontal flip, torch-semantics ColorJitter,
normalization (Inception vs ImageNet stats), timm-style random erasing, and
the eval resize+center-crop. The blockwise mask generator lives in
ops/masking.py; mixup/cutmix in ops/mixup.py.

All single-image functions take [H, W, C] float32 in [0, 1]; `*_batch`
wrappers vmap over per-sample rng folds.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# imported at module scope on purpose: randaugment holds module-level jnp
# constants, and a first import from inside a jit trace would capture them
# as tracers (UnexpectedTracerError on reuse)
from uncertainty_vit_tpu.ops import randaugment

# timm.data.constants
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


DALLE_LOGIT_LAPLACE_EPS = 0.1


def map_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """DALL-E input mapping (1−2ε)·x + ε (the external dall_e.map_pixels the
    reference applies to the tokenizer view, datasets.py:86-102)."""
    return (1.0 - 2.0 * DALLE_LOGIT_LAPLACE_EPS) * x + DALLE_LOGIT_LAPLACE_EPS


def unmap_pixels(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(
        (x - DALLE_LOGIT_LAPLACE_EPS) / (1.0 - 2.0 * DALLE_LOGIT_LAPLACE_EPS), 0.0, 1.0
    )


def to_float(images_u8: jnp.ndarray) -> jnp.ndarray:
    return images_u8.astype(jnp.float32) / 255.0


def normalize(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


def denormalize(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return img * std + mean


# ---------------------------------------------------------------------------
# Horizontal flip
# ---------------------------------------------------------------------------

def random_hflip(key: jax.Array, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, img[:, ::-1, :], img)


# ---------------------------------------------------------------------------
# ColorJitter (torchvision semantics: factors U[max(0,1−v), 1+v], random op order)
# ---------------------------------------------------------------------------

_GRAY_W = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_saturation(img, f):
    gray = (img * _GRAY_W).sum(-1, keepdims=True)
    return jnp.clip(img * f + gray * (1.0 - f), 0.0, 1.0)


def _adjust_contrast(img, f):
    # torchvision: blend with the mean of the grayscale image
    mean = ((img * _GRAY_W).sum(-1)).mean()
    return jnp.clip(img * f + mean * (1.0 - f), 0.0, 1.0)


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.4,
) -> jnp.ndarray:
    kb, kc, ks, ko = jax.random.split(key, 4)

    def factor(k, v):
        return jax.random.uniform(k, (), minval=max(0.0, 1.0 - v), maxval=1.0 + v)

    fb = factor(kb, brightness)
    fc = factor(kc, contrast)
    fs = factor(ks, saturation)

    ops = [
        lambda im: _adjust_brightness(im, fb),
        lambda im: _adjust_contrast(im, fc),
        lambda im: _adjust_saturation(im, fs),
    ]
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]

    def apply_perm(p):
        def f(im):
            for idx in p:
                im = ops[idx](im)
            return im
        return f

    which = jax.random.randint(ko, (), 0, len(perms))
    return jax.lax.switch(which, [apply_perm(p) for p in perms], img)


# ---------------------------------------------------------------------------
# Random resized crop (torchvision RandomResizedCrop.get_params semantics)
# ---------------------------------------------------------------------------

def _rrc_params(
    key: jax.Array,
    h: int,
    w: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    attempts: int = 10,
):
    """Vectorized 10-attempt sampler; falls back to the torch center-crop
    clamp. Returns (top, left, crop_h, crop_w) as traced scalars. h/w may be
    traced per-sample values (letterboxed decode: the RRC samples within the
    image's valid extent on the zero-filled canvas)."""
    h = jnp.asarray(h, jnp.int32)
    w = jnp.asarray(w, jnp.int32)
    area = (h * w).astype(jnp.float32)
    ka, kr, ki, kj = jax.random.split(key, 4)
    target_area = area * jax.random.uniform(
        ka, (attempts,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        kr, (attempts,),
        minval=jnp.log(jnp.float32(ratio[0])), maxval=jnp.log(jnp.float32(ratio[1])),
    )
    aspect = jnp.exp(log_ratio)
    ws = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    hs = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (ws > 0) & (ws <= w) & (hs > 0) & (hs <= h)
    first = jnp.argmax(valid)  # first valid attempt (argmax of bools)
    any_valid = valid.any()
    ch = hs[first]
    cw = ws[first]

    iu = jax.random.uniform(ki, (), minval=0.0, maxval=1.0)
    ju = jax.random.uniform(kj, (), minval=0.0, maxval=1.0)
    top = jnp.floor(iu * (h - ch + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(ju * (w - cw + 1).astype(jnp.float32)).astype(jnp.int32)

    # fallback: clamp aspect to the ratio range, center crop
    in_ratio = w.astype(jnp.float32) / h.astype(jnp.float32)
    too_tall = in_ratio < ratio[0]
    too_wide = in_ratio > ratio[1]
    fw = jnp.where(too_tall, w, jnp.where(
        too_wide, jnp.round(h * jnp.float32(ratio[1])).astype(jnp.int32), w))
    fh = jnp.where(
        too_tall, jnp.round(w / jnp.float32(ratio[0])).astype(jnp.int32), h
    )
    f_top, f_left = (h - fh) // 2, (w - fw) // 2

    ch = jnp.where(any_valid, ch, fh)
    cw = jnp.where(any_valid, cw, fw)
    top = jnp.where(any_valid, top, f_top)
    left = jnp.where(any_valid, left, f_left)
    return top, left, ch, cw


def _cubic_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Keys cubic kernel (a = −0.5) weights for taps at offsets −1..2 from
    floor(position); frac ∈ [0,1). Returns [..., 4]."""
    a = -0.5
    x = jnp.stack([frac + 1.0, frac, 1.0 - frac, 2.0 - frac], axis=-1)
    ax = jnp.abs(x)
    w1 = (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0  # |x| <= 1
    w2 = a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a  # 1 < |x| < 2
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _linear_weights(frac: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.zeros_like(frac), 1.0 - frac, frac, jnp.zeros_like(frac)], axis=-1)


def _resample_axis(img, axis: int, out_size: int, in_start, in_size, method: str):
    """Separable 4-tap resample along `axis`: out pixel centers map to
    in = in_start + (i + 0.5)·(in_size/out) − 0.5 (align_corners=False).
    in_start / in_size may be traced scalars — this lowers to plain gathers,
    unlike jax.image.scale_and_translate whose traced-scale path does not
    compile in reasonable time on TPU."""
    n = img.shape[axis]
    step = in_size.astype(jnp.float32) / out_size
    pos = in_start.astype(jnp.float32) + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * step - 0.5
    base = jnp.floor(pos)
    frac = pos - base
    weights = _cubic_weights(frac) if method == "bicubic" else _linear_weights(frac)  # [O,4]
    idx = jnp.clip(base[:, None].astype(jnp.int32) + jnp.arange(-1, 3)[None, :], 0, n - 1)

    taps = jnp.take(img, idx.reshape(-1), axis=axis)
    new_shape = img.shape[:axis] + (out_size, 4) + img.shape[axis + 1 :]
    taps = taps.reshape(new_shape)
    wshape = [1] * taps.ndim
    wshape[axis], wshape[axis + 1] = out_size, 4
    out = (taps * weights.reshape(wshape)).sum(axis=axis + 1)
    # normalize edge clamping (weights always sum to 1 for these kernels)
    return out


def crop_and_resize(
    img: jnp.ndarray,
    top,
    left,
    crop_h,
    crop_w,
    out_size: Tuple[int, int],
    method: str = "bicubic",
) -> jnp.ndarray:
    """Resize the box [top:top+crop_h, left:left+crop_w] to out_size with a
    separable 4-tap resampler (the crop never materializes; box coords may be
    traced)."""
    oh, ow = out_size
    top = jnp.asarray(top)
    left = jnp.asarray(left)
    crop_h = jnp.asarray(crop_h)
    crop_w = jnp.asarray(crop_w)
    out = _resample_axis(img, 0, oh, top, crop_h, method)
    out = _resample_axis(out, 1, ow, left, crop_w, method)
    return out


def random_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,
    out_size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "bicubic",
) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    top, left, ch, cw = _rrc_params(key, h, w, scale, ratio)
    out = crop_and_resize(img, top, left, ch, cw, (out_size, out_size), method)
    return jnp.clip(out, 0.0, 1.0)


def random_resized_crop_two_pic(
    key: jax.Array,
    img: jnp.ndarray,
    out_size: int,
    second_size: int,
    method: str = "bicubic",
    second_method: str = "bicubic",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two differently-sized resizes of the SAME crop region — the dVAE
    second view (transforms.py:164-183; the reference's lanczos second
    interpolation is approximated by bicubic here)."""
    h, w = img.shape[0], img.shape[1]
    top, left, ch, cw = _rrc_params(key, h, w, (0.08, 1.0), (3.0 / 4.0, 4.0 / 3.0))
    a = crop_and_resize(img, top, left, ch, cw, (out_size, out_size), method)
    b = crop_and_resize(img, top, left, ch, cw, (second_size, second_size), second_method)
    return jnp.clip(a, 0.0, 1.0), jnp.clip(b, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Random erasing (timm RandomErasing, mode='pixel', on normalized images)
# ---------------------------------------------------------------------------

def random_erasing(
    key: jax.Array,
    img: jnp.ndarray,
    prob: float = 0.25,
    scale: Tuple[float, float] = (0.02, 1.0 / 3.0),
    ratio: Tuple[float, float] = (0.3, 10.0 / 3.0),
    attempts: int = 10,
) -> jnp.ndarray:
    h, w, c = img.shape
    kp, ka, kr, ki, kj, kn = jax.random.split(key, 6)
    apply = jax.random.bernoulli(kp, prob)

    area = float(h * w)
    target = area * jax.random.uniform(ka, (attempts,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        kr, (attempts,), minval=jnp.log(jnp.float32(ratio[0])),
        maxval=jnp.log(jnp.float32(ratio[1])),
    )
    aspect = jnp.exp(log_r)
    hs = jnp.round(jnp.sqrt(target * aspect)).astype(jnp.int32)
    ws = jnp.round(jnp.sqrt(target / aspect)).astype(jnp.int32)
    valid = (hs < h) & (ws < w)
    first = jnp.argmax(valid)
    eh, ew = hs[first], ws[first]
    ok = valid.any() & apply

    top = jnp.floor(jax.random.uniform(ki) * (h - eh).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(jax.random.uniform(kj) * (w - ew).astype(jnp.float32)).astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    region = (
        (rows >= top) & (rows < top + eh) & (cols >= left) & (cols < left + ew)
    )[:, :, None]
    noise = jax.random.normal(kn, img.shape, img.dtype)
    return jnp.where(ok & region, noise, img)


# ---------------------------------------------------------------------------
# Eval transform: resize(1/crop_pct) + center crop (datasets.py:221-264)
# ---------------------------------------------------------------------------

def eval_resize_center_crop(
    img: jnp.ndarray, out_size: int, crop_pct: float = 0.9, method: str = "bicubic"
) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    size = int(out_size / crop_pct)
    # torchvision Resize(size): scale the SHORTER side to `size`
    if h <= w:
        nh, nw = size, max(int(round(size * w / h)), size)
    else:
        nw, nh = size, max(int(round(size * h / w)), size)
    resized = jax.image.resize(img, (nh, nw, img.shape[-1]), method=method)
    top, left = (nh - out_size) // 2, (nw - out_size) // 2
    return jnp.clip(
        jax.lax.dynamic_slice(resized, (top, left, 0), (out_size, out_size, img.shape[-1])),
        0.0, 1.0,
    )


# ---------------------------------------------------------------------------
# Batched formulations (planar [B, C, H, W] — TPU-friendly)
#
# Two lessons baked in:
#  - vmapping the per-sample functions makes XLA either execute every
#    lax.switch branch (color jitter: 6 permutations × 3 passes) or compile
#    per-sample gathers pathologically (~200 s for the RRC resampler on v5e);
#  - any f32 temp shaped [..., 3] gets its 3-wide minor dim padded to 128
#    lanes (42.7× HBM blowup — observed OOM at batch 128). So the batched
#    pipeline works in planar [B, C, H, W] (W in the lane dim) and converts
#    at the uint8 input / normalized output boundaries.
# ---------------------------------------------------------------------------

_GRAY_W_PLANAR = jnp.asarray([0.299, 0.587, 0.114], jnp.float32).reshape(1, 3, 1, 1)


def to_planar(images_u8: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] uint8 → [B, C, H, W] float32 in [0, 1]."""
    return images_u8.transpose(0, 3, 1, 2).astype(jnp.float32) / 255.0


def from_planar(imgs: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] → [B, H, W, C]."""
    return imgs.transpose(0, 2, 3, 1)


def _gray_planar(imgs: jnp.ndarray) -> jnp.ndarray:
    return (imgs * _GRAY_W_PLANAR).sum(axis=1, keepdims=True)


def color_jitter_batch(
    key: jax.Array,
    imgs: jnp.ndarray,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.4,
) -> jnp.ndarray:
    """Batched ColorJitter on planar [B, C, H, W] with per-sample factors and
    a per-batch random op order (runtime lax.switch executes one branch).
    Divergence from torchvision (documented): the op order is randomized per
    batch rather than per sample."""
    b = imgs.shape[0]
    kb, kc, ks, ko = jax.random.split(key, 4)

    def factors(k, v):
        return jax.random.uniform(
            k, (b, 1, 1, 1), minval=max(0.0, 1.0 - v), maxval=1.0 + v
        )

    fb = factors(kb, brightness)
    fc = factors(kc, contrast)
    fs = factors(ks, saturation)

    def bright(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def contr(x):
        mean = _gray_planar(x).mean(axis=(2, 3), keepdims=True)
        return jnp.clip(x * fc + mean * (1.0 - fc), 0.0, 1.0)

    def satur(x):
        return jnp.clip(x * fs + _gray_planar(x) * (1.0 - fs), 0.0, 1.0)

    ops = [bright, contr, satur]
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]

    def apply_perm(p):
        def f(x):
            for i in p:
                x = ops[i](x)
            return x
        return f

    which = jax.random.randint(ko, (), 0, len(perms))
    return jax.lax.switch(which, [apply_perm(p) for p in perms], imgs)


def random_hflip_batch(key: jax.Array, imgs: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    """Planar [B, C, H, W]: reverse the minor (lane) axis."""
    flips = jax.random.bernoulli(key, p, (imgs.shape[0], 1, 1, 1))
    return jnp.where(flips, imgs[:, :, :, ::-1], imgs)


def _batched_resample_planar(imgs, axis: int, out_size: int, in_start, in_size, method: str):
    """Batched separable 4-tap resample along spatial axis 2 (H) or 3 (W) of
    planar [B, C, H, W]; in_start/in_size are [B] traced scalars.

    Formulated as a batched matmul with a one-hot interpolation matrix
    (out = W_interp @ rows): per-sample dynamic gathers compile for minutes
    in the v5e TPU compiler, while this einsum rides the MXU and compiles in
    seconds. FLOPs are trivial (≈5 GFLOP for a 128×256²→224² batch)."""
    n = imgs.shape[axis]
    step = in_size.astype(jnp.float32) / out_size  # [B]
    pos = (
        in_start.astype(jnp.float32)[:, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, :] + 0.5) * step[:, None]
        - 0.5
    )  # [B, O]
    base = jnp.floor(pos)
    frac = pos - base
    weights = _cubic_weights(frac) if method == "bicubic" else _linear_weights(frac)  # [B,O,4]
    idx = jnp.clip(
        base[..., None].astype(jnp.int32) + jnp.arange(-1, 3)[None, None, :], 0, n - 1
    )  # [B, O, 4]

    # interp matrix [B, O, N]: sum over taps of weight · one_hot(idx)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3)
    onehot = (idx[..., None] == n_iota).astype(jnp.float32)  # [B, O, 4, N]
    interp = (onehot * weights[..., None]).sum(axis=2)  # [B, O, N]

    if axis == 2:
        return jnp.einsum(
            "bon,bcnw->bcow", interp, imgs, preferred_element_type=jnp.float32
        )
    if axis == 3:
        return jnp.einsum(
            "bon,bchn->bcho", interp, imgs, preferred_element_type=jnp.float32
        )
    raise ValueError(axis)


def crop_and_resize_batch(
    imgs: jnp.ndarray, top, left, crop_h, crop_w, out_size: Tuple[int, int],
    method: str = "bicubic",
) -> jnp.ndarray:
    """Batched crop_and_resize on planar [B, C, H, W] with per-sample boxes."""
    oh, ow = out_size
    out = _batched_resample_planar(imgs, 2, oh, top, crop_h, method)
    out = _batched_resample_planar(out, 3, ow, left, crop_w, method)
    return out


def random_resized_crop_batch(
    key: jax.Array,
    imgs: jnp.ndarray,
    out_size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "bicubic",
    valid_hw: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Planar [B, C, H, W] batched RandomResizedCrop. valid_hw [B, 2] limits
    each sample to its letterboxed valid extent (see data/datasets.py
    letterbox mode) so the crop distribution matches torchvision's RRC over
    the full original image."""
    b, _, h, w = imgs.shape
    keys = jax.random.split(key, b)
    if valid_hw is None:
        top, left, ch, cw = jax.vmap(
            lambda k: _rrc_params(k, h, w, scale, ratio)
        )(keys)
    else:
        top, left, ch, cw = jax.vmap(
            lambda k, vh, vw: _rrc_params(k, vh, vw, scale, ratio)
        )(keys, valid_hw[:, 0], valid_hw[:, 1])
    return jnp.clip(
        crop_and_resize_batch(imgs, top, left, ch, cw, (out_size, out_size), method),
        0.0, 1.0,
    )


def random_erasing_batch(
    key: jax.Array,
    imgs: jnp.ndarray,
    prob: float = 0.25,
    scale: Tuple[float, float] = (0.02, 1.0 / 3.0),
    ratio: Tuple[float, float] = (0.3, 10.0 / 3.0),
    attempts: int = 10,
    mode: str = "pixel",
    count: int = 1,
) -> jnp.ndarray:
    """Planar [B, C, H, W] batched timm RandomErasing. mode: 'pixel'
    (per-pixel noise, timm default) or 'const' (zero fill). timm --recount
    semantics: ONE bernoulli(prob) gate per image, then `count` rectangles
    each drawing target_area = uniform(scale)·area/count."""
    if count <= 0:
        return imgs
    b, c, h, w = imgs.shape
    kp = jax.random.fold_in(key, 0)
    apply = jax.random.bernoulli(kp, prob, (b,))
    for i in range(count):
        imgs = _erase_one(
            jax.random.fold_in(key, 1 + i), imgs, apply,
            (scale[0] / count, scale[1] / count), ratio, attempts, mode,
        )
    return imgs


def _erase_one(key, imgs, apply, scale, ratio, attempts, mode):
    b, c, h, w = imgs.shape
    ka, kr, ki, kj, kn = jax.random.split(key, 5)

    area = float(h * w)
    target = area * jax.random.uniform(ka, (b, attempts), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        kr, (b, attempts), minval=jnp.log(jnp.float32(ratio[0])),
        maxval=jnp.log(jnp.float32(ratio[1])),
    )
    aspect = jnp.exp(log_r)
    hs = jnp.round(jnp.sqrt(target * aspect)).astype(jnp.int32)
    ws = jnp.round(jnp.sqrt(target / aspect)).astype(jnp.int32)
    valid = (hs < h) & (ws < w)
    first = jnp.argmax(valid, axis=1)
    eh = jnp.take_along_axis(hs, first[:, None], 1)[:, 0]
    ew = jnp.take_along_axis(ws, first[:, None], 1)[:, 0]
    ok = valid.any(axis=1) & apply

    top = jnp.floor(
        jax.random.uniform(ki, (b,)) * (h - eh).astype(jnp.float32)
    ).astype(jnp.int32)
    left = jnp.floor(
        jax.random.uniform(kj, (b,)) * (w - ew).astype(jnp.float32)
    ).astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, 1), 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)
    bc = lambda v: v[:, None, None, None]
    region = (
        (rows >= bc(top)) & (rows < bc(top + eh))
        & (cols >= bc(left)) & (cols < bc(left + ew))
    )
    if mode == "const":
        fill = jnp.zeros_like(imgs)
    else:
        fill = jax.random.normal(kn, imgs.shape, imgs.dtype)
    return jnp.where(bc(ok) & region, fill, imgs)


# ---------------------------------------------------------------------------
# Batched pipelines
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("out_size", "aug_level", "imagenet_default_mean_and_std",
                     "color_jitter_strength"),
)
def pretrain_augment_batch(
    key: jax.Array,
    images_u8: jnp.ndarray,
    out_size: int = 224,
    aug_level: int = -1,
    imagenet_default_mean_and_std: bool = True,
    color_jitter_strength: float = 0.4,
    valid_hw: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The DataAugmentationForBEiT ladder (datasets.py:38-84) on device.

    aug_level: 0 center-crop · 1 resize+crop · 2 +hflip · 3 hflip+RRC ·
    4/-1 colorjitter+hflip+RRC (the default path). Input [B, H, W, 3] uint8 →
    normalized float32 [B, S, S, 3].

    valid_hw [B, 2]: letterboxed per-sample extents (--decode_letterbox):
    crops sample within each sample's valid region so the distribution
    matches torchvision over the full original image. The valid region is
    canvas-top-left-anchored, so the hflip moves AFTER the crop (the
    per-sample flip of a crop drawn from a left-right-symmetric
    distribution — distributionally identical to the reference's
    flip-then-crop order, and it never mirrors zero fill into view).
    Levels 0-2 compose resize-shorter+center-crop into one per-sample
    crop_and_resize box over the valid extent.
    """
    mean = IMAGENET_DEFAULT_MEAN if imagenet_default_mean_and_std else IMAGENET_INCEPTION_MEAN
    std = IMAGENET_DEFAULT_STD if imagenet_default_mean_and_std else IMAGENET_INCEPTION_STD
    imgs = to_planar(images_u8)
    kj, kf, kc = jax.random.split(key, 3)

    if aug_level in (4, -1):
        imgs = color_jitter_batch(kj, imgs, color_jitter_strength,
                                  color_jitter_strength, color_jitter_strength)
    if valid_hw is not None:
        vh = valid_hw[:, 0].astype(jnp.float32)
        vw = valid_hw[:, 1].astype(jnp.float32)
        if aug_level in (3, 4, -1):
            out = random_resized_crop_batch(kc, imgs, out_size,
                                            valid_hw=valid_hw)
        else:
            # resize-shorter-to-(out/.875)+center-crop(out) ≡ a centered
            # square box of side .875·shorter over the valid extent,
            # resampled to out (level 0: box side = out, no pre-resize)
            shorter = jnp.minimum(vh, vw)
            side = (
                jnp.minimum(jnp.float32(out_size), shorter)
                if aug_level == 0 else 0.875 * shorter
            )
            sidei = jnp.round(side).astype(jnp.int32)
            top = ((vh - side) / 2.0).astype(jnp.int32)
            left = ((vw - side) / 2.0).astype(jnp.int32)
            out = jnp.clip(
                crop_and_resize_batch(imgs, top, left, sidei, sidei,
                                      (out_size, out_size)),
                0.0, 1.0,
            )
        if aug_level in (2, 3, 4, -1):
            out = random_hflip_batch(kf, out)
        return normalize(from_planar(out), mean, std)
    if aug_level in (2, 3, 4, -1):
        imgs = random_hflip_batch(kf, imgs)
    if aug_level in (3, 4, -1):
        imgs = random_resized_crop_batch(kc, imgs, out_size)
    elif aug_level == 0:
        h, w = imgs.shape[2], imgs.shape[3]
        top, left = (h - out_size) // 2, (w - out_size) // 2
        imgs = imgs[:, :, top : top + out_size, left : left + out_size]
    else:  # aug_level 1, 2: resize shorter side to size/.875 then center crop
        b = imgs.shape[0]
        h, w = imgs.shape[2], imgs.shape[3]
        size = int(out_size / 0.875)
        zeros = jnp.zeros((b,), jnp.int32)
        full_h = jnp.full((b,), h, jnp.int32)
        full_w = jnp.full((b,), w, jnp.int32)
        nh = size if h <= w else int(round(size * h / w))
        nw = int(round(size * w / h)) if h <= w else size
        imgs = _batched_resample_planar(imgs, 2, nh, zeros, full_h, "bicubic")
        imgs = _batched_resample_planar(imgs, 3, nw, zeros, full_w, "bicubic")
        top, left = (nh - out_size) // 2, (nw - out_size) // 2
        imgs = imgs[:, :, top : top + out_size, left : left + out_size]
        imgs = jnp.clip(imgs, 0.0, 1.0)
    return normalize(from_planar(imgs), mean, std)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "color_jitter_strength", "reprob",
                     "imagenet_default_mean_and_std", "hflip", "auto_augment",
                     "aa_magnitude", "aa_magnitude_std", "interpolation",
                     "re_mode", "re_count"),
)
def finetune_train_augment_batch(
    key: jax.Array,
    images_u8: jnp.ndarray,
    out_size: int = 224,
    color_jitter_strength: float = 0.4,
    reprob: float = 0.25,
    imagenet_default_mean_and_std: bool = True,
    hflip: float = 0.5,
    auto_augment: bool = False,
    aa_magnitude: float = 9.0,
    aa_magnitude_std: float = 0.5,
    valid_hw: Optional[jnp.ndarray] = None,
    interpolation: str = "bicubic",
    re_mode: str = "pixel",
    re_count: int = 1,
) -> jnp.ndarray:
    """Finetune train transform core (timm create_transform as invoked at
    run_class_finetuning.py:117 / datasets.py:221-239): RRC + hflip +
    (RandAugment XOR color jitter, timm semantics) + normalize + random
    erasing. auto_augment=True enables the on-device rand-m9-mstd0.5-inc1
    policy (ops/randaugment.py) and disables color jitter, exactly as timm
    does when `--aa` is set. valid_hw: letterboxed per-sample extents (the
    RRC then covers the full original image, --decode_letterbox)."""
    mean = IMAGENET_DEFAULT_MEAN if imagenet_default_mean_and_std else IMAGENET_INCEPTION_MEAN
    std = IMAGENET_DEFAULT_STD if imagenet_default_mean_and_std else IMAGENET_INCEPTION_STD
    imgs = to_planar(images_u8)
    kc, kf, kj, ke = jax.random.split(key, 4)

    imgs = random_resized_crop_batch(
        kc, imgs, out_size, method=interpolation, valid_hw=valid_hw
    )
    imgs = random_hflip_batch(kf, imgs, hflip)
    if auto_augment:
        imgs = randaugment.rand_augment_batch(
            kj, imgs, magnitude=aa_magnitude, magnitude_std=aa_magnitude_std
        )
    elif color_jitter_strength:
        imgs = color_jitter_batch(kj, imgs, color_jitter_strength,
                                  color_jitter_strength, color_jitter_strength)
    pmean = jnp.asarray(mean, jnp.float32).reshape(1, 3, 1, 1)
    pstd = jnp.asarray(std, jnp.float32).reshape(1, 3, 1, 1)
    imgs = (imgs - pmean) / pstd
    if reprob > 0:
        imgs = random_erasing_batch(ke, imgs, prob=reprob, mode=re_mode, count=re_count)
    return from_planar(imgs)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "second_size", "imagenet_default_mean_and_std",
                     "color_jitter_strength", "discrete_vae_type",
                     "second_interpolation"),
)
def pretrain_two_view_batch(
    key: jax.Array,
    images_u8: jnp.ndarray,
    out_size: int = 224,
    second_size: int = 112,
    imagenet_default_mean_and_std: bool = True,
    color_jitter_strength: float = 0.4,
    discrete_vae_type: str = "none",
    second_interpolation: str = "bicubic",
    valid_hw: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DataAugmentationForBEiT two-pic path (datasets.py:70-118), fully
    batched — ONE jitted program per step, no per-sample Python tracing.

    The common image gets ColorJitter(0.4)+HFlip (datasets.py:70-73), then
    ONE _rrc_params draw per sample produces the SAME crop region resampled
    at two output sizes (RandomResizedCropAndInterpolationWithTwoPic,
    transforms.py:164-183). The student view is mean/std-normalized; the
    tokenizer view follows `discrete_vae_type` (datasets.py:86-102):
    'none' → raw [0,1]; 'dall-e' → map_pixels; 'customized' → Inception
    normalize.

    valid_hw [B, 2]: letterboxed per-sample extents (--decode_letterbox) —
    the shared crop samples within each sample's valid region, and the
    shared hflip applies to BOTH output views after the crop (see
    pretrain_augment_batch for why the flip moves)."""
    mean = IMAGENET_DEFAULT_MEAN if imagenet_default_mean_and_std else IMAGENET_INCEPTION_MEAN
    std = IMAGENET_DEFAULT_STD if imagenet_default_mean_and_std else IMAGENET_INCEPTION_STD
    imgs = to_planar(images_u8)
    kj, kf, kc = jax.random.split(key, 3)

    imgs = color_jitter_batch(kj, imgs, color_jitter_strength,
                              color_jitter_strength, color_jitter_strength)
    if valid_hw is None:
        imgs = random_hflip_batch(kf, imgs)

    b, _, h, w = imgs.shape
    keys = jax.random.split(kc, b)
    if valid_hw is None:
        top, left, ch, cw = jax.vmap(
            lambda k: _rrc_params(k, h, w, (0.08, 1.0), (3.0 / 4.0, 4.0 / 3.0))
        )(keys)
    else:
        top, left, ch, cw = jax.vmap(
            lambda k, vh, vw: _rrc_params(k, vh, vw, (0.08, 1.0),
                                          (3.0 / 4.0, 4.0 / 3.0))
        )(keys, valid_hw[:, 0], valid_hw[:, 1])
    first = jnp.clip(
        crop_and_resize_batch(imgs, top, left, ch, cw, (out_size, out_size)), 0.0, 1.0
    )
    second = jnp.clip(
        crop_and_resize_batch(
            imgs, top, left, ch, cw, (second_size, second_size),
            second_interpolation,
        ),
        0.0, 1.0,
    )
    if valid_hw is not None:
        # one flip draw shared by both views (the reference flips the
        # common image before the shared crop)
        flip = jax.random.bernoulli(kf, 0.5, (b,))[:, None, None, None]
        first = jnp.where(flip, first[:, :, :, ::-1], first)
        second = jnp.where(flip, second[:, :, :, ::-1], second)

    first = normalize(from_planar(first), mean, std)
    second = from_planar(second)
    if discrete_vae_type == "dall-e":
        second = map_pixels(second)
    elif discrete_vae_type == "customized":
        second = normalize(second, IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD)
    return first, second


@functools.partial(
    jax.jit, static_argnames=("out_size", "crop_pct", "imagenet_default_mean_and_std")
)
def eval_transform_batch(
    images_u8: jnp.ndarray,
    out_size: int = 224,
    crop_pct: float = 0.9,
    imagenet_default_mean_and_std: bool = True,
) -> jnp.ndarray:
    mean = IMAGENET_DEFAULT_MEAN if imagenet_default_mean_and_std else IMAGENET_INCEPTION_MEAN
    std = IMAGENET_DEFAULT_STD if imagenet_default_mean_and_std else IMAGENET_INCEPTION_STD
    imgs = to_float(images_u8)
    out = jax.vmap(lambda im: eval_resize_center_crop(im, out_size, crop_pct))(imgs)
    return normalize(out, mean, std)
