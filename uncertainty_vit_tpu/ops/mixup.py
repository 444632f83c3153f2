"""On-device mixup / cutmix (batch mode) + smoothed soft targets.

timm.data.Mixup semantics as used by the reference
(run_class_finetuning.py:339-346: mixup 0.8, cutmix 1.0, prob 1.0,
switch_prob 0.5, mode='batch', label_smoothing 0.1), re-expressed as one
jittable batch transform: the mixing partner is the flipped batch, one lambda
per batch, cutmix box area correction included. Runs inside the train step on
TPU instead of in CPU dataloader workers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jnp.ndarray, num_classes: int, smoothing: float) -> jnp.ndarray:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _beta(rng, alpha: float, shape=()):
    a = jax.random.gamma(jax.random.fold_in(rng, 0), alpha, shape)
    b = jax.random.gamma(jax.random.fold_in(rng, 1), alpha, shape)
    return a / (a + b)


def _rand_bbox(rng, h: int, w: int, lam):
    """Centered random box with area ratio (1-lam); returns mask [H, W] and
    the area-corrected lambda."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (), 0, h)
    cx = jax.random.randint(rx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)).astype(jnp.float32)
    lam_corrected = 1.0 - (y2 - y1) * (x2 - x1) / float(h * w)
    return box, lam_corrected


def mixup_cutmix(
    rng: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images: [B, H, W, C]; labels: [B] int → (mixed images, soft targets)."""
    r_apply, r_switch, r_lam, r_box = jax.random.split(rng, 4)
    b, h, w, _ = images.shape

    flipped = images[::-1]
    targets1 = one_hot_smooth(labels, num_classes, label_smoothing)
    targets2 = targets1[::-1]

    use_cutmix = jax.random.bernoulli(r_switch, switch_prob)
    lam_mix = _beta(r_lam, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1.0)
    lam_cut = _beta(jax.random.fold_in(r_lam, 2), cutmix_alpha) if cutmix_alpha > 0 else jnp.float32(1.0)

    box, lam_cut_corr = _rand_bbox(r_box, h, w, lam_cut)
    imgs_cutmix = images * (1.0 - box)[None, :, :, None] + flipped * box[None, :, :, None]
    imgs_mixup = images * lam_mix + flipped * (1.0 - lam_mix)

    mixed = jnp.where(use_cutmix, imgs_cutmix, imgs_mixup)
    lam = jnp.where(use_cutmix, lam_cut_corr, lam_mix)

    apply = jax.random.bernoulli(r_apply, prob)
    mixed = jnp.where(apply, mixed, images)
    lam = jnp.where(apply, lam, 1.0)

    targets = targets1 * lam + targets2 * (1.0 - lam)
    return mixed.astype(images.dtype), targets
