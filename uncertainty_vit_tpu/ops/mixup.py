"""On-device mixup / cutmix (batch / elem / pair modes) + smoothed targets.

timm.data.Mixup semantics as used by the reference
(run_class_finetuning.py:339-346: mixup 0.8, cutmix 1.0, prob 1.0,
switch_prob 0.5, mode='batch', label_smoothing 0.1), re-expressed as one
jittable batch transform: the mixing partner is the flipped batch, cutmix
box area correction included. Runs inside the train step on TPU instead of
in CPU dataloader workers.

Modes (timm Mixup._mix_batch/_mix_elem/_mix_pair):
  - 'batch': ONE lambda / box / apply draw shared by the whole batch.
  - 'elem': independent lambda / box / cutmix-switch / apply PER SAMPLE.
  - 'pair': draws for the first half, mirrored onto the flipped partner —
    sample i and its partner B−1−i share the same lambda and box (timm
    mixes both directions in-place with one draw; requires even B).
cutmix_minmax (timm rand_bbox_minmax): box height/width drawn uniformly in
[h·min, h·max) instead of from the lambda ratio; lambda then comes from the
realized box area (correct_lam forced on, as in timm).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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


def _rand_bbox_minmax(rng, h: int, w: int, minmax):
    """timm rand_bbox_minmax: cut size uniform in [dim·min, dim·max), corner
    uniform so the box never clips; lambda from the realized area."""
    lo_h, hi_h = int(h * minmax[0]), int(h * minmax[1])
    lo_w, hi_w = int(w * minmax[0]), int(w * minmax[1])
    if lo_h >= hi_h or lo_w >= hi_w:
        # timm's np.random.randint(lo, hi) raises for lo >= hi — bounds that
        # collapse after int() (e.g. (0.199, 0.2) at 224px) must error, not
        # silently train a constant-size cut. h/w/minmax are trace-time
        # constants, so this is a clean Python error.
        raise ValueError(
            f"cutmix_minmax {tuple(minmax)} collapses at image size "
            f"{(h, w)}: int bounds h[{lo_h},{hi_h}) w[{lo_w},{hi_w}) are "
            "empty (timm raises here too)"
        )
    rh, rw, ry, rx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(rh, (), lo_h, hi_h)
    cut_w = jax.random.randint(rw, (), lo_w, hi_w)
    y1 = jax.random.randint(ry, (), 0, h - cut_h)
    x1 = jax.random.randint(rx, (), 0, w - cut_w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((rows >= y1) & (rows < y1 + cut_h)
           & (cols >= x1) & (cols < x1 + cut_w)).astype(jnp.float32)
    lam = 1.0 - (cut_h * cut_w) / float(h * w)
    return box, lam


def _elem_params(rng, count: int, h: int, w: int, mixup_alpha, cutmix_alpha,
                 prob, switch_prob, cutmix_minmax):
    """Per-sample draws (timm Mixup._params_per_elem): returns
    (apply [count] bool, use_cutmix [count] bool, lam [count] f32 — already
    area-corrected for cutmix elements, box [count, H, W] f32)."""
    r_apply, r_switch, r_lam_mix, r_lam_cut, r_box = jax.random.split(rng, 5)
    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.bernoulli(r_switch, switch_prob, (count,))
    elif cutmix_alpha > 0:
        use_cutmix = jnp.ones((count,), bool)
    else:
        use_cutmix = jnp.zeros((count,), bool)
    lam_mix = (_beta(r_lam_mix, mixup_alpha, (count,)) if mixup_alpha > 0
               else jnp.ones((count,), jnp.float32))
    lam_cut = (_beta(r_lam_cut, cutmix_alpha, (count,)) if cutmix_alpha > 0
               else jnp.ones((count,), jnp.float32))
    box_rngs = jax.random.split(r_box, count)
    if cutmix_minmax is not None:
        box, lam_cut_corr = jax.vmap(
            lambda r: _rand_bbox_minmax(r, h, w, cutmix_minmax)
        )(box_rngs)
    else:
        box, lam_cut_corr = jax.vmap(
            lambda r, l: _rand_bbox(r, h, w, l)
        )(box_rngs, lam_cut)
    apply = jax.random.bernoulli(r_apply, prob, (count,))
    lam = jnp.where(use_cutmix, lam_cut_corr, lam_mix)
    return apply, use_cutmix, lam, box


def _mix_per_elem(images, targets1, apply, use_cutmix, lam, box):
    """Apply per-sample mixup/cutmix given drawn params. The partner is the
    flipped batch (timm j = B−1−i)."""
    flipped = images[::-1]
    targets2 = targets1[::-1]
    # box only cuts where cutmix is both selected and applied
    box = box * (use_cutmix & apply).astype(jnp.float32)[:, None, None]
    lam_t = jnp.where(apply, lam, 1.0)  # label-space lambda
    # pixel-space mixup lambda: 1 for cutmix / unapplied elements
    lam_m = jnp.where(apply & ~use_cutmix, lam, 1.0)[:, None, None, None]
    mixed = images * lam_m + flipped * (1.0 - lam_m)
    mixed = mixed * (1.0 - box)[..., None] + flipped * box[..., None]
    targets = targets1 * lam_t[:, None] + targets2 * (1.0 - lam_t[:, None])
    return mixed.astype(images.dtype), targets


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
    mode: str = "batch",
    cutmix_minmax: Optional[Sequence[float]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images: [B, H, W, C]; labels: [B] int → (mixed images, soft targets).

    mode/cutmix_minmax are static (trace-time); see module docstring."""
    if cutmix_minmax is not None:
        if len(cutmix_minmax) != 2:
            raise ValueError("cutmix_minmax must be (min, max)")
        cutmix_alpha = 1.0  # timm Mixup.__init__ forces this when minmax set
    b, h, w, _ = images.shape
    targets1 = one_hot_smooth(labels, num_classes, label_smoothing)

    if mode == "elem":
        params = _elem_params(rng, b, h, w, mixup_alpha, cutmix_alpha,
                              prob, switch_prob, cutmix_minmax)
        return _mix_per_elem(images, targets1, *params)
    if mode == "pair":
        if b % 2 != 0:
            raise ValueError("mixup_mode='pair' requires an even batch size")
        half = b // 2
        apply, use_cutmix, lam, box = _elem_params(
            rng, half, h, w, mixup_alpha, cutmix_alpha, prob, switch_prob,
            cutmix_minmax,
        )
        # mirror the draws onto the partner half: i and B−1−i share params
        # (timm _mix_pair mixes both directions in one loop iteration)
        mirror = lambda t: jnp.concatenate([t, t[::-1]], axis=0)
        return _mix_per_elem(images, targets1, mirror(apply),
                             mirror(use_cutmix), mirror(lam), mirror(box))
    if mode != "batch":
        raise ValueError(f"unknown mixup mode {mode!r}")

    r_apply, r_switch, r_lam, r_box = jax.random.split(rng, 4)
    flipped = images[::-1]
    targets2 = targets1[::-1]

    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.bernoulli(r_switch, switch_prob)
    elif cutmix_alpha > 0:
        use_cutmix = jnp.bool_(True)
    else:
        use_cutmix = jnp.bool_(False)
    lam_mix = _beta(r_lam, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1.0)
    lam_cut = _beta(jax.random.fold_in(r_lam, 2), cutmix_alpha) if cutmix_alpha > 0 else jnp.float32(1.0)

    if cutmix_minmax is not None:
        box, lam_cut_corr = _rand_bbox_minmax(r_box, h, w, cutmix_minmax)
    else:
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
