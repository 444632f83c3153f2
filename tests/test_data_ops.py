"""Tests for the on-device masking generator and augmentation kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops import augment as A
from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask, blockwise_mask
from uncertainty_vit_tpu.ops.mixup import mixup_cutmix, one_hot_smooth


# ---------------------------------------------------------------------------
# Blockwise masking
# ---------------------------------------------------------------------------

def reference_blockwise_mask(rng, height=14, width=14, num_masking=120, min_num=16,
                             max_num=None, min_aspect=0.3):
    """Independent numpy implementation of the documented algorithm
    (masking_generator.py:29-92) for distribution comparison."""
    import math
    max_num = num_masking if max_num is None else max_num
    log_l, log_u = math.log(min_aspect), math.log(1 / min_aspect)
    mask = np.zeros((height, width), dtype=np.int64)
    count = 0
    while count < num_masking:
        remaining = min(num_masking - count, max_num)
        delta = 0
        for _ in range(10):
            target_area = rng.uniform(min_num, remaining)
            aspect = math.exp(rng.uniform(log_l, log_u))
            h = int(round(math.sqrt(target_area * aspect)))
            w = int(round(math.sqrt(target_area / aspect)))
            if w < width and h < height:
                top = rng.randint(0, height - h + 1)
                left = rng.randint(0, width - w + 1)
                overlap = mask[top:top + h, left:left + w].sum()
                d = h * w - overlap
                if 0 < d <= remaining:
                    mask[top:top + h, left:left + w] = 1
                    delta = d
            if delta > 0:
                break
        if delta == 0:
            break
        count = int(mask.sum())
    return mask


def test_blockwise_mask_shape_and_count():
    masks = batched_blockwise_mask(jax.random.PRNGKey(0), 64)
    assert masks.shape == (64, 196)
    counts = np.asarray(masks.sum(axis=1))
    # never exceeds the target; overwhelmingly reaches it for recipe settings
    assert counts.max() <= 120
    assert counts.mean() > 110, counts.mean()
    assert (np.asarray(masks) >= 0).all() and (np.asarray(masks) <= 1).all()


def test_blockwise_mask_distribution_close_to_reference():
    rng = np.random.RandomState(0)
    ref_counts = [reference_blockwise_mask(rng).sum() for _ in range(50)]
    masks = batched_blockwise_mask(jax.random.PRNGKey(1), 50)
    ours = np.asarray(masks.sum(axis=1))
    assert abs(np.mean(ref_counts) - ours.mean()) < 6.0, (np.mean(ref_counts), ours.mean())


def test_blockwise_mask_blocks_are_contiguousish():
    """Masked patches form rectangles; a mask of 120/196 patches should have
    far fewer connected components than random scatter."""
    mask = np.asarray(blockwise_mask(jax.random.PRNGKey(2))).astype(int)
    from scipy import ndimage

    _, n_components = ndimage.label(mask)
    assert n_components <= 10, n_components


def test_mask_deterministic_per_key():
    a = blockwise_mask(jax.random.PRNGKey(3))
    b = blockwise_mask(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = blockwise_mask(jax.random.PRNGKey(4))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


# ---------------------------------------------------------------------------
# Augmentation ops
# ---------------------------------------------------------------------------

def test_color_jitter_ops_match_torch_formulas():
    rs = np.random.RandomState(0)
    img = rs.rand(8, 8, 3).astype(np.float32)
    f = 1.3
    out_b = np.asarray(A._adjust_brightness(jnp.asarray(img), f))
    np.testing.assert_allclose(out_b, np.clip(img * f, 0, 1), rtol=1e-5)

    gray = (img * np.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    out_s = np.asarray(A._adjust_saturation(jnp.asarray(img), f))
    np.testing.assert_allclose(out_s, np.clip(img * f + gray * (1 - f), 0, 1), rtol=1e-4, atol=1e-5)

    out_c = np.asarray(A._adjust_contrast(jnp.asarray(img), f))
    np.testing.assert_allclose(out_c, np.clip(img * f + gray.mean() * (1 - f), 0, 1), rtol=1e-4, atol=1e-5)


def test_random_resized_crop_shapes_and_determinism():
    img = jnp.asarray(np.random.RandomState(0).rand(64, 48, 3).astype(np.float32))
    out = A.random_resized_crop(jax.random.PRNGKey(0), img, 32)
    assert out.shape == (32, 32, 3)
    out2 = A.random_resized_crop(jax.random.PRNGKey(0), img, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    out3 = A.random_resized_crop(jax.random.PRNGKey(1), img, 32)
    assert not np.allclose(np.asarray(out), np.asarray(out3))
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_crop_and_resize_identity_box():
    """Full-image box with matching output size ≈ identity."""
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3).astype(np.float32))
    out = A.crop_and_resize(
        img, jnp.int32(0), jnp.int32(0), jnp.int32(16), jnp.int32(16), (16, 16),
        method="linear",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_crop_and_resize_subbox_unit_scale_matches_slice():
    """With crop size == output size (scale 1, integer translation), linear
    resampling is exact, so the result must equal the plain slice."""
    img = jnp.asarray(np.arange(16 * 16 * 1, dtype=np.float32).reshape(16, 16, 1))
    out = A.crop_and_resize(
        img, jnp.int32(4), jnp.int32(6), jnp.int32(8), jnp.int32(8), (8, 8),
        method="linear",
    )
    np.testing.assert_allclose(np.asarray(out)[..., 0], np.asarray(img)[4:12, 6:14, 0], atol=1e-4)


def test_two_pic_same_region():
    # smooth gradient image: the sampler has no antialiasing, so random-noise
    # content would alias under downscale and mask the same-region property
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    img = jnp.asarray(np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32))
    a, b = A.random_resized_crop_two_pic(
        jax.random.PRNGKey(5), img, 32, 16, method="linear", second_method="linear"
    )
    assert a.shape == (32, 32, 3) and b.shape == (16, 16, 3)
    # second view is the same region: downsampled first ≈ second
    a_small = jax.image.resize(a, (16, 16, 3), method="linear")
    assert float(jnp.abs(a_small - b).mean()) < 0.06


def test_random_erasing_region_and_prob():
    img = jnp.zeros((32, 32, 3), jnp.float32)
    out = A.random_erasing(jax.random.PRNGKey(0), img, prob=1.0)
    changed = np.asarray((out != 0).any(-1))
    assert changed.any()
    # the erased region is a rectangle
    rows = np.where(changed.any(1))[0]
    cols = np.where(changed.any(0))[0]
    sub = changed[rows.min():rows.max() + 1, cols.min():cols.max() + 1]
    assert sub.all()
    # prob=0 → untouched
    out0 = A.random_erasing(jax.random.PRNGKey(0), img, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out0), 0.0)


def test_eval_resize_center_crop():
    img = jnp.asarray(np.random.RandomState(0).rand(100, 80, 3).astype(np.float32))
    out = A.eval_resize_center_crop(img, 32, crop_pct=0.9)
    assert out.shape == (32, 32, 3)


def test_batched_pipelines_run():
    imgs = np.random.RandomState(0).randint(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    out = A.pretrain_augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs), out_size=32)
    assert out.shape == (4, 32, 32, 3)
    out_ft = A.finetune_train_augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs), out_size=32)
    assert out_ft.shape == (4, 32, 32, 3)
    out_ev = A.eval_transform_batch(jnp.asarray(imgs), out_size=32)
    assert out_ev.shape == (4, 32, 32, 3)
    for o in (out, out_ft, out_ev):
        assert np.isfinite(np.asarray(o)).all()


def test_mixup_cutmix_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    labels = jnp.arange(8) % 4
    mixed, targets = mixup_cutmix(rng, imgs, labels, num_classes=4)
    assert mixed.shape == imgs.shape and targets.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-5)
    # smoothing floor present
    assert float(targets.min()) >= 0.1 / 4 - 1e-6


def test_one_hot_smooth_matches_timm():
    t = np.asarray(one_hot_smooth(jnp.asarray([2]), 5, 0.1))[0]
    expected = np.full(5, 0.1 / 5)
    expected[2] = 1 - 0.1 + 0.1 / 5
    np.testing.assert_allclose(t, expected, rtol=1e-6)


def test_two_view_batch_same_region_and_vae_types():
    """Batched two-pic path (pretrain_two_view_batch): the tokenizer view is
    the SAME crop region as the student view, per sample, in one jitted
    program; discrete_vae_type selects the tokenizer-view mapping
    (datasets.py:86-102)."""
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    base = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32)
    imgs_u8 = np.stack([
        np.clip(base * (0.5 + 0.1 * i) * 255, 0, 255).astype(np.uint8)
        for i in range(4)
    ])
    first, second = A.pretrain_two_view_batch(
        jax.random.PRNGKey(3), jnp.asarray(imgs_u8), out_size=32, second_size=16,
        color_jitter_strength=0.0, discrete_vae_type="none",
    )
    assert first.shape == (4, 32, 32, 3) and second.shape == (4, 16, 16, 3)
    # undo the student normalization, downsample, compare per sample
    mean = jnp.asarray(A.IMAGENET_DEFAULT_MEAN)
    std = jnp.asarray(A.IMAGENET_DEFAULT_STD)
    first_raw = first * std + mean
    for i in range(4):
        a_small = jax.image.resize(first_raw[i], (16, 16, 3), method="cubic")
        assert float(jnp.abs(a_small - second[i]).mean()) < 0.06, i

    # dall-e mapping: second ∈ [eps, 1-eps] via map_pixels
    _, sec_de = A.pretrain_two_view_batch(
        jax.random.PRNGKey(3), jnp.asarray(imgs_u8), out_size=32, second_size=16,
        color_jitter_strength=0.0, discrete_vae_type="dall-e",
    )
    from uncertainty_vit_tpu.models.dvae import map_pixels
    np.testing.assert_allclose(np.asarray(sec_de), np.asarray(map_pixels(second)),
                               rtol=1e-6, atol=1e-6)

    # customized: Inception-normalized (range roughly [-1, 1])
    _, sec_cu = A.pretrain_two_view_batch(
        jax.random.PRNGKey(3), jnp.asarray(imgs_u8), out_size=32, second_size=16,
        color_jitter_strength=0.0, discrete_vae_type="customized",
    )
    np.testing.assert_allclose(np.asarray(sec_cu), np.asarray(second) * 2.0 - 1.0,
                               rtol=1e-5, atol=1e-5)


def test_pretrain_two_view_letterboxed_never_samples_fill():
    """Letterboxed pretrain two-pic path: valid_hw confines the shared crop
    to each sample's valid extent — outputs never contain zero fill, and the
    two views still show the same region (round-2 gap: pretraining decoded
    to a center-cropped square; --decode_letterbox now reaches it)."""
    canvas = 64
    vhw = np.asarray([[64, 40], [32, 64], [48, 48], [64, 64]], np.int32)
    imgs_u8 = np.zeros((4, canvas, canvas, 3), np.uint8)
    yy, xx = np.mgrid[0:canvas, 0:canvas] / canvas
    base = np.clip((0.4 + 0.5 * np.stack([yy, xx, (yy + xx) / 2], -1)) * 255,
                   64, 255).astype(np.uint8)
    for i, (vh, vw) in enumerate(vhw):
        imgs_u8[i, :vh, :vw] = base[:vh, :vw]

    first, second = A.pretrain_two_view_batch(
        jax.random.PRNGKey(5), jnp.asarray(imgs_u8), out_size=32,
        second_size=16, color_jitter_strength=0.0, discrete_vae_type="none",
        valid_hw=jnp.asarray(vhw),
    )
    # fill is 0 (→ large negative after normalize); real content ≥ 64/255
    mean = jnp.asarray(A.IMAGENET_DEFAULT_MEAN)
    std = jnp.asarray(A.IMAGENET_DEFAULT_STD)
    first_raw = np.asarray(first * std + mean)
    assert first_raw.min() > 0.15, first_raw.min()
    assert np.asarray(second).min() > 0.15
    for i in range(4):
        a_small = jax.image.resize(jnp.asarray(first_raw[i]), (16, 16, 3),
                                   method="cubic")
        assert float(jnp.abs(a_small - second[i]).mean()) < 0.06, i


@pytest.mark.parametrize("level", [-1, 0, 1])
def test_pretrain_augment_letterboxed_never_samples_fill(level):
    """Every BEiT aug ladder level honors the letterboxed valid extent
    (RRC levels crop within it; center/resize levels compose the
    resize-shorter+center-crop box over it)."""
    canvas = 64
    vhw = np.asarray([[64, 40], [32, 64], [48, 48], [64, 64]], np.int32)
    imgs_u8 = np.zeros((4, canvas, canvas, 3), np.uint8)
    for i, (vh, vw) in enumerate(vhw):
        imgs_u8[i, :vh, :vw] = 128

    out = A.pretrain_augment_batch(
        jax.random.PRNGKey(7), jnp.asarray(imgs_u8), out_size=24,
        aug_level=level, color_jitter_strength=0.0,
        valid_hw=jnp.asarray(vhw),
    )
    mean = jnp.asarray(A.IMAGENET_DEFAULT_MEAN)
    std = jnp.asarray(A.IMAGENET_DEFAULT_STD)
    raw = np.asarray(out * std + mean)
    # bicubic taps at a crop flush with the valid boundary reach ≤2 px of
    # zero fill (the resampler reads the canvas, torchvision edge-clamps —
    # a border-only artifact); the interior must be exact and no pixel may
    # approach the fill value
    np.testing.assert_allclose(raw[:, 2:-2, 2:-2], 128 / 255.0, atol=0.02)
    assert raw.min() > 0.3, raw.min()


def test_letterboxed_rrc_covers_full_valid_extent():
    """Crop-parameter distribution over many draws spans the whole valid
    region (the point of letterboxing: RRC over the FULL original image,
    matching torchvision's behavior on undistorted inputs)."""
    vh, vw = 48, 36
    keys = jax.random.split(jax.random.PRNGKey(11), 500)
    top, left, ch, cw = jax.vmap(
        lambda k: A._rrc_params(k, vh, vw, (0.08, 1.0), (3.0 / 4.0, 4.0 / 3.0))
    )(keys)
    top, left, ch, cw = map(np.asarray, (top, left, ch, cw))
    assert (top + ch).max() >= vh - 1 and (left + cw).max() >= vw - 1
    assert top.min() == 0 and left.min() == 0
    assert (top + ch).max() <= vh and (left + cw).max() <= vw


def _timm_mix_loop(imgs, t1, apply, use_cutmix, lam, box):
    """timm Mixup._mix_elem semantics re-derived in numpy given drawn params
    (timm/data/mixup.py _mix_elem: j = B-1-i; cutmix pastes x_orig[j]'s box,
    mixup blends with lam; targets y1*lam + y1.flip(0)*(1-lam))."""
    imgs = np.asarray(imgs, dtype=np.float64)
    x_orig = imgs.copy()
    b = imgs.shape[0]
    lam_t = np.where(apply, lam, 1.0)
    for i in range(b):
        j = b - 1 - i
        if not apply[i]:
            continue
        if use_cutmix[i]:
            m = np.asarray(box[i])[..., None]
            imgs[i] = imgs[i] * (1 - m) + x_orig[j] * m
        else:
            imgs[i] = imgs[i] * lam[i] + x_orig[j] * (1 - lam[i])
    t1 = np.asarray(t1, dtype=np.float64)
    targets = t1 * lam_t[:, None] + t1[::-1] * (1 - lam_t[:, None])
    return imgs, targets


@pytest.mark.parametrize("mode", ["elem", "pair"])
def test_mixup_elem_pair_matches_timm_loop(mode):
    """Vectorized elem/pair mixing == timm's per-sample loop given the same
    drawn params (run_class_finetuning.py:339-346 via timm Mixup modes)."""
    from uncertainty_vit_tpu.ops import mixup as MX

    rng = jax.random.PRNGKey(42)
    b, h, w = 8, 16, 16
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3))
    labels = jnp.arange(b) % 4

    mixed, targets = mixup_cutmix(
        rng, imgs, labels, num_classes=4, mixup_alpha=0.8, cutmix_alpha=1.0,
        prob=0.7, switch_prob=0.5, label_smoothing=0.1, mode=mode,
    )
    count = b if mode == "elem" else b // 2
    apply, use_cutmix, lam, box = MX._elem_params(
        rng, count, h, w, 0.8, 1.0, 0.7, 0.5, None
    )
    apply, use_cutmix, lam, box = map(np.asarray, (apply, use_cutmix, lam, box))
    if mode == "pair":
        mirror = lambda t: np.concatenate([t, t[::-1]], axis=0)
        apply, use_cutmix, lam, box = map(mirror, (apply, use_cutmix, lam, box))
    t1 = one_hot_smooth(labels, 4, 0.1)
    ref_imgs, ref_targets = _timm_mix_loop(imgs, t1, apply, use_cutmix, lam, box)
    np.testing.assert_allclose(np.asarray(mixed), ref_imgs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(targets), ref_targets, rtol=1e-5, atol=1e-6)
    # the draw actually mixes something (non-degenerate test)
    assert apply.any() and (lam[apply] < 1.0).any()
    if mode == "pair":
        # pair invariant: i and B-1-i share lambda
        assert np.allclose(lam, lam[::-1])


def test_cutmix_minmax_box_semantics():
    """timm rand_bbox_minmax: cut dims uniform in [d*min, d*max), box never
    clipped, lambda = 1 - realized area fraction; forced cutmix_alpha=1."""
    from uncertainty_vit_tpu.ops import mixup as MX

    h = w = 32
    minmax = (0.25, 0.5)
    for i in range(20):
        box, lam = MX._rand_bbox_minmax(jax.random.PRNGKey(i), h, w, minmax)
        box = np.asarray(box)
        rows = box.any(axis=1).sum()
        cols = box.any(axis=0).sum()
        assert int(h * 0.25) <= rows < int(h * 0.5)
        assert int(w * 0.25) <= cols < int(w * 0.5)
        assert np.isclose(float(lam), 1.0 - rows * cols / (h * w), atol=1e-6)
    # end-to-end: mode batch + minmax, mixup disabled -> always cutmix
    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, h, w, 3))
    mixed, targets = mixup_cutmix(
        jax.random.PRNGKey(3), imgs, jnp.arange(4), num_classes=4,
        mixup_alpha=0.0, cutmix_alpha=0.0, prob=1.0, label_smoothing=0.0,
        cutmix_minmax=minmax,
    )
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-5)
    assert not np.allclose(np.asarray(mixed), np.asarray(imgs))
    # bounds that collapse after int() must error like timm's randint
    # (e.g. (0.199, 0.2) at 224px), not silently fix a constant cut size
    with pytest.raises(ValueError, match="collapses"):
        MX._rand_bbox_minmax(jax.random.PRNGKey(0), 224, 224, (0.199, 0.2))
