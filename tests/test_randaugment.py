"""RandAugment op tests: each op's math on known inputs + driver behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops import randaugment as RA


def planar(arr):
    return jnp.asarray(arr, jnp.float32)


def test_autocontrast_full_range():
    x = planar(np.linspace(0.2, 0.6, 16).reshape(1, 1, 4, 4))
    x = jnp.tile(x, (1, 3, 1, 1))
    out = RA.autocontrast(x)
    np.testing.assert_allclose(float(out.min()), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out.max()), 1.0, atol=1e-6)


def test_invert_solarize_posterize():
    x = planar(np.random.RandomState(0).rand(2, 3, 8, 8))
    np.testing.assert_allclose(np.asarray(RA.invert(x)), 1.0 - np.asarray(x))

    thresh = jnp.asarray([0.5, 0.5])
    sol = np.asarray(RA.solarize(x, thresh))
    xa = np.asarray(x)
    np.testing.assert_allclose(sol, np.where(xa >= 0.5, 1 - xa, xa), rtol=1e-6)

    bits = jnp.asarray([1, 8])
    post = np.asarray(RA.posterize(x, bits))
    # 1 bit → only two levels {0, 128}/255 per channel
    assert len(np.unique(np.round(post[0] * 255))) <= 2
    # 8 bits → unchanged (up to quantization floor)
    np.testing.assert_allclose(post[1], np.floor(xa[1] * 255) / 255, atol=1e-6)


def test_enhance_ops_identity_at_factor_one():
    x = planar(np.random.RandomState(1).rand(2, 3, 8, 8))
    ones = jnp.ones((2,))
    for op in (RA.color, RA.contrast, RA.brightness, RA.sharpness):
        np.testing.assert_allclose(np.asarray(op(x, ones)), np.asarray(x),
                                   atol=1e-5, err_msg=op.__name__)


def test_equalize_flattens_histogram():
    rs = np.random.RandomState(2)
    # heavily skewed image
    x = planar((rs.rand(1, 3, 32, 32) ** 3))
    out = np.asarray(RA.equalize(x, hist_stride=1))
    assert out.shape == x.shape
    # equalization maps the skewed distribution (mean≈0.25) toward uniform:
    # the output mean moves close to 0.5 and the histogram flattens
    assert abs(out.mean() - 0.5) < 0.1, out.mean()
    hist_in, _ = np.histogram(np.asarray(x), bins=16, range=(0, 1))
    hist_out, _ = np.histogram(out, bins=16, range=(0, 1))
    assert hist_out.std() < hist_in.std() / 2
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_affine_warp_identity_and_translate():
    x = planar(np.random.RandomState(3).rand(2, 3, 8, 8))
    identity = jnp.tile(jnp.asarray([[1, 0, 0], [0, 1, 0]], jnp.float32), (2, 1, 1))
    np.testing.assert_allclose(np.asarray(RA.affine_warp(x, identity)),
                               np.asarray(x), atol=1e-5)

    # translate x by +2 (output→input): out[:, :, y, x] = in[:, :, y, x+2]
    t = jnp.tile(jnp.asarray([[1, 0, 0], [0, 1, 2]], jnp.float32), (2, 1, 1))
    out = np.asarray(RA.affine_warp(x, t))
    np.testing.assert_allclose(out[:, :, :, :6], np.asarray(x)[:, :, :, 2:], atol=1e-5)
    # zero fill at the border
    np.testing.assert_allclose(out[:, :, :, 6:], 0.0, atol=1e-5)


def test_rotate_90_matches_transpose_flip():
    x = planar(np.random.RandomState(4).rand(1, 1, 9, 9))
    th = jnp.deg2rad(90.0)
    mats = jnp.asarray([[[jnp.cos(th), -jnp.sin(th), 0.0],
                         [jnp.sin(th), jnp.cos(th), 0.0]]], jnp.float32)
    out = np.asarray(RA.affine_warp(x, mats))[0, 0]
    # inverse-rotation by 90°: out[y, x] = in[-x, y] around the center
    expected = np.asarray(x)[0, 0][::-1].T
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_rand_augment_batch_runs_and_varies():
    rs = np.random.RandomState(5)
    x = planar(rs.rand(8, 3, 16, 16))
    out = RA.rand_augment_batch(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    out2 = RA.rand_augment_batch(jax.random.PRNGKey(1), x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # deterministic per key
    out3 = RA.rand_augment_batch(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3))
    # prob=0 → identity (up to the internal bf16 round-trip)
    out4 = RA.rand_augment_batch(jax.random.PRNGKey(0), x, prob=0.0)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(x), atol=1.0 / 256)


def test_finetune_pipeline_with_aa():
    from uncertainty_vit_tpu.ops.augment import finetune_train_augment_batch

    imgs = np.random.RandomState(0).randint(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    out = finetune_train_augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), out_size=32, auto_augment=True
    )
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_shear_warp_matches_affine_warp_bilinear():
    """The gather-free 3-shear (Paeth) warp equals the direct bilinear warp
    for unimodular maps, away from the zero-fill border (sequential passes
    fill slightly different border pixels; interior must agree)."""
    # smooth (band-limited) test image: multi-pass shear resampling and
    # direct bilinear agree closely on smooth content; white noise is the
    # pathological case for comparing any two resamplers (3-shear rotation
    # is slightly softer — the classic Paeth trade-off, documented).
    yy, xx = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    base = 0.5 + 0.25 * np.sin(2 * np.pi * yy / 12.0) * np.cos(2 * np.pi * xx / 10.0)
    x = planar(np.stack([np.stack([base, base.T])] * 3) *
               np.asarray([1.0, 0.8, 0.6]).reshape(3, 1, 1, 1))
    th = jnp.deg2rad(jnp.asarray([17.0, -25.0, 0.0]))
    shear = jnp.asarray([0.0, 0.1, -0.2])
    # rotation ∘ shear_x compositions (unimodular, like RandAugment draws)
    rot = jnp.stack([
        jnp.stack([jnp.cos(th), -jnp.sin(th), jnp.asarray([1.5, 0.0, -2.0])], -1),
        jnp.stack([jnp.sin(th), jnp.cos(th), jnp.asarray([0.0, 2.5, 1.0])], -1),
    ], axis=-2)
    sh = jnp.stack([
        jnp.stack([jnp.ones(3), jnp.zeros(3), jnp.zeros(3)], -1),
        jnp.stack([shear, jnp.ones(3), jnp.zeros(3)], -1),
    ], axis=-2)
    hom = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), (3, 1, 3))
    mats = jnp.einsum(
        "bij,bjk->bik",
        jnp.concatenate([rot, hom], 1), jnp.concatenate([sh, hom], 1)
    )[:, :2, :]

    ref = np.asarray(RA.affine_warp(x, mats, method="bilinear"))
    out = np.asarray(RA.shear_warp(x, mats))
    # compare where BOTH consider the pixel valid (non-fill): use a margin
    interior = np.zeros_like(ref, bool)
    interior[:, :, 8:-8, 8:-8] = True
    mask = interior & (ref > 1e-6) & (out > 1e-6)
    np.testing.assert_allclose(out[mask], ref[mask], atol=0.08)
    # bulk agreement: mean abs difference over the interior is small
    assert np.abs((out - ref)[interior]).mean() < 0.01


def test_shear_warp_identity_and_translate_exact():
    x = planar(np.random.RandomState(7).rand(2, 3, 8, 8))
    identity = jnp.tile(jnp.asarray([[1, 0, 0], [0, 1, 0]], jnp.float32), (2, 1, 1))
    np.testing.assert_allclose(np.asarray(RA.shear_warp(x, identity)),
                               np.asarray(x), atol=1e-5)
    t = jnp.tile(jnp.asarray([[1, 0, 0], [0, 1, 2]], jnp.float32), (2, 1, 1))
    out = np.asarray(RA.shear_warp(x, t))
    np.testing.assert_allclose(out[:, :, :, :6], np.asarray(x)[:, :, :, 2:], atol=1e-5)
    np.testing.assert_allclose(out[:, :, :, 6:], 0.0, atol=1e-5)
