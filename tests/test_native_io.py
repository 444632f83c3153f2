"""Native C++ IO runtime tests: build, decode parity vs PIL, corrupt-file
tolerance, pipeline integration."""

import os

import numpy as np
import pytest
from PIL import Image

from uncertainty_vit_tpu.data.datasets import ImageFolder
from uncertainty_vit_tpu.data.pipeline import BatchLoader
from uncertainty_vit_tpu.utils import native


@pytest.fixture(scope="module")
def jpeg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rs = np.random.RandomState(0)
    for cls in ("a", "b"):
        d = root / "train" / cls
        d.mkdir(parents=True)
        for i in range(6):
            h, w = rs.randint(50, 120), rs.randint(50, 120)
            arr = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg", quality=95)
    # one corrupt file
    with open(root / "train" / "a" / "bad.jpg", "wb") as f:
        f.write(b"definitely not a jpeg")
    return str(root)


def test_native_available():
    assert native.available(), "native runtime failed to build/load"


def test_decode_matches_pil(jpeg_root):
    path = os.path.join(jpeg_root, "train", "a", "img_0.jpg")
    batch, ok = native.decode_jpeg_batch([path], 48)
    assert ok[0]
    im = Image.open(path).convert("RGB")
    w, h = im.size
    s = 48
    nw, nh = (s, max(int(round(s * h / w)), s)) if w <= h else (
        max(int(round(s * w / h)), s), s)
    ref = im.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - s) // 2, (nh - s) // 2
    ref = np.asarray(ref.crop((left, top, left + s, top + s)))
    diff = np.abs(batch[0].astype(int) - ref.astype(int))
    assert diff.mean() < 1.0 and diff.max() <= 3, (diff.mean(), diff.max())


def test_corrupt_file_flagged(jpeg_root):
    bad = os.path.join(jpeg_root, "train", "a", "bad.jpg")
    good = os.path.join(jpeg_root, "train", "b", "img_1.jpg")
    batch, ok = native.decode_jpeg_batch([bad, good], 32)
    assert not ok[0] and ok[1]


def test_assemble_batch_matches_stack():
    rs = np.random.RandomState(1)
    arrs = [rs.randint(0, 255, (17, 13, 3), dtype=np.uint8) for _ in range(9)]
    np.testing.assert_array_equal(native.assemble_batch(arrs), np.stack(arrs))
    f32 = [rs.randn(5, 7).astype(np.float32) for _ in range(4)]
    np.testing.assert_array_equal(native.assemble_batch(f32), np.stack(f32))


def test_imagefolder_native_batch_decode(jpeg_root):
    ds = ImageFolder(os.path.join(jpeg_root, "train"), decode_size=48)
    idx = list(range(len(ds)))
    imgs, labels = ds.native_batch_decode(idx)
    assert imgs.shape == (len(ds), 48, 48, 3)
    assert labels.shape == (len(ds),)
    # per-item decode agrees with the batched native decode for clean jpegs
    one, lbl = ds[1]
    pos = 1
    diff = np.abs(imgs[pos].astype(int) - one.astype(int))
    assert diff.mean() < 1.5, diff.mean()


def test_batchloader_uses_native_path(jpeg_root):
    ds = ImageFolder(os.path.join(jpeg_root, "train"), decode_size=48)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=0, drop_last=False)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (4, 48, 48, 3) and imgs.dtype == np.uint8


def test_letterbox_decode_native_and_pil_agree(jpeg_root):
    """Letterboxed decode (aspect-preserving + valid extents) matches
    between the C++ runtime and the PIL fallback, zero-fills outside the
    valid region, and reports extents consistent with the aspect ratio."""
    from uncertainty_vit_tpu.data.datasets import letterbox_canvas

    path = os.path.join(jpeg_root, "train", "b", "img_2.jpg")
    s = 48
    canvas = letterbox_canvas(s)
    batch, vhw, ok = native.decode_jpeg_batch_letterbox([path], s, canvas)
    assert ok[0]
    ch, cw = int(vhw[0, 0]), int(vhw[0, 1])
    assert min(ch, cw) == s and max(ch, cw) <= canvas
    im = Image.open(path).convert("RGB")
    w, h = im.size
    long_side = int(round(s * max(h, w) / min(h, w)))
    assert max(ch, cw) == min(long_side, canvas)
    # zero fill outside the valid region
    assert (batch[0, ch:, :, :] == 0).all() and (batch[0, :, cw:, :] == 0).all()

    folder = ImageFolder(os.path.join(jpeg_root, "train"), decode_size=s,
                         letterbox=True)
    # find the same file's index
    idx = [i for i, (p, _) in enumerate(folder.samples) if p == path][0]
    img_pil, vhw_pil, _ = folder[idx]
    assert img_pil.shape == (canvas, canvas, 3)
    assert tuple(vhw_pil) == (ch, cw)
    valid_native = batch[0, :ch, :cw].astype(int)
    valid_pil = img_pil[:ch, :cw].astype(int)
    diff = np.abs(valid_native - valid_pil)
    assert diff.mean() < 1.0 and diff.max() <= 3, (diff.mean(), diff.max())


def test_letterbox_loader_and_rrc_within_extents(jpeg_root):
    """End-to-end: letterboxed BatchLoader yields (images, valid_hw, labels)
    and the device RRC with valid_hw never produces fill-only outputs (the
    crop stays inside each sample's valid region)."""
    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.ops.augment import (
        random_resized_crop_batch, to_planar,
    )

    folder = ImageFolder(os.path.join(jpeg_root, "train"), decode_size=32,
                         letterbox=True)
    loader = BatchLoader(folder, batch_size=4, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    assert len(batch) == 3
    imgs, vhw, labels = batch
    assert imgs.shape[1] == imgs.shape[2] and vhw.shape == (4, 2)

    planar = to_planar(jnp.asarray(imgs))
    out = random_resized_crop_batch(
        jax.random.PRNGKey(0), planar, 16, scale=(0.9, 1.0),
        valid_hw=jnp.asarray(vhw),
    )
    # near-full-area crops within the valid extent: outputs carry real
    # content (a crop escaping into the zero fill would crater the mean)
    means = np.asarray(out.mean(axis=(1, 2, 3)))
    assert (means > 0.2).all(), means
