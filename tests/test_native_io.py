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
