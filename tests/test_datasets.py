"""Dataset adapters + pipeline tests on synthetic fixtures."""

import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from uncertainty_vit_tpu.data import datasets as D
from uncertainty_vit_tpu.data.pipeline import BatchLoader
from uncertainty_vit_tpu.data.registry import build_dataset


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    base = root / "cifar-100-python"
    base.mkdir()
    rs = np.random.RandomState(0)
    for name, n in (("train", 200), ("test", 50)):
        data = rs.randint(0, 255, (n, 3072), dtype=np.uint8)
        labels = rs.randint(0, 100, n).tolist()
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)
    base10 = root / "cifar-10-batches-py"
    base10.mkdir()
    for i in range(1, 6):
        data = rs.randint(0, 255, (20, 3072), dtype=np.uint8)
        with open(base10 / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": rs.randint(0, 10, 20).tolist()}, f)
    with open(base10 / "test_batch", "wb") as f:
        pickle.dump({b"data": rs.randint(0, 255, (20, 3072), dtype=np.uint8),
                     b"labels": rs.randint(0, 10, 20).tolist()}, f)
    return str(root)


@pytest.fixture(scope="module")
def folder_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("folder")
    rs = np.random.RandomState(0)
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                arr = rs.randint(0, 255, (40, 30, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(root)


def test_cifar_loading(cifar_root):
    ds = D.load_cifar(cifar_root, cifar100=True, train=True)
    assert len(ds) == 200
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert 0 <= label < 100
    ds10 = D.load_cifar(cifar_root, cifar100=False, train=True)
    assert len(ds10) == 100


def test_ssl_split_per_class_balance():
    labels = np.repeat(np.arange(10), 50)
    labeled, unlabeled = D.ssl_split(labels, num_labeled=100, num_classes=10)
    assert len(labeled) == 100
    counts = np.bincount(labels[labeled], minlength=10)
    assert (counts == 10).all()
    assert len(unlabeled) == 500


def test_image_folder(folder_root):
    ds = D.ImageFolder(os.path.join(folder_root, "train"), decode_size=32)
    assert len(ds) == 8
    assert ds.classes == ["cat", "dog"]
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and label == 0


def test_triplet_dataset(cifar_root):
    base = D.load_cifar(cifar_root, cifar100=True, train=True)
    tds = D.TripletDataset(base, seed=0)
    img, pos, neg, label = tds[3]
    np.testing.assert_array_equal(img, pos)
    assert img.shape == neg.shape
    # negative must come from a different class — verify over a few samples
    for i in range(10):
        _, _, neg_i, lbl = tds[i]
        same = [
            np.array_equal(neg_i, base.images[j])
            for j in np.where(base.labels == lbl)[0]
        ]
        assert not any(same)


def test_registry_dispatch(cifar_root, folder_root):
    ds, nb = build_dataset(True, "CIFAR100", cifar_root)
    assert nb == 100 and len(ds) == 200
    ds_ssl, _ = build_dataset(True, "CIFAR100", cifar_root, semi_supervised_ratio=0.5)
    # 1 per class requested; the 200-sample fixture misses some classes
    assert 0 < len(ds_ssl) <= 100
    ds_t, _ = build_dataset(True, "CIFAR100", cifar_root, triplet=True)
    assert len(ds_t[0]) == 4
    ds_f, nb_f = build_dataset(True, "image_folder", folder_root, decode_size=32)
    assert nb_f == 2


def test_cifar_c_loader(tmp_path):
    rs = np.random.RandomState(0)
    data = rs.randint(0, 255, (50, 32, 32, 3), dtype=np.uint8)
    labels = rs.randint(0, 10, 50)
    np.save(tmp_path / "fog.npy", data)
    np.save(tmp_path / "labels.npy", labels)
    ds = D.load_cifar_c(str(tmp_path), "fog", severity=1)
    # severity slicing: with only 50 images, severity 1 grabs [0:10000] → all 50
    assert len(ds) == 50


def test_batch_loader_epochs_and_sharding(cifar_root):
    ds = D.load_cifar(cifar_root, cifar100=True, train=True)
    loader = BatchLoader(ds, batch_size=16, shuffle=True, seed=0, num_workers=2)
    assert len(loader) == 200 // 16
    batches = list(loader)
    assert len(batches) == 12
    imgs, labels = batches[0]
    assert imgs.shape == (16, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.shape == (16,)

    # epoch changes the order
    loader.set_epoch(0)
    first0 = next(iter(loader))[1]
    loader.set_epoch(1)
    first1 = next(iter(loader))[1]
    assert not np.array_equal(first0, first1)
    # determinism per epoch
    loader.set_epoch(0)
    again = next(iter(loader))[1]
    np.testing.assert_array_equal(first0, again)

    # host sharding covers the dataset disjointly
    l0 = BatchLoader(ds, 16, shuffle=False, num_workers=0, host_id=0, num_hosts=2)
    l1 = BatchLoader(ds, 16, shuffle=False, num_workers=0, host_id=1, num_hosts=2)
    i0 = l0._indices()
    i1 = l1._indices()
    assert len(set(i0) & set(i1)) == 0
    assert len(set(i0) | set(i1)) == 200


def test_triplet_batching(cifar_root):
    base = D.load_cifar(cifar_root, cifar100=True, train=True)
    tds = D.TripletDataset(base)
    loader = BatchLoader(tds, batch_size=8, num_workers=0)
    img, pos, neg, labels = next(iter(loader))
    assert img.shape == pos.shape == neg.shape == (8, 32, 32, 3)
    assert labels.shape == (8,)


def test_batch_loader_multihost_padding(cifar_root):
    """num_hosts=4 (and a non-divisible 3-host case): every sample is covered,
    shards are equal-length, and overlap is only the DistributedSampler-style
    pad (run_cyclical.py:474-476 semantics)."""
    ds = D.load_cifar(cifar_root, cifar100=True, train=True)  # n=200
    for hosts in (4, 3):
        shards = [
            BatchLoader(ds, 16, shuffle=False, num_workers=0,
                        host_id=h, num_hosts=hosts)._indices()
            for h in range(hosts)
        ]
        per_host = -(-200 // hosts)
        assert all(len(s) == per_host for s in shards)
        union = set()
        total = 0
        for s in shards:
            union |= set(s.tolist())
            total += len(s)
        assert union == set(range(200))        # full coverage
        assert total == per_host * hosts       # only pad duplicates
    # shuffled shards stay disjoint-modulo-pad and consistent across hosts
    sh = [
        BatchLoader(ds, 16, shuffle=True, seed=7, num_workers=0,
                    host_id=h, num_hosts=4)._indices()
        for h in range(4)
    ]
    assert set(np.concatenate(sh).tolist()) == set(range(200))


def test_batch_loader_eval_shards_unpadded(cifar_root):
    """Eval configuration (shuffle=False, drop_last=False) shards WITHOUT
    padding: the union over hosts is the dataset exactly once (uneven
    shards), so global eval metrics are invariant to num_hosts — unlike the
    DistributedSampler-style pad, which duplicates samples and skews them
    (data/pipeline.py pad_shards policy)."""
    from uncertainty_vit_tpu.evals.metrics import classification_metrics

    ds = D.load_cifar(cifar_root, cifar100=True, train=True)  # n=200

    def pseudo_logits(imgs):
        # deterministic per-sample "model": logits from image content
        return imgs.reshape(imgs.shape[0], -1)[:, :10].astype(np.float32)

    def run_eval(num_hosts):
        logits, labels = [], []
        lens = []
        for h in range(num_hosts):
            loader = BatchLoader(ds, 16, shuffle=False, drop_last=False,
                                 num_workers=0, host_id=h, num_hosts=num_hosts)
            lens.append(len(loader._indices()))
            for imgs, lab in loader:
                logits.append(pseudo_logits(imgs))
                labels.append(lab)
        return np.concatenate(logits), np.concatenate(labels), lens

    ref_logits, ref_labels, _ = run_eval(1)
    ref = classification_metrics(jnp.asarray(ref_logits), jnp.asarray(ref_labels))

    for hosts in (2, 3, 7):
        lg, lb, lens = run_eval(hosts)
        assert sum(lens) == 200                     # exactly once, no pad
        assert max(lens) - min(lens) <= 1           # uneven by at most 1
        got = classification_metrics(jnp.asarray(lg), jnp.asarray(lb))
        for k in ref:
            np.testing.assert_allclose(
                float(got[k]), float(ref[k]), rtol=1e-6, err_msg=f"{k}@{hosts}"
            )

    # training configuration still pads to equal shards (lockstep steps)
    tr = [BatchLoader(ds, 16, shuffle=True, seed=1, num_workers=0,
                      host_id=h, num_hosts=3)._indices() for h in range(3)]
    assert all(len(s) == len(tr[0]) for s in tr)
    assert sum(len(s) for s in tr) == 3 * -(-200 // 3)


def test_tiny_imagenet_c_wnids_fallbacks(tmp_path):
    """TIN-C distributions don't ship wnids.txt at the corruption root
    (reference hard-codes a sibling dir, tin.py:175-176): the loader must
    find a sibling clean TinyImageNet wnids.txt; with none resolvable it
    must hard-error (directory-derived ids can silently misalign with the
    head's class order) pointing at --wnids_path."""
    rs = np.random.RandomState(0)
    wnids = ["n01443537", "n01629819", "n01641577"]
    croot = tmp_path / "tiny-imagenet-c"
    for wnid in wnids:
        d = croot / "gaussian_noise" / "1" / wnid
        d.mkdir(parents=True)
        for i in range(2):
            arr = rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.JPEG")

    # no wnids.txt anywhere: hard error naming the escape hatch
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="--wnids_path"):
        D.TinyImageNetC(str(croot), "gaussian_noise", 1)

    # sibling clean TinyImageNet dir provides wnids.txt (reverse order file
    # must not change the sorted class ids)
    sib = tmp_path / "tiny-imagenet-200"
    sib.mkdir()
    (sib / "wnids.txt").write_text("\n".join(reversed(wnids)) + "\n")
    ds2 = D.TinyImageNetC(str(croot), "gaussian_noise", 1)
    assert len(ds2) == 6
    assert ds2.classes == sorted(wnids)
    ds = ds2

    # explicit path wins; missing explicit path raises
    ds3 = D.TinyImageNetC(str(croot), "gaussian_noise", 1,
                          wnids_path=str(sib / "wnids.txt"))
    assert ds3.classes == sorted(wnids)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        D.TinyImageNetC(str(croot), "gaussian_noise", 1, wnids_path="/nope.txt")
