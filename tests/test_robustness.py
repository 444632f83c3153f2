"""Robustness harness tests: mCE bookkeeping, flip prob / ranking distances
vs reference formulas recomputed inline."""

import numpy as np
from scipy.stats import rankdata

import jax.numpy as jnp

from uncertainty_vit_tpu.evals import robustness as R


def test_evaluate_corruption_bookkeeping():
    # fake model: perfect on 'easy', wrong on 'hard'
    def loader_factory(name):
        labels = np.arange(10) % 3
        images = np.full((10, 4), labels[:, None], np.float32)
        yield images, labels

    def forward(images):
        logits = np.zeros((len(images), 3), np.float32)
        logits[np.arange(len(images)), images[:, 0].astype(int)] = 1.0
        return logits

    out = R.evaluate_corruption(forward, loader_factory, distortions=("easy",))
    assert out["per_distortion"]["easy"]["acc1"] == 100.0
    assert out["mce_unnormalized"] == 0.0

    def forward_bad(images):
        logits = np.zeros((len(images), 3), np.float32)
        logits[:, 2] = 1.0  # always class 2
        return logits

    out2 = R.evaluate_corruption(forward_bad, loader_factory, distortions=("hard",))
    acc = out2["per_distortion"]["hard"]["acc1"]
    # labels = [0,1,2,0,1,2,0,1,2,0] → class 2 appears 3 times → 30%
    assert abs(acc - 30.0) < 1e-4


def test_flip_prob_matches_reference_semantics():
    preds = [np.array([1, 1, 2, 2, 3])]
    # consecutive mode: flips at 1→2 and 2→3 → 2/4
    assert R.flip_prob(preds, noise_perturbation=False) == 0.5
    # noise mode: compare each frame to frame 0 → [0,1,1,1] → 3/4
    assert R.flip_prob(preds, noise_perturbation=True) == 0.75


def test_rankdata_ordinal_desc_matches_scipy():
    rs = np.random.RandomState(0)
    x = rs.randn(100).astype(np.float32)
    ours = R._rankdata_ordinal_desc(x)
    theirs = np.uint16(rankdata(-x, method="ordinal"))
    np.testing.assert_array_equal(ours, theirs)


def test_ranking_dist_reference_formula():
    rs = np.random.RandomState(1)
    vids = []
    for _ in range(3):
        frames = [np.uint16(rankdata(-rs.randn(100), method="ordinal")) for _ in range(4)]
        vids.append(np.stack(frames))

    # reference computation recomputed inline (uncertainty_evaluations.py:743-763)
    def ref(ranks, noise, mode):
        num_classes = 100
        identity = np.asarray(range(1, num_classes + 1))
        cum = np.cumsum(np.asarray([0] + [1] * 5 + [0] * (num_classes - 6)))
        recip = 1.0 / identity

        def dist(sigma):
            if mode == "top5":
                return np.sum(np.abs(cum[:5] - cum[sigma - 1][:5]))
            return np.sum(np.abs(recip - recip[sigma - 1]) * recip)

        result = 0
        for vid in ranks:
            acc = []
            perm1 = vid[0]
            inv = np.argsort(perm1)
            for r in vid[1:]:
                acc.append(dist(r[inv]))
                if not noise:
                    perm1 = r
                    inv = np.argsort(perm1)
            result += np.mean(acc) / len(ranks)
        return result

    for noise in (False, True):
        for mode in ("top5", "zipf"):
            np.testing.assert_allclose(
                R.ranking_dist(vids, noise, mode), ref(vids, noise, mode), rtol=1e-6
            )


def test_evaluate_perturbation_end_to_end():
    rs = np.random.RandomState(0)
    videos = rs.randint(0, 255, (2, 3, 32, 32, 3), dtype=np.uint8)

    def loader_factory(name):
        yield videos

    def forward(frames):
        # deterministic fake logits varying by frame content
        x = np.asarray(frames, np.float32).mean(axis=(1, 2, 3))
        logits = np.stack([x * (i + 1) % 1.0 for i in range(5)], axis=1)
        return logits

    out = R.evaluate_perturbation(
        forward, loader_factory, num_classes=5,
        perturbations=("gaussian_noise", "rotate"), frame_size=32,
    )
    assert set(out["per_perturbation"]) == {"gaussian_noise", "rotate"}
    for v in out["per_perturbation"].values():
        assert 0.0 <= v["flip_prob"] <= 1.0
        assert np.isfinite(v["zipf"]) and np.isfinite(v["top5"])


def test_process_p_frames_range():
    frames = jnp.asarray(np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    out = R.process_p_frames(frames, out_size=224)
    assert out.shape == (4, 224, 224, 3)
    # inception-normalized then ×2−1: range roughly [-3, 1]
    assert float(out.min()) >= -3.1 and float(out.max()) <= 1.1
