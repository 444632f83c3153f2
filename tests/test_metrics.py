"""Metric parity vs the reference numpy formulas (uncertainty_evaluations.py:99-272)
recomputed inline, plus MC-dropout / ensemble behavior."""

import numpy as np
from scipy.special import softmax as np_softmax

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.evals import metrics as M
from uncertainty_vit_tpu.evals.ensembles import make_ensemble_forward, stack_params
from uncertainty_vit_tpu.evals.mc_dropout import (
    make_mc_dropout_forward, mutual_information, predictive_entropy,
)
from uncertainty_vit_tpu.models.vit import VisionTransformer

N, C = 400, 7
rs = np.random.RandomState(0)
LOGITS = (rs.randn(N, C) * 2).astype(np.float32)
LABELS = rs.randint(0, C, N)


def ref_bin_stats(conf, acc, lowers, uppers):
    prop = np.zeros(len(lowers))
    bacc = np.zeros(len(lowers))
    bconf = np.zeros(len(lowers))
    score = np.zeros(len(lowers))
    for i, (lo, up) in enumerate(zip(lowers, uppers)):
        in_bin = (conf > lo) & (conf <= up)
        prop[i] = in_bin.mean()
        if prop[i] > 0:
            bacc[i] = acc[in_bin].mean()
            bconf[i] = conf[in_bin].mean()
            score[i] = abs(bconf[i] - bacc[i])
    return prop, bacc, bconf, score


def ref_maxprob(n_bins=15):
    probs = np_softmax(LOGITS, axis=1)
    conf = probs.max(1)
    acc = (probs.argmax(1) == LABELS).astype(float)
    b = np.linspace(0, 1, n_bins + 1)
    return ref_bin_stats(conf, acc, b[:-1], b[1:])


def test_ece_mce_oe():
    prop, bacc, bconf, score = ref_maxprob()
    np.testing.assert_allclose(float(M.ece(jnp.asarray(LOGITS), jnp.asarray(LABELS))),
                               np.dot(prop, score), rtol=1e-5)
    np.testing.assert_allclose(float(M.mce(jnp.asarray(LOGITS), jnp.asarray(LABELS))),
                               score.max(), rtol=1e-5)
    np.testing.assert_allclose(float(M.oe(jnp.asarray(LOGITS), jnp.asarray(LABELS))),
                               np.dot(prop, bconf * np.maximum(bconf - bacc, 0)), rtol=1e-5)


def test_sce():
    probs = np_softmax(LOGITS, axis=1)
    b = np.linspace(0, 1, 16)
    total = 0.0
    for c in range(C):
        prop, _, _, score = ref_bin_stats(probs[:, c], (LABELS == c).astype(float), b[:-1], b[1:])
        total += np.dot(prop, score)
    np.testing.assert_allclose(float(M.sce(jnp.asarray(LOGITS), jnp.asarray(LABELS))),
                               total / C, rtol=1e-5)


def test_tace_and_ace():
    for thresh, n_bins, fn in ((0.01, 30, M.tace), (0.0, 15, M.ace)):
        probs = np_softmax(LOGITS, axis=1).copy()
        probs[probs < thresh] = 0
        bin_n = N // n_bins
        total = 0.0
        for c in range(C):
            srt = np.sort(probs[:, c])
            bounds = np.array([srt[i * bin_n] for i in range(n_bins)] + [1.0])
            prop, _, _, score = ref_bin_stats(
                probs[:, c], (LABELS == c).astype(float), bounds[:-1], bounds[1:]
            )
            total += np.dot(prop, score)
        ours = float(fn(jnp.asarray(LOGITS), jnp.asarray(LABELS)))
        np.testing.assert_allclose(ours, total / C, rtol=1e-5, atol=1e-7)


def test_brier_and_nll():
    probs = np_softmax(LOGITS, axis=1)
    one_hot = np.eye(C)[LABELS]
    np.testing.assert_allclose(float(M.brier(jnp.asarray(LOGITS), jnp.asarray(LABELS))),
                               np.mean(np.sum((probs - one_hot) ** 2, axis=1)), rtol=1e-5)
    np.testing.assert_allclose(float(M.nll(jnp.asarray(LOGITS), jnp.asarray(LABELS))),
                               -np.mean(np.log(probs[np.arange(N), LABELS])), rtol=1e-5)


def test_auroc_matches_sklearn_style_reference():
    """Rank-based AUROC vs a direct pairwise-comparison computation."""
    probs = np_softmax(LOGITS, axis=1)
    aucs = []
    for c in range(C):
        pos = probs[LABELS == c, c]
        neg = probs[LABELS != c, c]
        if len(pos) == 0 or len(neg) == 0:
            continue
        greater = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        aucs.append((greater + 0.5 * ties) / (len(pos) * len(neg)))
    expected = np.mean(aucs)
    ours = float(M.auroc_ovr_macro(jnp.asarray(LOGITS), jnp.asarray(LABELS)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_accuracy_topk():
    acc1, acc5 = M.accuracy_topk(jnp.asarray(LOGITS), jnp.asarray(LABELS))
    pred = LOGITS.argmax(1)
    np.testing.assert_allclose(float(acc1), 100.0 * (pred == LABELS).mean(), rtol=1e-5)
    top5 = np.argsort(-LOGITS, axis=1)[:, :5]
    np.testing.assert_allclose(float(acc5), 100.0 * np.mean([
        LABELS[i] in top5[i] for i in range(N)
    ]), rtol=1e-5)


TINY = ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
                 num_classes=5, drop_rate=0.2, use_flash_attention=False)


def test_mc_dropout_vmapped_samples_differ_and_average():
    model = VisionTransformer(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = make_mc_dropout_forward(model, num_samples=4)
    logits_k = fwd(variables, x, jax.random.PRNGKey(2))
    assert logits_k.shape == (4, 4, 5)
    # different dropout masks per sample
    assert not np.allclose(np.asarray(logits_k[0]), np.asarray(logits_k[1]))
    # deterministic under the same rng
    logits_k2 = fwd(variables, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits_k2), rtol=1e-5)

    probs_k = jax.nn.softmax(logits_k, axis=-1)
    h = predictive_entropy(probs_k.mean(0))
    mi = mutual_information(probs_k)
    assert h.shape == (4,) and mi.shape == (4,)
    assert bool((mi >= -1e-5).all())
    assert bool((h + 1e-6 >= mi).all())


def test_mc_dropout_split_trunk():
    """Split-trunk MC: [K, B, C] output, samples differ (tail dropout), and
    trunk sharing is exact — with dropout only in later blocks the split
    version must equal the full fold-into-batch version distributionally."""
    model = VisionTransformer(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = make_mc_dropout_forward(model, num_samples=3, split_at=1)
    lk = fwd(variables, x, jax.random.PRNGKey(2))
    assert lk.shape == (3, 4, 5)
    assert not np.allclose(np.asarray(lk[0]), np.asarray(lk[1]))
    # deterministic per rng
    lk2 = fwd(variables, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lk2), rtol=1e-5)
    # split at depth with no tail dropout and deterministic head → all
    # samples identical to the deterministic forward
    det_model = VisionTransformer(cfg=TINY.replace(drop_rate=0.0))
    fwd_det = make_mc_dropout_forward(det_model, num_samples=2, split_at=TINY.depth)
    lk3 = fwd_det(variables, x, jax.random.PRNGKey(3))
    ref = det_model.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(lk3[0]), np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lk3[0]), np.asarray(lk3[1]), rtol=1e-5)


def test_ensemble_forward():
    model = VisionTransformer(cfg=TINY.replace(drop_rate=0.0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    members = [model.init(jax.random.PRNGKey(i), x) for i in range(3)]
    stacked = stack_params(members)
    fwd = make_ensemble_forward(model)
    logits = fwd(stacked, x)
    assert logits.shape == (3, 4, 5)
    # member outputs match individual applies
    single = model.apply(members[1], x, deterministic=True)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(single), rtol=1e-4, atol=1e-5)


def test_tace_ace_small_n_guard():
    """Round-3 weak #4: n < n_bins made bin_n = n//n_bins = 0 — every
    adaptive boundary index 0, degenerate bins, silently. The guard clamps
    the bin count to n; the metric stays finite and meaningful."""
    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.evals import metrics as M

    logits = jax.random.normal(jax.random.PRNGKey(0), (7, 4))  # n=7 < 30 bins
    labels = jnp.array([0, 1, 2, 3, 0, 1, 2])
    t = float(M.tace(logits, labels))
    a = float(M.ace(logits, labels))
    assert np.isfinite(t) and 0.0 <= t <= 1.0
    assert np.isfinite(a) and 0.0 <= a <= 1.0
    # perfectly calibrated degenerate case must not be pathological
    assert float(M.tace(jnp.zeros((2, 3)), jnp.array([0, 1]))) <= 1.0
    # unchanged in the normal regime: clamp is a no-op when n >= n_bins
    big_logits = jax.random.normal(jax.random.PRNGKey(1), (64, 4))
    big_labels = jnp.arange(64) % 4
    assert np.isfinite(float(M.tace(big_logits, big_labels)))


def test_auroc_single_class_defined():
    """AUROC with one class present is undefined; must return 0.0, not NaN."""
    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.evals import metrics as M

    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    labels = jnp.zeros((8,), dtype=jnp.int32)
    v = float(M.auroc_ovr_macro(logits, labels))
    assert v == 0.0
