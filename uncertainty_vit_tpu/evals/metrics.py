"""Calibration / uncertainty metrics as pure jnp functions.

Mirrors uncertainty_evaluations.py:99-272 (BrierScore, ECE/MCE/OE/SCE/TACE/
ACE, NLL) plus torchmetrics-style multiclass AUROC. All metrics operate on
the FULL logit set at once — the reference averages some metrics per batch
(engine_for_finetuning.py:207-213), a known bias this build fixes; parity
tests compare against the reference formulas computed globally.

Binning conventions (uncertainty_evaluations.py:110-186):
  - in_bin: conf > lower AND conf <= upper
  - uniform boundaries linspace(0,1,n_bins+1); adaptive boundaries from the
    sorted per-class probabilities at indices i*(n//n_bins), closed with 1.0
  - bin_score = |bin_conf − bin_acc|, weighted by bin_prop
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def softmax_probs(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def accuracy_topk(logits: jnp.ndarray, labels: jnp.ndarray, ks=(1, 5)) -> Tuple[jnp.ndarray, ...]:
    """timm accuracy: top-k percentage (0-100). k is clamped to the class
    count (so acc@5 on a 3-class problem degrades to acc@3)."""
    nc = logits.shape[-1]
    maxk = min(max(ks), nc)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == labels[:, None]
    return tuple(
        100.0 * jnp.mean(jnp.any(correct[:, : min(k, nc)], axis=1).astype(jnp.float32))
        for k in ks
    )


def _bin_stats(confidences, accuracies, lowers, uppers):
    """Per-bin (prop, acc, conf, score) given [N] confidences/accuracies and
    [n_bins] boundaries (uncertainty_evaluations.py:159-186)."""
    in_bin = (confidences[None, :] > lowers[:, None]) & (
        confidences[None, :] <= uppers[:, None]
    )
    in_bin = in_bin.astype(jnp.float32)  # [n_bins, N]
    count = in_bin.sum(axis=1)
    prop = count / confidences.shape[0]
    safe = jnp.maximum(count, 1.0)
    acc = (in_bin * accuracies[None, :]).sum(axis=1) / safe
    conf = (in_bin * confidences[None, :]).sum(axis=1) / safe
    nonempty = count > 0
    score = jnp.where(nonempty, jnp.abs(conf - acc), 0.0)
    return prop, jnp.where(nonempty, acc, 0.0), jnp.where(nonempty, conf, 0.0), score


def _uniform_bounds(n_bins: int):
    b = jnp.linspace(0.0, 1.0, n_bins + 1)
    return b[:-1], b[1:]


def _maxprob(logits, labels):
    probs = softmax_probs(logits)
    conf = probs.max(axis=1)
    acc = (jnp.argmax(probs, axis=1) == labels).astype(jnp.float32)
    return conf, acc


def ece(logits, labels, n_bins: int = 15) -> jnp.ndarray:
    """Expected calibration error, Σ prop·|conf−acc| (uncertainty_evaluations.py:198-202)."""
    conf, acc = _maxprob(logits, labels)
    lowers, uppers = _uniform_bounds(n_bins)
    prop, _, _, score = _bin_stats(conf, acc, lowers, uppers)
    return jnp.dot(prop, score)


def mce(logits, labels, n_bins: int = 15) -> jnp.ndarray:
    """Max-bin calibration error (uncertainty_evaluations.py:205-209)."""
    conf, acc = _maxprob(logits, labels)
    lowers, uppers = _uniform_bounds(n_bins)
    _, _, _, score = _bin_stats(conf, acc, lowers, uppers)
    return jnp.max(score)


def oe(logits, labels, n_bins: int = 15) -> jnp.ndarray:
    """Overconfidence error, Σ prop·conf·max(conf−acc, 0)
    (uncertainty_evaluations.py:214-218)."""
    confs, accs = _maxprob(logits, labels)
    lowers, uppers = _uniform_bounds(n_bins)
    prop, bacc, bconf, _ = _bin_stats(confs, accs, lowers, uppers)
    return jnp.dot(prop, bconf * jnp.maximum(bconf - bacc, 0.0))


def sce(logits, labels, n_bins: int = 15) -> jnp.ndarray:
    """Static calibration error: per-class uniform-bin ECE averaged over
    classes (uncertainty_evaluations.py:222-238)."""
    probs = softmax_probs(logits)
    lowers, uppers = _uniform_bounds(n_bins)

    def per_class(c):
        conf = probs[:, c]
        acc = (labels == c).astype(jnp.float32)
        prop, _, _, score = _bin_stats(conf, acc, lowers, uppers)
        return jnp.dot(prop, score)

    scores = jax.lax.map(per_class, jnp.arange(probs.shape[1]))
    return scores.mean()


def tace(logits, labels, threshold: float = 0.01, n_bins: int = 30) -> jnp.ndarray:
    """Thresholded adaptive calibration error (uncertainty_evaluations.py:241-261):
    probabilities below `threshold` zeroed; per-class adaptive bin boundaries
    from the sorted probabilities at indices i·(n//n_bins)."""
    probs = softmax_probs(logits)
    probs = jnp.where(probs < threshold, 0.0, probs)
    n = probs.shape[0]
    # Small-N guard: with n < n_bins the reference's n//n_bins stride is 0,
    # collapsing every boundary onto sample 0 (degenerate bins, silently).
    # Clamp the bin count to n so each bin holds ≥1 sample; unchanged when
    # n >= n_bins (the only regime the reference runs).
    n_bins = min(n_bins, n)
    if n_bins == 0:
        return jnp.float32(0.0)
    bin_n = n // n_bins
    idx = jnp.arange(n_bins) * bin_n  # boundary sample indices

    def per_class(c):
        conf = probs[:, c]
        acc = (labels == c).astype(jnp.float32)
        srt = jnp.sort(conf)
        lowers = srt[idx]
        uppers = jnp.concatenate([srt[idx][1:], jnp.ones((1,), srt.dtype)])
        prop, _, _, score = _bin_stats(conf, acc, lowers, uppers)
        return jnp.dot(prop, score)

    scores = jax.lax.map(per_class, jnp.arange(probs.shape[1]))
    return scores.mean()


def ace(logits, labels, n_bins: int = 15) -> jnp.ndarray:
    """Adaptive calibration error = TACE with threshold 0
    (uncertainty_evaluations.py:265-268)."""
    return tace(logits, labels, threshold=0.0, n_bins=n_bins)


def brier(logits, labels) -> jnp.ndarray:
    """Mean over samples of Σ(probs − one-hot)² (uncertainty_evaluations.py:99-107)."""
    probs = softmax_probs(logits)
    one_hot = jax.nn.one_hot(labels, probs.shape[1])
    return jnp.mean(jnp.sum((probs - one_hot) ** 2, axis=1))


def nll(logits, labels) -> jnp.ndarray:
    """-mean log softmax prob of the target (uncertainty_evaluations.py:270-272)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def auroc_ovr_macro(logits, labels) -> jnp.ndarray:
    """Multiclass AUROC, one-vs-rest macro average (torchmetrics AUROC
    semantics, engine_for_finetuning.py:25). Rank-statistic (Mann-Whitney U)
    formulation with average ranks for ties; classes with no positives or no
    negatives are excluded from the average. Small-N edge: when NO class has
    both positives and negatives (e.g. a single-class eval set), AUROC is
    undefined and this returns 0.0 rather than NaN."""
    probs = softmax_probs(logits)
    n = probs.shape[0]

    def per_class(c):
        scores = probs[:, c]
        pos = (labels == c).astype(jnp.float32)
        n_pos = pos.sum()
        n_neg = n - n_pos
        order = jnp.argsort(scores)
        sorted_scores = scores[order]
        # average ranks with ties: rank = mean of 1-based positions of equals
        ranks_lo = jnp.searchsorted(sorted_scores, scores, side="left")
        ranks_hi = jnp.searchsorted(sorted_scores, scores, side="right")
        ranks = (ranks_lo + ranks_hi + 1).astype(jnp.float32) / 2.0
        sum_pos_ranks = (ranks * pos).sum()
        auc = (sum_pos_ranks - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1.0)
        valid = (n_pos > 0) & (n_neg > 0)
        return jnp.where(valid, auc, 0.0), valid.astype(jnp.float32)

    aucs, valids = jax.lax.map(per_class, jnp.arange(probs.shape[1]))
    return aucs.sum() / jnp.maximum(valids.sum(), 1.0)


@partial(jax.jit, static_argnames=("num_classes",))
def classification_metrics(logits, labels, num_classes: int = 0):
    """Full metric suite on one logit set (the per-epoch eval report set:
    acc1/5, ECE, TACE, NLL, AUROC — run_class_finetuning.py:714-731 — plus
    the remaining calibration family)."""
    del num_classes
    acc1, acc5 = accuracy_topk(logits, labels)
    return {
        "acc1": acc1,
        "acc5": acc5,
        "ece": ece(logits, labels),
        "tace": tace(logits, labels),
        "mce": mce(logits, labels),
        "sce": sce(logits, labels),
        "ace": ace(logits, labels),
        "oe": oe(logits, labels),
        "brier": brier(logits, labels),
        "nll": nll(logits, labels),
        "auroc": auroc_ovr_macro(logits, labels),
    }
