"""Loss library as pure jnp functions.

Covers SURVEY.md §2.4: the data2vec regression losses with masked-position
weighting (engine_for_cyclical.py:132-163), classification criteria
(run_class_finetuning.py:617-623), BEiT MIM CE (engine_for_pretraining.py:55),
and the Wasserstein pretrain/finetune losses (distloss.py).

TPU note: the reference gathers a dynamic number of masked tokens before its
losses; all masked losses here take a [B, N] weight mask instead so shapes
stay static under jit — identical values for mean-type reductions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# data2vec / cyclical regression losses (engine_for_cyclical.py:132-163)
# ---------------------------------------------------------------------------

def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Elementwise F.smooth_l1_loss (huber/beta form)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_regression_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    beta: float = 2.0,
    l2: bool = False,
) -> jnp.ndarray:
    """Mean smooth-L1/MSE over masked positions only.

    pred/target: [B, N, C]; mask: [B, N] in {0,1}. Equals the reference's
    mean over gathered masked rows (engine_for_cyclical.py:147-150).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    elem = (pred - target) ** 2 if l2 else smooth_l1(pred, target, beta)
    w = mask.astype(jnp.float32)[..., None]
    denom = jnp.maximum(w.sum() * pred.shape[-1], 1.0)
    return (elem * w).sum() / denom


def masked_variance_hinge(
    pred: jnp.ndarray,
    mask: jnp.ndarray,
    margin: float = 0.5,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """VICReg-style std hinge over masked rows (engine_for_cyclical.py:132-139).

    z0 = sqrt(var_unbiased_over_rows + eps); loss = mean(relu(margin - z0)).
    """
    x = pred.astype(jnp.float32)
    w = mask.astype(jnp.float32).reshape(-1)[:, None]  # [B*N, 1]
    xf = x.reshape(-1, x.shape[-1])
    n = jnp.maximum(w.sum(), 2.0)
    mean = (xf * w).sum(0) / n
    var = ((xf - mean) ** 2 * w).sum(0) / (n - 1.0)  # torch var unbiased
    z0 = jnp.sqrt(var + eps)
    return jnp.sum(jax.nn.relu(margin - z0)) / z0.shape[0]


# ---------------------------------------------------------------------------
# Classification criteria (run_class_finetuning.py:617-623)
# ---------------------------------------------------------------------------

def soft_target_cross_entropy(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """timm SoftTargetCrossEntropy: mean over batch of -sum(t * log_softmax)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-soft_targets * logp, axis=-1))


def label_smoothing_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """timm LabelSmoothingCrossEntropy."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def masked_mim_cross_entropy(
    logits: jnp.ndarray, token_ids: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BEiT MIM loss: CE over the codebook vocab at masked positions
    (engine_for_pretraining.py:50-57) + mlm accuracy (:74).

    logits: [B, N, V]; token_ids: [B, N] int; mask: [B, N] in {0,1}.
    Returns (loss, mlm_acc).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, token_ids[..., None], axis=-1)[..., 0]
    w = mask.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = (nll * w).sum() / denom
    correct = (jnp.argmax(logits, axis=-1) == token_ids).astype(jnp.float32)
    acc = (correct * w).sum() / denom
    return loss, acc


# ---------------------------------------------------------------------------
# Wasserstein losses (distloss.py)
# ---------------------------------------------------------------------------

def wasserstein_distance(
    mean1: jnp.ndarray, cov1: jnp.ndarray, mean2: jnp.ndarray, cov2: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise 2-Wasserstein distance between diagonal Gaussians
    (distloss.py:73-78)."""
    ret = jnp.sum((mean1 - mean2) ** 2, axis=-1)
    c1 = jnp.sqrt(jnp.clip(cov1, min=1e-24))
    c2 = jnp.sqrt(jnp.clip(cov2, min=1e-24))
    return ret + jnp.sum((c1 - c2) ** 2, axis=-1)


def wasserstein_pretrain_loss(
    mean_out: jnp.ndarray,
    cov_out: jnp.ndarray,
    pos_mean: jnp.ndarray,
    pos_cov: jnp.ndarray,
    lambda_pretraining: float = 1e-5,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """WassersteinLoss (distloss.py:7-30): sigmoid-squash, W2 distance,
    -log σ(-d) normalized by its max, summed × λ.

    `mask` (flattened rows, {0,1}) reproduces the reference's masked-token
    gather with static shapes: the max normalizations and the sum range only
    over masked rows.
    """
    s = jax.nn.sigmoid
    d = wasserstein_distance(s(mean_out), s(cov_out), s(pos_mean), s(pos_cov))
    d = d.reshape(-1)
    if mask is not None:
        m = mask.reshape(-1).astype(d.dtype)
        d = d / jnp.maximum(jnp.max(jnp.abs(d) * m), 1e-24)
        loss = -jnp.log(jax.nn.sigmoid(-d + 1e-24))
        loss = loss / jnp.maximum(jnp.max(jnp.abs(loss) * m), 1e-24)
        return jnp.sum(loss * m) * lambda_pretraining
    d = d / jnp.max(jnp.abs(d))
    loss = -jnp.log(jax.nn.sigmoid(-d + 1e-24))
    loss = loss / jnp.max(jnp.abs(loss))
    return jnp.sum(loss) * lambda_pretraining


def wasserstein_finetune_loss(
    mean_out: jnp.ndarray,
    cov_out: jnp.ndarray,
    pos_mean: jnp.ndarray,
    pos_cov: jnp.ndarray,
    neg_mean: jnp.ndarray,
    neg_cov: jnp.ndarray,
    lambda_finetuning: float = 1e-4,
    lambda_pvn: float = 1e-4,
) -> jnp.ndarray:
    """WassersteinLossFineTuning (distloss.py:33-70): contrastive ranking term
    -log σ(neg - pos) plus the clamp(pos - pos_vs_neg, 0) 'PVN' term."""
    s = jax.nn.sigmoid
    m, c = s(mean_out), s(cov_out)
    pm, pc = s(pos_mean), s(pos_cov)
    nm, nc = s(neg_mean), s(neg_cov)

    pos = wasserstein_distance(m, c, pm, pc)
    neg = wasserstein_distance(m, c, nm, nc)
    pvn = wasserstein_distance(pm, pc, nm, nc)
    pos = pos / jnp.max(jnp.abs(pos))
    neg = neg / jnp.max(jnp.abs(neg))
    pvn = pvn / jnp.max(jnp.abs(pvn))

    rank = -jnp.log(jax.nn.sigmoid(neg - pos + 1e-24))
    rank = rank / jnp.max(jnp.abs(rank)) * lambda_finetuning
    pvn_loss = jnp.clip(pos - pvn, min=0.0)
    pvn_loss = pvn_loss / jnp.maximum(jnp.max(jnp.abs(pvn_loss)), 1e-24) * lambda_pvn
    return jnp.sum(rank) + jnp.sum(pvn_loss)


def wasserstein_distance_matmul(
    mean1: jnp.ndarray, cov1: jnp.ndarray, mean2: jnp.ndarray, cov2: jnp.ndarray
) -> jnp.ndarray:
    """Batched all-pairs W2 distance used as the dist-attention kernel
    (uncertainty_evaluations.py:276-294). Sigmoid-squashes all inputs like the
    reference. Inputs [..., N, D] → [..., N, N]."""
    s = jax.nn.sigmoid
    mean1, mean2 = s(mean1), s(mean2)
    cov1, cov2 = s(cov1), s(cov2)

    m1_sq = jnp.sum(mean1**2, axis=-1, keepdims=True)
    m2_sq = jnp.sum(mean2**2, axis=-1, keepdims=True)
    ret = m1_sq + jnp.swapaxes(m2_sq, -1, -2) - 2 * mean1 @ jnp.swapaxes(mean2, -1, -2)

    c1 = jnp.sqrt(jnp.clip(cov1, min=1e-24))
    c2 = jnp.sqrt(jnp.clip(cov2, min=1e-24))
    c1_sum = jnp.sum(cov1, axis=-1, keepdims=True)
    c2_sum = jnp.sum(cov2, axis=-1, keepdims=True)
    ret = ret + c1_sum + jnp.swapaxes(c2_sum, -1, -2) - 2 * c1 @ jnp.swapaxes(c2, -1, -2)
    return ret


def kl_distance_matmul(
    mean1: jnp.ndarray, cov1: jnp.ndarray, mean2: jnp.ndarray, cov2: jnp.ndarray
) -> jnp.ndarray:
    """Batched diagonal-Gaussian KL (uncertainty_evaluations.py:296-314).

    Mirrors the reference formula exactly, quirks included: the mean term is
    elementwise (mean1-mean2)² @ (1/cov2)^T (so only coherent for same-N
    inputs) and the trace term carries the reference's transposed
    orientation. Unused by active paths (SURVEY.md §2.4); kept for parity.
    """
    log_det = jnp.log(
        (1.0 / jnp.prod(cov1, axis=-1, keepdims=True))
        @ jnp.swapaxes(jnp.prod(cov2, axis=-1, keepdims=True), -1, -2)
    )
    trace_sum = (1.0 / cov2) @ jnp.swapaxes(cov1, -1, -2)
    mean_cov_part = ((mean1 - mean2) ** 2) @ jnp.swapaxes(1.0 / cov2, -1, -2)
    return (log_det + mean_cov_part + trace_sum - mean1.shape[-1]) / 2
