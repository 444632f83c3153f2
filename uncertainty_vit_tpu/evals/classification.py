"""Evaluation loops: deterministic, MC-dropout, and ensemble classification.

Replaces engine_for_finetuning.evaluate (:174-220) and
uncertainty_evaluations.evaluate_MC_dropout (:41-89). Batches stream through
one jitted forward; logits accumulate on host and every metric is computed
once, globally (the reference averages ECE/TACE/... per batch — a documented
bias this build fixes; acc/NLL are unaffected).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.evals import metrics as M
from uncertainty_vit_tpu.evals.ensembles import ensemble_mean_logits, make_ensemble_forward
from uncertainty_vit_tpu.evals.mc_dropout import make_mc_dropout_mean_forward


def _collect_logits(
    forward: Callable, batches: Iterable, *extra_args
) -> Tuple[np.ndarray, np.ndarray]:
    # 2-deep readback window: batch i+2 dispatches while batch i reads back
    # (evals/collect.py — same serialization fix as the train loops)
    from uncertainty_vit_tpu.evals.collect import collect_logits

    return collect_logits(lambda imgs: forward(imgs, *extra_args), batches)


def make_eval_forward(model, het: bool = False) -> Callable:
    """Persistent jitted forward. Build ONCE and reuse across epochs:
    variables are a traced argument, so per-epoch params never force a
    retrace (only shape changes do).

    het=False: (variables, images) → logits.
    het=True:  (variables, images, rng) → logits — the heteroscedastic head
    draws fresh MC noise per call through the 'mc' rng (the reference
    resamples noise every forward, modeling_finetune.py:1145-1146). Without
    it MCSoftmaxDenseFA falls back to a fixed key, correlating the noise
    draw across every eval batch."""
    if het:
        return jax.jit(
            lambda variables, imgs, rng: model.apply(
                variables, imgs, deterministic=True, rngs={"mc": rng}
            )
        )
    return jax.jit(lambda variables, imgs: model.apply(variables, imgs, deterministic=True))


def evaluate(
    model,
    variables: Any,
    batches: Iterable,
    forward: Optional[Callable] = None,
    het: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Deterministic eval: acc1/5 + full calibration suite on global logits.

    Pass `forward` (from make_eval_forward, built with the same `het`) to
    amortize tracing across epochs; otherwise a fresh jit is built per call.
    het=True folds a fresh 'mc' rng per batch for the heteroscedastic head."""
    fwd = forward if forward is not None else make_eval_forward(model, het=het)
    if het:
        from uncertainty_vit_tpu.evals.collect import per_call_rng

        key = per_call_rng(jax.random.PRNGKey(0) if rng is None else rng)
        call = lambda imgs: fwd(variables, imgs, key())
    else:
        call = lambda imgs: fwd(variables, imgs)
    logits, labels = _collect_logits(call, batches)
    out = M.classification_metrics(jnp.asarray(logits), jnp.asarray(labels))
    out["loss"] = out["nll"]  # CE == NLL for hard labels
    return {k: float(v) for k, v in out.items()}


def evaluate_mc_dropout(
    model,
    variables: Any,
    batches: Iterable,
    num_samples: int = 8,
    rng: Optional[jax.Array] = None,
    split_at: int = 0,
) -> Dict[str, float]:
    """K-sample MC-dropout eval on mean logits (uncertainty_evaluations.py:41-89).

    `model` must be built with drop_path_rate=0 and the finetuned dropout
    rates (see evals/mc_dropout.py docstring). split_at > 0 shares the first
    blocks across samples — exact when model.cfg.dropout_from_block ≥
    split_at, a documented approximation otherwise.
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng
    mean_fwd = make_mc_dropout_mean_forward(model, num_samples, split_at=split_at)

    from uncertainty_vit_tpu.evals.collect import pipelined_pairs

    pairs = (
        (mean_fwd(variables, batch[0], jax.random.fold_in(rng, i)), batch[-1])
        for i, batch in enumerate(batches)
    )
    outs = list(pipelined_pairs(pairs))
    logits = np.concatenate([o[0] for o in outs])
    labels = np.concatenate([o[1] for o in outs])
    out = M.classification_metrics(jnp.asarray(logits), jnp.asarray(labels))
    return {k: float(v) for k, v in out.items()}


def evaluate_ensemble(
    model,
    stacked_variables: Any,
    batches: Iterable,
) -> Dict[str, Any]:
    """Per-member metrics + mean-logit ensemble metrics
    (engine_for_finetuning.py:224-343)."""
    fwd = make_ensemble_forward(model)

    from uncertainty_vit_tpu.evals.collect import pipelined_pairs

    pairs = ((fwd(stacked_variables, b[0]), b[-1]) for b in batches)  # [M, B, C]
    outs = list(pipelined_pairs(pairs))
    member_logits = np.concatenate([o[0] for o in outs], axis=1)
    labels = jnp.asarray(np.concatenate([o[1] for o in outs]))

    results: Dict[str, Any] = {"members": []}
    for m in range(member_logits.shape[0]):
        mm = M.classification_metrics(jnp.asarray(member_logits[m]), labels)
        results["members"].append({k: float(v) for k, v in mm.items()})
    mean_logits = ensemble_mean_logits(jnp.asarray(member_logits))
    em = M.classification_metrics(mean_logits, labels)
    results["ensemble"] = {k: float(v) for k, v in em.items()}
    return results
