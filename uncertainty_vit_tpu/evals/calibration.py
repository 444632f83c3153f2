"""Temperature scaling (Guo et al. 2017) — a calibration baseline the
reference's uncertainty-evaluation suite (uncertainty_evaluations.py)
measures against (ECE/TACE/...) but never provides. BEYOND reference:
complements the last-layer Laplace (evals/laplace.py) as the cheapest
post-hoc calibrator.

T* = argmin_T NLL(logits / T, labels), a 1-D convex problem solved by a
log-spaced grid + golden-section refinement — deterministic, jit-friendly,
no optimizer state. Fit on the TRAIN split (same protocol as the Laplace
fit: the eval split stays untouched, no leakage into reported metrics).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.evals import metrics as M


def nll_at_temperature(logits: jnp.ndarray, labels: jnp.ndarray, t) -> jnp.ndarray:
    lp = jax.nn.log_softmax(logits / t)
    return -jnp.take_along_axis(lp, labels[:, None], axis=1).mean()


def fit_temperature(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    t_min: float = 0.05,
    t_max: float = 20.0,
    grid_points: int = 64,
    refine_iters: int = 40,
) -> float:
    """Scalar T minimizing NLL: coarse log-grid bracket, then golden-section
    (NLL(T) is convex in 1/T ⇒ unimodal in T on a bracket)."""
    logits = jnp.asarray(logits, jnp.float32)
    labels = jnp.asarray(labels)
    nll = jax.jit(lambda t: nll_at_temperature(logits, labels, t))

    grid = jnp.logspace(np.log10(t_min), np.log10(t_max), grid_points)
    vals = jax.vmap(lambda t: nll_at_temperature(logits, labels, t))(grid)
    i = int(jnp.argmin(vals))
    lo = float(grid[max(i - 1, 0)])
    hi = float(grid[min(i + 1, grid_points - 1)])

    gr = (5**0.5 - 1) / 2
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = float(nll(c)), float(nll(d))
    for _ in range(refine_iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = float(nll(c))
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = float(nll(d))
    return float((a + b) / 2)


def collect_logits(
    forward: Callable, batches: Iterable
) -> Tuple[np.ndarray, np.ndarray]:
    logits_all, labels_all = [], []
    for batch in batches:
        images, labels = batch[0], batch[-1]
        logits_all.append(np.asarray(forward(images), np.float32))
        labels_all.append(np.asarray(labels))
    return np.concatenate(logits_all), np.concatenate(labels_all)


def evaluate_temperature_scaled(
    forward: Callable,
    fit_batches: Iterable,
    eval_batches: Iterable,
) -> Dict[str, float]:
    """Fit T on fit_batches (train split), report the calibration suite on
    eval_batches at logits/T*. log-probs are valid 'logits' for every
    metric (softmax(log p) = p)."""
    fit_logits, fit_labels = collect_logits(forward, fit_batches)
    t = fit_temperature(jnp.asarray(fit_logits), jnp.asarray(fit_labels))
    if jax.process_count() > 1:
        # multi-host: every host must apply the SAME temperature. Each host
        # fits on its local (unpadded) train shard; averaging the scalars
        # is within-noise of the joint fit at these sample counts and
        # avoids gathering unequal-length shards.
        from jax.experimental import multihost_utils as mhu

        t = float(np.mean(np.asarray(
            mhu.process_allgather(jnp.asarray(t, jnp.float32))
        )))

    logits, labels = collect_logits(forward, eval_batches)
    out = M.classification_metrics(
        jnp.asarray(logits) / t, jnp.asarray(labels)
    )
    out["loss"] = out["nll"]
    out = {k: float(v) for k, v in out.items()}
    out["temperature"] = t
    return out
