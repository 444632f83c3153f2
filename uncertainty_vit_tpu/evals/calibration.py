"""Temperature scaling (Guo et al. 2017) — a calibration baseline the
reference's uncertainty-evaluation suite (uncertainty_evaluations.py)
measures against (ECE/TACE/...) but never provides. BEYOND reference:
complements the last-layer Laplace (evals/laplace.py) as the cheapest
post-hoc calibrator.

T* = argmin_T NLL(logits / T, labels), a 1-D convex-in-1/T problem solved
by a TWO-STAGE log-spaced grid (coarse bracket → fine grid inside it):
- each stage evaluates the full-set NLL at `grid_points` temperatures, one
  jitted reduction per point (never a (grid, N, C) intermediate — a vmap
  over the grid would materialize hundreds of GB at ImageNet scale);
- on multi-host runs each host contributes its sample-weighted NLL curve
  over the SHARED grid and the summed curve is minimized — exact joint
  fit (averaging per-host argmins is biased when unshuffled shards are
  class-skewed), at the cost of gathering `grid_points` floats per stage.
Final log-T resolution ≈ (log(t_max/t_min) · 2/grid_points) / grid_points
(< 0.3% with the defaults) — far below the sampling noise of any real fit
set.

Fit-split protocol: Guo et al. prescribe a HELD-OUT set. The reference's
datasets have no calibration split, so the CLI default fits on the EVAL
split itself — a one-scalar-parameter "leak" that is standard practice and
negligible at real set sizes — with `--temp_scaling_split train` matching
the Laplace fit protocol instead (only sound for underfit models: a model
near zero train NLL yields T*≈1 there and calibrates nothing).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nll_at_temperature(logits: jnp.ndarray, labels: jnp.ndarray, t) -> jnp.ndarray:
    lp = jax.nn.log_softmax(logits / t)
    return -jnp.take_along_axis(lp, labels[:, None], axis=1).mean()


def _nll_curve(logits, labels, grid: np.ndarray, nll_jit) -> np.ndarray:
    """Full-set NLL at each grid temperature — one jitted reduction per
    point, so peak memory stays at one (N, C) intermediate. All points are
    DISPATCHED before any is read back (each result is one device scalar;
    a float() per point would serialize 64 dispatch↔sync round-trips)."""
    pending = [nll_jit(logits, labels, t) for t in grid]
    return np.array([float(v) for v in pending])


def _gather_weighted(curve: np.ndarray, n: int) -> Tuple[np.ndarray, int]:
    """Sum sample-weighted curves (and counts) across hosts."""
    if jax.process_count() == 1:
        return curve * n, n
    from jax.experimental import multihost_utils as mhu

    stacked = np.asarray(
        mhu.process_allgather(jnp.asarray(curve * n, jnp.float32))
    )
    counts = np.asarray(mhu.process_allgather(jnp.asarray(n, jnp.int32)))
    return stacked.sum(axis=0), int(counts.sum())


def fit_temperature(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    t_min: float = 0.05,
    t_max: float = 20.0,
    grid_points: int = 64,
) -> float:
    """Scalar T minimizing the (cross-host) fit-set NLL; see module doc."""
    logits = jnp.asarray(logits, jnp.float32)
    labels = jnp.asarray(labels)
    n = int(labels.shape[0])
    if n == 0 and jax.process_count() == 1:
        raise ValueError("fit_temperature got an empty fit set")
    nll_jit = jax.jit(nll_at_temperature)

    lo, hi = float(t_min), float(t_max)
    for _ in range(2):  # coarse bracket, then fine grid inside it
        grid = np.logspace(np.log10(lo), np.log10(hi), grid_points)
        # empty LOCAL shard (multi-host): a zero curve contributes nothing
        # to the summed reduction (NLL of zero samples would be NaN)
        local = (
            _nll_curve(logits, labels, grid, nll_jit)
            if n else np.zeros(grid_points)
        )
        curve, total_n = _gather_weighted(local, n)
        if total_n == 0:
            raise ValueError("fit_temperature: empty fit set on every host")
        i = int(np.argmin(curve))
        lo = float(grid[max(i - 1, 0)])
        hi = float(grid[min(i + 1, grid_points - 1)])
    return float(np.sqrt(lo * hi))  # log-midpoint of the final bracket


from uncertainty_vit_tpu.evals.collect import collect_logits  # noqa: E402


def heldout_split(
    n: int, frac: float, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic (fit_idx, report_idx) carve-out of an n-sample set:
    a seeded shuffle, first ceil(frac·n) samples fit T*, the rest are
    reported on — the Guo et al. held-out protocol when the dataset ships
    no calibration split. Both sides are guaranteed non-empty for n ≥ 2."""
    if not 0.0 < frac < 1.0:
        raise ValueError(f"heldout fraction must be in (0, 1), got {frac}")
    if n < 2:
        raise ValueError(f"cannot carve a held-out split from {n} samples")
    k = min(max(int(np.ceil(frac * n)), 1), n - 1)
    perm = np.random.RandomState(seed).permutation(n)
    return perm[:k], perm[k:]


def evaluate_temperature_scaled(
    forward: Callable,
    eval_batches: Iterable,
    fit_batches: Optional[Iterable] = None,
    heldout_frac: Optional[float] = None,
    heldout_seed: int = 0,
) -> Dict[str, float]:
    """Fit T (on fit_batches if given; else on a held-out carve-out of the
    eval split when heldout_frac is set — Guo et al. protocol; else on the
    eval split itself — see module doc) and report the calibration suite at
    logits/T*. log-probs are valid 'logits' for every metric
    (softmax(log p) = p)."""
    from uncertainty_vit_tpu.evals import metrics as M

    if fit_batches is not None and heldout_frac is not None:
        raise ValueError("pass fit_batches OR heldout_frac, not both")

    logits, labels = collect_logits(forward, eval_batches)
    n_heldout = 0
    if fit_batches is not None:
        fit_logits, fit_labels = collect_logits(
            forward, fit_batches, allow_empty=jax.process_count() > 1
        )
    elif heldout_frac is not None:
        # per-host carve-out: each host splits its local shard; the fit
        # still gathers all hosts' fit subsets inside fit_temperature
        fit_idx, rep_idx = heldout_split(
            int(np.shape(labels)[0]), heldout_frac, heldout_seed
        )
        logits, labels = np.asarray(logits), np.asarray(labels)
        fit_logits, fit_labels = logits[fit_idx], labels[fit_idx]
        logits, labels = logits[rep_idx], labels[rep_idx]
        n_heldout = int(fit_idx.shape[0])
    else:
        fit_logits, fit_labels = logits, labels
    t = fit_temperature(jnp.asarray(fit_logits), jnp.asarray(fit_labels))

    out = M.classification_metrics(jnp.asarray(logits) / t, jnp.asarray(labels))
    out["loss"] = out["nll"]
    out = {k: float(v) for k, v in out.items()}
    out["temperature"] = t
    if heldout_frac is not None:
        out["heldout_fit_samples"] = float(n_heldout)
    return out
