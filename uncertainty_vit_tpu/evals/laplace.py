"""Last-layer KFAC Laplace approximation — a native TPU implementation.

The reference intends `--laplace` to wrap the finetuned model in
laplace-torch's last-layer KFAC Laplace and tune the prior by marginal
likelihood (run_class_finetuning.py:651-656:
``Laplace(model, 'classification', subset_of_weights='last_layer',
hessian_structure='kron')`` … ``model.optimize_prior_precision
(method='marglik')``) — but the import is commented out
(run_class_finetuning.py:40), so the flag is dead there: the dispatch would
crash on ``model.fit``. This module carries the *intent* natively:

Math (linear head f = W φ̃, φ̃ = [φ, 1] the pooled feature with a bias
column, W the [C, D+1] head):

- GGN over the fit set: Σ_n kron(Λ_n, φ̃_n φ̃_nᵀ) with
  Λ_n = diag(p_n) − p_n p_nᵀ (softmax Hessian).
- KFAC factorization (expectation-product approximation):
  GGN ≈ kron(G, A) / N with G = Σ_n Λ_n [C, C], A = Σ_n φ̃ φ̃ᵀ [D+1, D+1]
  — both accumulated on device in one jitted pass per batch.
- Posterior precision P = kron(G, A)/N + τ I. With eigendecompositions
  G = Q_G diag(g) Q_Gᵀ, A = Q_A diag(a) Q_Aᵀ, the precision is diagonal in
  the kron eigenbasis: eigvals g_l a_k / N + τ.
- GLM (linearized) predictive: J = ∂f/∂w = I_C ⊗ φ̃ᵀ, so
  Σ_f = J P⁻¹ Jᵀ = Q_G diag(s) Q_Gᵀ with
  s_l = Σ_k ã_k² / (g_l a_k / N + τ), ã = Q_Aᵀ φ̃ —
  O(C·D) per sample, fully batched, and Σ_f comes out ALREADY
  eigendecomposed (sampling needs no per-sample factorization).
- Link: 'probit' mean-field (p = softmax(f / √(1 + π/8 · diag Σ_f)),
  laplace-torch's default link_approx) or 'mc' (average softmax over
  Gaussian logit samples f + Q_G(√s ⊙ ε)).
- Prior precision τ by Laplace marginal likelihood on a log-spaced grid
  (laplace-torch method='marglik' optimizes the same objective with Adam):
  log p(D|τ) ≈ loglik_MAP − τ/2 ‖θ*‖² + P/2 log τ
               − ½ Σ_{l,k} log(g_l a_k / N + τ).

Everything is a few small dense eigendecompositions ([C, C] and
[D+1, D+1]) plus batched matmuls — MXU-friendly, no per-sample host work.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.evals import metrics as M


@dataclasses.dataclass(frozen=True)
class KronLaplace:
    """Fitted last-layer KFAC factors (eigendecomposed) + fit statistics."""

    q_a: jnp.ndarray  # [D+1, D+1] eigenvectors of A = Σ φ̃ φ̃ᵀ
    a: jnp.ndarray  # [D+1] eigenvalues of A (clipped ≥ 0)
    q_g: jnp.ndarray  # [C, C] eigenvectors of G = Σ Λ_n
    g: jnp.ndarray  # [C] eigenvalues of G (clipped ≥ 0)
    n: int  # number of fit samples
    loglik: float  # Σ log p(y_n | x_n) at the MAP
    theta_sqnorm: float  # ‖θ*‖² of the last layer (kernel + bias)
    prior_precision: float = 1.0  # τ (set by optimize_prior_precision)

    @property
    def num_params(self) -> int:
        return self.q_g.shape[0] * self.q_a.shape[0]

    def replace(self, **kw) -> "KronLaplace":
        return dataclasses.replace(self, **kw)


def _augment(feats: jnp.ndarray) -> jnp.ndarray:
    """[B, D] → [B, D+1] with a constant 1 column (the head bias)."""
    ones = jnp.ones((feats.shape[0], 1), feats.dtype)
    return jnp.concatenate([feats, ones], axis=-1)


@jax.jit
def _accumulate(a_sum, g_sum, loglik, logits, feats, labels):
    """One fit batch: A += φ̃ᵀφ̃, G += Σ (diag(p) − p pᵀ), loglik += Σ log p_y."""
    phi = _augment(feats.astype(jnp.float32))
    a_sum = a_sum + phi.T @ phi
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    p = jnp.exp(logp)
    g_sum = g_sum + jnp.diag(p.sum(axis=0)) - p.T @ p
    loglik = loglik + jnp.take_along_axis(logp, labels[:, None], axis=1).sum()
    return a_sum, g_sum, loglik


def fit_last_layer_laplace(
    feature_forward: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    head_params: Dict[str, jnp.ndarray],
    batches: Iterable,
) -> KronLaplace:
    """Stream the fit set once; returns eigendecomposed KFAC factors.

    feature_forward(images) → (logits [B, C], pooled features [B, D]) — the
    jitted model forward with return_features=True. head_params must hold
    the linear head's 'kernel' [D, C] and 'bias' [C] (θ* for the prior term).
    """
    kernel = head_params["kernel"]
    d, c = kernel.shape
    a_sum = jnp.zeros((d + 1, d + 1), jnp.float32)
    g_sum = jnp.zeros((c, c), jnp.float32)
    loglik = jnp.zeros((), jnp.float32)
    n = 0
    for batch in batches:
        images, labels = batch[0], batch[-1]
        logits, feats = feature_forward(images)
        a_sum, g_sum, loglik = _accumulate(
            a_sum, g_sum, loglik, logits, feats, jnp.asarray(labels)
        )
        n += int(np.asarray(labels).shape[0])
    # NOTE: an empty LOCAL shard is fine on multi-host runs (its zero sums
    # contribute nothing to the reduction below; raising here would strand
    # the other hosts inside process_allgather) — only a globally empty fit
    # set errors, after the reduction.
    if n == 0 and jax.process_count() == 1:
        raise ValueError("laplace fit got an empty loader")
    if jax.process_count() > 1:
        # multi-host: each host streamed its own train shard — reduce the
        # factor sums so every host fits the SAME posterior (the reference
        # fits on the full loader in one process). Feed an UNPADDED shard
        # loader (BatchLoader pad_shards=False) or the wrap padding
        # double-counts up to num_hosts-1 samples.
        from jax.experimental import multihost_utils as mhu

        a_sum, g_sum, loglik, n_arr = jax.tree_util.tree_map(
            lambda x: x.sum(axis=0),
            mhu.process_allgather(
                (a_sum, g_sum, loglik, jnp.asarray(n, jnp.int64))
            ),
        )
        n = int(n_arr)
        if n == 0:
            raise ValueError("laplace fit got an empty loader on every host")
    a, q_a = jnp.linalg.eigh(a_sum)
    g, q_g = jnp.linalg.eigh(g_sum)
    theta_sqnorm = float(
        jnp.sum(kernel.astype(jnp.float32) ** 2)
        + jnp.sum(head_params["bias"].astype(jnp.float32) ** 2)
    )
    return KronLaplace(
        q_a=q_a,
        a=jnp.clip(a, 0.0),
        q_g=q_g,
        g=jnp.clip(g, 0.0),
        n=n,
        loglik=float(loglik),
        theta_sqnorm=theta_sqnorm,
    )


def log_marginal_likelihood(la: KronLaplace, tau) -> jnp.ndarray:
    """Laplace evidence at prior precision τ (up to τ-independent consts)."""
    tau = jnp.asarray(tau, jnp.float32)
    eig = jnp.outer(la.g, la.a) / la.n  # [C, D+1] posterior curvature eigvals
    logdet = jnp.sum(jnp.log(eig + tau))
    p = la.num_params
    return (
        la.loglik
        - 0.5 * tau * la.theta_sqnorm
        + 0.5 * p * jnp.log(tau)
        - 0.5 * logdet
    )


def optimize_prior_precision(
    la: KronLaplace,
    grid: Optional[np.ndarray] = None,
) -> KronLaplace:
    """Grid-maximize the evidence over τ (laplace-torch method='marglik'
    runs Adam on log τ toward the same stationary point; a log-spaced grid
    is deterministic and single-pass)."""
    if grid is None:
        grid = np.logspace(-4.0, 4.0, 49)
    scores = jax.vmap(lambda t: log_marginal_likelihood(la, t))(
        jnp.asarray(grid, jnp.float32)
    )
    tau = float(grid[int(jnp.argmax(scores))])
    return la.replace(prior_precision=tau)


def _functional_variance(la: KronLaplace, feats: jnp.ndarray) -> jnp.ndarray:
    """Per-sample eigenvalues s [B, C] of Σ_f = Q_G diag(s) Q_Gᵀ."""
    phi = _augment(feats.astype(jnp.float32))
    at = phi @ la.q_a  # ã [B, D+1]
    denom = jnp.outer(la.g, la.a) / la.n + la.prior_precision  # [C, D+1]
    return (at**2) @ (1.0 / denom).T  # [B, C]


def predictive_log_probs(
    la: KronLaplace,
    logits: jnp.ndarray,
    feats: jnp.ndarray,
    link: str = "probit",
    mc_samples: int = 32,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """GLM predictive log-probs for MAP logits + features.

    link='probit': mean-field softmax(f_c / √(1 + π/8 Σ_f[c,c])) —
    laplace-torch's default link_approx for classification.
    link='mc': log mean_s softmax(f + Q_G(√s ⊙ ε_s)).
    """
    logits = logits.astype(jnp.float32)
    s = _functional_variance(la, feats)  # [B, C] (eigvals of Σ_f)
    if link == "probit":
        # diag Σ_f[b, c] = Σ_l Q_G[c, l]² s[b, l]
        var = s @ (la.q_g**2).T
        kappa = jax.lax.rsqrt(1.0 + (jnp.pi / 8.0) * var)
        return jax.nn.log_softmax(logits * kappa)
    if link == "mc":
        rng = jax.random.PRNGKey(0) if rng is None else rng
        eps = jax.random.normal(rng, (mc_samples,) + s.shape)  # [S, B, C]
        draws = logits[None] + (jnp.sqrt(s)[None] * eps) @ la.q_g.T
        return jax.nn.logsumexp(
            jax.nn.log_softmax(draws), axis=0
        ) - jnp.log(mc_samples)
    raise ValueError(f"unknown link {link!r} (probit|mc)")


def evaluate_laplace(
    la: KronLaplace,
    feature_forward: Callable,
    batches: Iterable,
    link: str = "probit",
    mc_samples: int = 32,
    rng: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Clean eval under the Laplace predictive: the full calibration suite
    on global log-probs (log-probs ARE valid 'logits' for every metric —
    softmax(log p) = p, so acc/NLL/ECE/… come out exactly)."""
    pred = jax.jit(
        lambda lg, ft, key: predictive_log_probs(
            la, lg, ft, link=link, mc_samples=mc_samples, rng=key
        )
    )
    from uncertainty_vit_tpu.evals.collect import pipelined_pairs

    rng = jax.random.PRNGKey(0) if rng is None else rng

    def dispatch():
        for i, batch in enumerate(batches):
            logits, feats = feature_forward(batch[0])
            yield pred(logits, feats, jax.random.fold_in(rng, i)), batch[-1]

    outs = list(pipelined_pairs(dispatch()))
    out = M.classification_metrics(
        jnp.asarray(np.concatenate([o[0] for o in outs])),
        jnp.asarray(np.concatenate([o[1] for o in outs])),
    )
    out["loss"] = out["nll"]
    out["prior_precision"] = la.prior_precision
    return {k: float(v) for k, v in out.items()}


def make_feature_forward(model, variables) -> Callable:
    """Jitted (images) → (logits, pooled features) for fit + eval."""
    fwd = jax.jit(
        lambda v, imgs: model.apply(
            v, imgs, deterministic=True, return_features=True
        )
    )
    return lambda imgs: fwd(variables, imgs)
