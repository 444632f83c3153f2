"""Attention probability variants and the reference-semantics jnp attention.

Implements the attention math of the reference (modeling_finetune.py:145-188)
as pure functions over [B, H, N, N] score tensors:

- softmax (default path, :181)
- gumbel-softmax (:169-170)
- sinkformer: log-domain Sinkhorn normalization of the scores, rescaled by N
  (:171-178 via sinkhorn.py:9-74)

The fused Pallas kernel (ops/flash_attention.py) covers the hot softmax path;
these jnp versions are the exotic variants and the correctness reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_probs(scores: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(scores, axis=-1)


def gumbel_softmax_probs(
    scores: jnp.ndarray,
    rng: jax.Array,
    tau: float = 1.0,
    hard: bool = False,
    axis: int = -1,
) -> jnp.ndarray:
    """F.gumbel_softmax semantics (modeling_finetune.py:170, :235, :246)."""
    g = jax.random.gumbel(rng, scores.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((scores.astype(jnp.float32) + g) / tau, axis=axis)
    if not hard:
        return y_soft.astype(scores.dtype)
    # Straight-through hard one-hot.
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, scores.shape[axis], dtype=y_soft.dtype, axis=axis)
    out = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return out.astype(scores.dtype)


def sinkhorn_probs(
    scores: jnp.ndarray,
    eps: float = 1.0,
    max_iter: int = 3,
) -> jnp.ndarray:
    """Sinkformer attention: Sinkhorn transport plan of the scores × N.

    Mirrors sinkhorn.py:17-67 with C = -scores, uniform marginals 1/N, and the
    alternating log-domain updates (even iterations update u, odd update v).
    The reference's early-break on convergence (sinkhorn.py:53-55) is dropped:
    with max_iter=3 it effectively never triggers and a fixed-trip-count loop
    is what XLA wants.
    """
    n_rows, n_cols = scores.shape[-2], scores.shape[-1]
    s = scores.astype(jnp.float32)
    log_mu = -jnp.log(jnp.asarray(n_rows, jnp.float32))
    log_nu = -jnp.log(jnp.asarray(n_cols, jnp.float32))

    def m(u, v):
        # (scores + u_i + v_j) / eps  — sinkhorn.py:64-67 with C = -scores.
        return (s + u[..., :, None] + v[..., None, :]) / eps

    u = jnp.zeros(s.shape[:-1], jnp.float32)
    v = jnp.zeros(s.shape[:-2] + (n_cols,), jnp.float32)
    for i in range(max_iter):
        if i % 2 == 0:
            u = eps * (log_mu - jax.nn.logsumexp(m(u, v), axis=-1)) + u
        else:
            v = eps * (log_nu - jax.nn.logsumexp(m(u, v), axis=-2)) + v

    pi = jnp.exp(m(u, v))
    return (pi * n_cols).astype(scores.dtype)


def attention_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[B, H, N, D] q/k → [B, H, N, N] scores with optional bias add."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    return scores


def naive_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    *,
    variant: str = "softmax",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    gumbel_rng: Optional[jax.Array] = None,
    sinkformer_eps: float = 1.0,
    sinkformer_iters: int = 3,
) -> jnp.ndarray:
    """Unfused attention: the correctness reference and exotic-variant path.

    q, k, v: [B, H, N, D]. bias: broadcastable to [B, H, N, N]. Returns
    [B, H, N, D] in v.dtype. Probabilities are computed in float32.
    """
    scores = attention_scores(q, k, scale, bias)
    if variant == "softmax":
        probs = softmax_probs(scores)
    elif variant == "gumbel":
        if gumbel_rng is None:
            raise ValueError("gumbel variant requires gumbel_rng")
        probs = gumbel_softmax_probs(scores, gumbel_rng)
    elif variant == "sinkformer":
        probs = sinkhorn_probs(scores, eps=sinkformer_eps, max_iter=sinkformer_iters)
    else:
        raise ValueError(f"unknown attention variant: {variant}")

    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("attention dropout requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)
