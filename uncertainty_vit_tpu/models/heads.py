"""Uncertainty heads: SNGP (spectral-norm + RFF Laplace GP) and the
heteroscedastic MC-softmax head.

Mirrors modeling_finetune.py:525-638 (SNGP), sngp.py (spectral norm,
BertLinear), and modeling_finetune.py:904-1217 (MCSoftmaxDenseFA, Collier et
al. 2021).

State discipline (TPU-native): the reference mutates buffers in-place during
forward (power-iteration u/v vectors, the GP precision matrix). Here these are
explicit flax variable collections threaded through the train step:
  - 'spectral_stats': power-iteration vectors (sngp.py:78-98)
  - 'sngp_state':     streaming precision matrix (modeling_finetune.py:599-616)
Pass them as mutable to `Module.apply` during training; eval reads them
frozen.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

MIN_SCALE_MONTE_CARLO = 1e-3  # modeling_finetune.py:641


class SpectralNormDense(nn.Module):
    """Dense layer with spectral normalization of the kernel.

    BertLinear init (sngp.py:222-227: weight N(0, 0.02), bias 0) wrapped by
    the reference's bounded spectral norm (sngp.py:43-98): one power
    iteration per training step updates (u, v); the kernel is rescaled by
    norm_bound/sigma only when sigma exceeds norm_bound (sngp.py:95).
    """

    features: int
    n_power_iterations: int = 1
    norm_bound: float = 0.95
    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update: bool = False) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev=0.02), (in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # weight_mat in the reference is [out, in]; u: (out,), v: (in,).
        w = kernel.T

        def l2_normalize(a):
            return a / jnp.maximum(jnp.linalg.norm(a), self.eps)

        u_var = self.variable(
            "spectral_stats",
            "u",
            lambda: l2_normalize(
                jax.random.normal(self.make_rng("params"), (self.features,))
            ),
        )
        v_var = self.variable(
            "spectral_stats",
            "v",
            lambda: l2_normalize(jax.random.normal(self.make_rng("params"), (in_dim,))),
        )

        u, v = u_var.value, v_var.value
        if update:
            w_sg = jax.lax.stop_gradient(w)
            for _ in range(self.n_power_iterations):
                v = l2_normalize(w_sg.T @ u)
                u = l2_normalize(w_sg @ v)
            if not self.is_initializing():
                u_var.value, v_var.value = u, v

        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w @ v)
        w_norm = jnp.where(self.norm_bound / sigma < 1.0, (self.norm_bound / sigma) * w, w)

        y = x.astype(self.dtype) @ w_norm.T.astype(self.dtype)
        return y + bias.astype(self.dtype)


class SNGPHead(nn.Module):
    """RFF-Laplace Gaussian-process output layer (modeling_finetune.py:525-638).

    LayerNorm input normalization (eps 1e-12) → frozen random-feature
    projection (weight N(0, 0.05), bias U(0, 2π)) → cos → optional
    gp_input_scale — then a trainable linear output layer. The posterior
    precision matrix streams with momentum 0.999 in the 'sngp_state'
    collection; predictive covariance inverts it at eval.
    """

    hidden_size: int
    num_inducing: int
    num_classes: int
    gp_kernel_scale: float = 1.0
    gp_output_bias: float = 0.0
    momentum: float = 0.999
    ridge_penalty: float = 1e-3
    scale_random_features: bool = True
    normalize_input: bool = True
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        update_cov: bool = False,
        return_gp_cov: bool = False,
    ):
        gp_input_scale = 1.0 / math.sqrt(self.gp_kernel_scale)

        if self.normalize_input:
            x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="input_norm")(x)

        # Frozen random features (modeling_finetune.py:36-46): stored outside
        # 'params' so no optimizer masking is needed to keep them fixed.
        rf_kernel = self.variable(
            "sngp_frozen",
            "rf_kernel",
            lambda: 0.05
            * jax.random.normal(
                self.make_rng("params"), (self.hidden_size, self.num_inducing)
            ),
        )
        rf_bias = self.variable(
            "sngp_frozen",
            "rf_bias",
            lambda: jax.random.uniform(
                self.make_rng("params"), (self.num_inducing,), minval=0.0,
                maxval=2.0 * math.pi,
            ),
        )

        phi = jnp.cos(x @ rf_kernel.value + rf_bias.value)
        if self.scale_random_features:
            phi = phi * gp_input_scale

        out = nn.Dense(
            self.num_classes,
            use_bias=False,
            kernel_init=_torch_linear_uniform,
            name="output_layer",
        )(phi)
        out = out + self.gp_output_bias

        precision = self.variable(
            "sngp_state",
            "precision_matrix",
            lambda: self.ridge_penalty * jnp.eye(self.num_inducing, dtype=jnp.float32),
        )
        if update_cov and not self.is_initializing():
            phi_sg = jax.lax.stop_gradient(phi.astype(jnp.float32))
            minibatch = phi_sg.T @ phi_sg
            if self.momentum > 0:
                minibatch = minibatch / phi_sg.shape[0]
                precision.value = (
                    self.momentum * precision.value + (1.0 - self.momentum) * minibatch
                )
            else:
                precision.value = precision.value + minibatch

        if return_gp_cov:
            feature_cov = jnp.linalg.inv(precision.value)
            phi32 = phi.astype(jnp.float32)
            gp_cov = phi32 @ (feature_cov @ phi32.T) * self.ridge_penalty
            return out, gp_cov
        return out


def _torch_linear_uniform(key, shape, dtype=jnp.float32):
    """torch nn.Linear default kernel init for flax (in, out) kernels."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MCSoftmaxDenseFA(nn.Module):
    """Heteroscedastic MC-softmax head with factor-analysis covariance
    (modeling_finetune.py:904-1217; Collier et al. 2021, arXiv:2105.10305).

    u = mu(x) + V(x)·eps_R + d(x)·eps_K;  probs = mean_S softmax(u/T);
    logits = log(clip(probs)).

    Divergence from the reference (documented in SURVEY.md §2.1): the
    reference re-creates loc/scale/diag Linear layers *inside every forward*
    (modeling_finetune.py:1031, 1042-1048) so they are untrained and resampled
    per call. Here they are proper trained parameters — the intended
    semantics. MC sampling runs as a lax.scan over sample chunks so the
    [B, S, C] sample tensor never materializes.
    """

    num_classes: int
    num_factors: int = 10
    temperature: float = 1.0
    train_mc_samples: int = 1000
    test_mc_samples: int = 1000
    eps: float = 1e-7
    mc_chunk: int = 100

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        locs = nn.Dense(self.num_classes, kernel_init=_torch_linear_uniform,
                        name="loc_layer")(x)
        factor_loadings = nn.Dense(
            self.num_classes * self.num_factors, kernel_init=_torch_linear_uniform,
            name="scale_layer",
        )(x)
        diag_scale = (
            nn.Dense(self.num_classes, kernel_init=_torch_linear_uniform,
                     name="diag_layer")(x)
            + MIN_SCALE_MONTE_CARLO
        )

        b = x.shape[0]
        v = factor_loadings.reshape(b, self.num_classes, self.num_factors)
        num_samples = self.train_mc_samples if training else self.test_mc_samples
        chunk = min(self.mc_chunk, num_samples)
        num_chunks = max(num_samples // chunk, 1)

        rng = self.make_rng("mc") if self.has_rng("mc") else jax.random.PRNGKey(42)

        def body(carry, chunk_rng):
            rk, rr = jax.random.split(chunk_rng)
            eps_k = jax.random.normal(rk, (b, chunk, self.num_classes), x.dtype)
            eps_r = jax.random.normal(rr, (b, chunk, self.num_factors), x.dtype)
            noise = (
                jnp.einsum("bcf,bsf->bsc", v, eps_r) + eps_k * diag_scale[:, None, :]
            )
            latents = locs[:, None, :] + noise
            probs = jax.nn.softmax(latents / self.temperature, axis=-1)
            return carry + probs.sum(axis=1), None

        chunk_rngs = jax.random.split(rng, num_chunks)
        total, _ = jax.lax.scan(
            body, jnp.zeros((b, self.num_classes), x.dtype), chunk_rngs
        )
        probs_mean = total / (num_chunks * chunk)
        probs_mean = jnp.clip(probs_mean, self.eps, 1.0)
        return jnp.log(probs_mean)
