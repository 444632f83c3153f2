"""Parameter initializers matching the reference's torch init semantics.

The reference initializes Linear/LayerNorm via `_init_weights`
(modeling_finetune.py:451-460) with timm `trunc_normal_(std=.02)` (absolute
truncation at ±2.0 — effectively untruncated at std 0.02), the cyclical zoo
with `trunc_normal_(std, a=-std, b=std)` (modeling_cyclical.py:23-24), and
leaves untouched layers at torch defaults (kaiming-uniform, i.e.
U(±1/sqrt(fan_in)) for Linear/Conv weight and bias).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def trunc_normal(std: float = 0.02, abs_bound: float = 2.0):
    """timm trunc_normal_ semantics: N(0, std) truncated to [-abs_bound, abs_bound]."""

    def init(key, shape, dtype=jnp.float32):
        lim = abs_bound / std  # bounds in units of sigma
        return std * jax.random.truncated_normal(key, -lim, lim, shape, dtype)

    return init


def torch_linear_default(in_axis: int = 0):
    """torch nn.Linear/Conv2d default weight init: U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    For flax kernels fan_in is the product of all axes except the output axis;
    `in_axis=0` covers Dense kernels of shape (in, out) and HWIO conv kernels.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1])) if in_axis == 0 else int(shape[in_axis])
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_default(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled(base_init, factor: float):
    """Post-scale an initializer (fix_init_weight rescale of attn-proj / fc2
    kernels by 1/sqrt(2·layer_id), modeling_finetune.py:443-449; head init
    ×init_scale, :438-441)."""

    def init(key, shape, dtype=jnp.float32):
        return base_init(key, shape, dtype) * factor

    return init
