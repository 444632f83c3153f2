"""Blockwise masking generator as a jittable, vmappable device routine.

Reference semantics (masking_generator.py:29-92): repeatedly sample a block
with area ~ U(min_num_patches, remaining) and log-uniform aspect ratio in
[0.3, 1/0.3]; accept when it adds 0 < delta ≤ remaining new patches;
accumulate until `num_masking_patches` are set. Defaults follow the cyclical
recipe: 14×14 grid, 120 patches, min block 16 (run_cyclical.py:64-70).

TPU-native formulation: the data-dependent while/retry loops become one
bounded `lax.fori_loop` of block proposals over a fixed attempt budget; each
proposal paints via iota comparisons (no scatter). vmap over the batch gives
a [B, H, W] mask tensor in one fused program — no per-sample host Python
(the north-star item in BASELINE.json). Divergence (documented): the
reference stops early if 10 consecutive proposals fail (rare for the recipe
settings); the device version simply keeps proposing within the attempt
budget, which makes reaching the target count slightly *more* likely.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "num_masking_patches", "min_num_patches",
        "max_num_patches", "min_aspect", "max_attempts",
    ),
)
def blockwise_mask(
    key: jax.Array,
    height: int = 14,
    width: int = 14,
    num_masking_patches: int = 120,
    min_num_patches: int = 16,
    max_num_patches: Optional[int] = None,
    min_aspect: float = 0.3,
    max_attempts: int = 0,
) -> jnp.ndarray:
    """One [height, width] float {0,1} mask."""
    max_num = num_masking_patches if max_num_patches is None else max_num_patches
    log_l = jnp.log(jnp.float32(min_aspect))
    log_u = jnp.log(jnp.float32(1.0 / min_aspect))
    if max_attempts <= 0:
        # ~10 proposals per expected block, as in the reference's retry budget
        max_attempts = 10 * max(num_masking_patches // max(min_num_patches, 1), 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    def body(i, carry):
        mask, count = carry
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, i), 4)

        remaining = num_masking_patches - count
        max_mask = jnp.minimum(remaining, max_num).astype(jnp.float32)
        # python random.uniform(a, b) works for b < a too: a + (b-a)·u
        u = jax.random.uniform(k1)
        target_area = min_num_patches + (max_mask - min_num_patches) * u
        aspect = jnp.exp(log_l + (log_u - log_l) * jax.random.uniform(k2))
        h = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
        w = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
        valid = (w < width) & (h < height)

        # random.randint(0, H-h) is inclusive of both ends
        top = jnp.floor(jax.random.uniform(k3) * (height - h + 1).astype(jnp.float32))
        left = jnp.floor(jax.random.uniform(k4) * (width - w + 1).astype(jnp.float32))
        top = jnp.clip(top.astype(jnp.int32), 0, jnp.maximum(height - h, 0))
        left = jnp.clip(left.astype(jnp.int32), 0, jnp.maximum(width - w, 0))

        region = (
            (rows >= top) & (rows < top + h) & (cols >= left) & (cols < left + w)
        ).astype(mask.dtype)
        num_masked = jnp.sum(mask * region)
        delta = (h * w).astype(mask.dtype) - num_masked
        accept = (
            valid
            & (delta > 0)
            & (delta <= max_mask)
            & (count < num_masking_patches)
        )
        new_mask = jnp.where(accept, jnp.maximum(mask, region), mask)
        new_count = count + jnp.where(accept, delta.astype(jnp.int32), 0)
        return new_mask, new_count

    mask0 = jnp.zeros((height, width), jnp.float32)
    mask, _ = jax.lax.fori_loop(0, max_attempts, body, (mask0, jnp.int32(0)))
    return mask


def batched_blockwise_mask(
    key: jax.Array,
    batch: int,
    window_size: Tuple[int, int] = (14, 14),
    num_masking_patches: int = 120,
    min_num_patches: int = 16,
    max_num_patches: Optional[int] = None,
    min_aspect: float = 0.3,
) -> jnp.ndarray:
    """[B, H·W] masks — one fused program for the whole batch."""
    keys = jax.random.split(key, batch)
    masks = jax.vmap(
        lambda k: blockwise_mask(
            k,
            height=window_size[0],
            width=window_size[1],
            num_masking_patches=num_masking_patches,
            min_num_patches=min_num_patches,
            max_num_patches=max_num_patches,
            min_aspect=min_aspect,
        )
    )(keys)
    return masks.reshape(batch, -1)
