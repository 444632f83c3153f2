"""Deep-ensemble evaluation over stacked parameter pytrees.

The reference loads checkpoints 2..5 from a path template and loops members
sequentially (engine_for_finetuning.py:224-343). TPU-native version: stack
the member param trees on a leading axis and vmap one compiled forward over
it; ensemble prediction = metrics of the mean member logits, matching the
reference's `mean(logits)` combination (:288-300).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def stack_params(member_params: Sequence[Any]) -> Any:
    """Stack M param pytrees into one tree with a leading member axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *member_params)


def make_ensemble_forward(model) -> Callable:
    """Returns jitted (stacked_variables, images) → [M, B, C] member logits."""

    def one_member(variables, images):
        return model.apply(variables, images, deterministic=True)

    def forward(stacked_variables, images):
        return jax.vmap(one_member, in_axes=(0, None))(stacked_variables, images)

    return jax.jit(forward)


def ensemble_mean_logits(member_logits: jnp.ndarray) -> jnp.ndarray:
    """[M, B, C] → [B, C] mean-logit combination (engine_for_finetuning.py:288-300)."""
    return member_logits.mean(axis=0)
