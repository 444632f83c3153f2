"""EMA teacher as a pure pytree update.

Replaces timm ModelEmaV2 + the reference's manual `_update`
(run_cyclical.py:503; engine_for_cyclical.py:55-56, 182-185): e ← d·e + (1−d)·m
with a linearly warmed decay, optional freeze once LR decay starts
(run_cyclical.py:537-539, engine_for_cyclical.py:182-185).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_update(ema_params: Any, params: Any, decay) -> Any:
    """e ← decay·e + (1−decay)·m, elementwise over the pytree."""
    return jax.tree_util.tree_map(
        lambda e, m: decay * e + (1.0 - decay) * m.astype(e.dtype), ema_params, params
    )


def ema_on_update_boundary(update_fn, ema_params: Any, step, update_freq: int) -> Any:
    """Run `update_fn()` (an EMA update) only on gradient-accumulation
    boundaries.

    With optax.MultiSteps params are frozen during accumulation mini-steps;
    decaying the EMA every mini-step would compound to decay^update_freq per
    real update. The reference updates EMA only when
    `(data_iter_step + 1) % update_freq == 0` (engine_for_finetuning.py:110-127)
    — mirrored here with a lax.cond so non-boundary steps skip the update
    entirely."""
    if update_freq <= 1:
        return update_fn()
    boundary = (step + 1) % update_freq == 0
    return jax.lax.cond(boundary, update_fn, lambda: ema_params)


def cyclical_ema_step(
    ema_params: Any,
    params: Any,
    step: jnp.ndarray,
    decay: float,
    decay_init: float,
    ema_start_at: int,
    start_lr_decay_at_step: int = -1,
) -> Any:
    """The exact cyclical EMA rule (engine_for_cyclical.py:55-56, 182-185):
    decay warms linearly from decay_init to decay over ema_start_at steps;
    once `start_lr_decay_at_step` is passed (if set) the teacher freezes."""
    step_f = jnp.asarray(step, jnp.float32)
    if ema_start_at > 0:
        cur = jnp.where(
            step_f < ema_start_at,
            decay_init + step_f * (decay - decay_init) / ema_start_at,
            decay,
        )
    else:
        cur = jnp.full((), decay, jnp.float32)

    do_update = jnp.logical_and(
        cur != 1.0,
        (start_lr_decay_at_step < 0) | (step <= start_lr_decay_at_step),
    )
    eff = jnp.where(do_update, cur, 1.0)  # decay 1.0 == frozen teacher
    return ema_update(ema_params, params, eff)
