"""Per-step LR / weight-decay schedules (utils.py:408-459).

The reference precomputes numpy arrays indexed per step; here each schedule is
a jittable step→value function (an optax schedule), so the value is computed
inside the compiled train step — no host→device scalar traffic per step.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_schedule(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    start_warmup_value: float = 0.0,
):
    """utils.py:408-425: linspace warmup (inclusive of base at the last warmup
    step) then cosine from base to final over the remaining steps."""
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # np.linspace(start, base, w)[i] = start + i*(base-start)/(w-1)
        warm_denom = max(warmup_steps - 1, 1)
        warm = start_warmup_value + step * (base_value - start_warmup_value) / warm_denom
        i = step - warmup_steps
        cos = final_value + 0.5 * (base_value - final_value) * (
            1.0 + jnp.cos(jnp.pi * i / decay_steps)
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def tri_phase_schedule(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_perc: float = 0.05,
    decay_perc: float = 0.05,
    start_warmup_value: float = 0.0,
):
    """utils.py:427-459: linear warmup / hold / linear decay by percentage."""
    assert warmup_perc + decay_perc <= 1
    warmup_steps = int(warmup_perc * total_steps)
    decay_steps = int(decay_perc * total_steps)
    hold_end = total_steps - decay_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_denom = max(warmup_steps - 1, 1)
        warm = start_warmup_value + step * (base_value - start_warmup_value) / warm_denom
        decay_denom = max(decay_steps - 1, 1)
        dec = base_value + (step - hold_end) * (final_value - base_value) / decay_denom
        out = jnp.where(step < warmup_steps, warm, base_value)
        return jnp.where(step >= hold_end, dec, out)

    return schedule


def constant_schedule(value: float):
    def schedule(step):
        return jnp.full((), value, jnp.float32)

    return schedule


def ema_decay_schedule(decay: float, decay_init: float, ema_start_at: int):
    """EMA teacher decay warmup (engine_for_cyclical.py:55-56): linear from
    decay_init to decay over ema_start_at steps, then constant."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if ema_start_at <= 0:
            return jnp.full((), decay, jnp.float32)
        warm = decay_init + step * (decay - decay_init) / ema_start_at
        return jnp.where(step < ema_start_at, warm, decay)

    return schedule
