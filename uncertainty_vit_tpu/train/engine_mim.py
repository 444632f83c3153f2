"""BEiT MIM and joint cyclical+BEiT pretraining engines.

Replaces engine_for_pretraining.train_one_epoch (:22-112) and
engine_for_cyclical_joint.train_one_epoch (:24-146): the dVAE tokenization,
masked CE over the codebook, the EMA-teacher regression targets, and the
epoch-annealed loss mix all run inside one compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uncertainty_vit_tpu.ops import losses as L
from uncertainty_vit_tpu.train.ema import cyclical_ema_step, ema_on_update_boundary
from uncertainty_vit_tpu.train.engine_cyclical import CyclicalHParams, CyclicalState, build_targets
from uncertainty_vit_tpu.train.optim import global_norm, hessian_aware_update


@flax.struct.dataclass
class MIMState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_mim_train_step(
    model,
    dvae,
    dvae_variables: Any,
    tx: optax.GradientTransformation,
    lr_schedule: Optional[Callable] = None,
    update_freq: int = 1,
    use_hessian: bool = False,
):
    """Returns jitted (state, images, vae_images, mask, rng) → (state, metrics).

    images: normalized student view; vae_images: the second same-crop view in
    [0,1] for the tokenizer (datasets.py:110-118); mask: [B, N] {0,1}.
    """

    def step_fn(state: MIMState, images, vae_images, bool_masked_pos, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_drop, r_path, r_quant = jax.random.split(rng, 3)
        mask = bool_masked_pos.astype(jnp.float32)

        # tokenize with the frozen dVAE (engine_for_pretraining.py:50-53)
        token_ids = dvae.apply(
            dvae_variables, vae_images, method=dvae.get_codebook_indices
        )
        token_ids = jax.lax.stop_gradient(token_ids)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, images, mask, deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_path, "quant": r_quant},
            )
            loss, acc = L.masked_mim_cross_entropy(logits, token_ids, mask)
            return loss, acc

        (loss, mlm_acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = hessian_aware_update(
            tx, grads, state.opt_state, state.params, loss_fn=loss_fn,
            rng=jax.random.fold_in(rng, 7919), use_hessian=use_hessian,
        )
        params = optax.apply_updates(state.params, updates)

        new_state = MIMState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, "mlm_acc": mlm_acc, "grad_norm": global_norm(grads)}
        if lr_schedule is not None:
            # schedules are built over update units (cli/builders.py)
            metrics["lr"] = lr_schedule(state.step // update_freq)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


@dataclasses.dataclass(frozen=True)
class JointHParams(CyclicalHParams):
    """Joint engine adds the annealed BEiT weight
    (engine_for_cyclical_joint.py:84-85): beit_w = max(1 − epoch/anneal, 0)."""

    vae_loss_weight_anneal_epochs: float = 100.0


def make_joint_train_step(
    model,
    dvae,
    dvae_variables: Any,
    tx: optax.GradientTransformation,
    hp: JointHParams,
    lr_schedule: Optional[Callable] = None,
    use_hessian: bool = False,
):
    """Returns jitted (state, images, vae_images, mask, epoch, rng) →
    (state, metrics). `epoch` is a traced scalar for the annealing weight."""

    def step_fn(state: CyclicalState, images, vae_images, bool_masked_pos, epoch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_drop, r_path, r_quant = jax.random.split(rng, 3)
        mask = bool_masked_pos.astype(jnp.float32)

        token_ids = jax.lax.stop_gradient(
            dvae.apply(dvae_variables, vae_images, method=dvae.get_codebook_indices)
        )
        layer_outputs = model.apply(
            {"params": state.ema_params}, images, None,
            layer_results=hp.layer_results or "end", deterministic=True,
        )
        targets = jax.lax.stop_gradient(build_targets(layer_outputs, hp))

        beit_w = jnp.maximum(
            1.0 - epoch / hp.vae_loss_weight_anneal_epochs, 0.0
        ).astype(jnp.float32)

        def loss_fn(params):
            lm_out, beit_out = model.apply(
                {"params": params}, images, mask, deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_path, "quant": r_quant},
            )
            loss_cyc = L.masked_regression_loss(
                lm_out.astype(jnp.float32), targets, mask, beta=hp.l1_beta, l2=hp.l2_loss
            )
            loss_beit, mlm_acc = L.masked_mim_cross_entropy(beit_out, token_ids, mask)
            loss = loss_cyc * (1.0 - beit_w) + loss_beit * beit_w
            return loss, (loss_cyc, loss_beit, mlm_acc)

        (loss, (loss_cyc, loss_beit, mlm_acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = hessian_aware_update(
            tx, grads, state.opt_state, state.params, loss_fn=loss_fn,
            rng=jax.random.fold_in(rng, 7919), use_hessian=use_hessian,
        )
        params = optax.apply_updates(state.params, updates)

        update_index = state.step // hp.update_freq
        ema_params = ema_on_update_boundary(
            lambda: cyclical_ema_step(
                state.ema_params, params, update_index,
                hp.ema_decay, hp.ema_decay_init, hp.ema_start_at,
                hp.start_lr_decay_at_step,
            ),
            state.ema_params, state.step, hp.update_freq,
        )
        new_state = CyclicalState(
            params=params, opt_state=opt_state, ema_params=ema_params,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "loss_cyc": loss_cyc,
            "loss_beit": loss_beit,
            "mlm_acc": mlm_acc,
            "beit_weight": beit_w,
            "grad_norm": global_norm(grads),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(update_index)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
