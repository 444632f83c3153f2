"""Stochastic (dist) finetune engine: triplet batches, CE + contrastive
Wasserstein loss.

Replaces engine_for_finetuning_dist.dist_train_one_epoch (:286-438). The
reference deep-copies the whole model EVERY STEP to get a frozen "dummy" for
the pos/neg forwards (:296-299) — here those are simply stop_gradient
deterministic forwards with the same params: same math, none of the copy
cost.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uncertainty_vit_tpu.ops import losses as L
from uncertainty_vit_tpu.ops.mixup import mixup_cutmix, one_hot_smooth
from uncertainty_vit_tpu.train.optim import global_norm, hessian_aware_update


@flax.struct.dataclass
class DistFinetuneState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DistFinetuneHParams:
    num_classes: int = 100
    mixup_active: bool = True
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    label_smoothing: float = 0.1
    mixup_mode: str = "batch"
    cutmix_minmax: Optional[tuple] = None
    lambda_finetuning: float = 1e-4  # run_class_finetuning.py:240
    lambda_pvn: float = 1e-4  # run_class_finetuning.py:241
    # gradient accumulation: the reported LR is indexed in update units
    update_freq: int = 1


def make_dist_finetune_train_step(
    model,
    tx: optax.GradientTransformation,
    hp: DistFinetuneHParams,
    lr_schedule: Optional[Callable] = None,
    aug_fn: Optional[Callable] = None,
    prep_fn: Optional[Callable] = None,
    use_hessian: bool = False,
):
    """Returns jitted (state, img, pos, neg, labels, rng) → (state, metrics).

    Without hooks, img/pos/neg are [B, H, W, 3] f32 (img augmented, pos/neg
    eval-transformed on the host side, per dist_datasets.py:31-44). With
    aug_fn (key, uint8 imgs) → f32 and prep_fn (uint8 imgs) → f32, the step
    takes RAW uint8 triplets and runs the anchor augmentation + the pos/neg
    eval transforms in-graph — one dispatch per step, same fusion as
    engine_finetune's aug_fn (round-4 loop fusion)."""
    if (aug_fn is None) != (prep_fn is None):
        raise ValueError(
            "aug_fn and prep_fn must be provided together: the fused step "
            "takes raw uint8 for ALL THREE triplet streams (anchor aug + "
            "pos/neg eval prep)"
        )

    def step_fn(state: DistFinetuneState, img, pos, neg, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_mix, r_drop, r_path, r_quant, r_aug = jax.random.split(rng, 5)
        if aug_fn is not None:
            img = aug_fn(r_aug, img)
            pos = prep_fn(pos)
            neg = prep_fn(neg)

        if hp.mixup_active:
            img, targets = mixup_cutmix(
                r_mix, img, labels, hp.num_classes,
                hp.mixup_alpha, hp.cutmix_alpha, hp.mixup_prob,
                hp.mixup_switch_prob, hp.label_smoothing,
                mode=hp.mixup_mode, cutmix_minmax=hp.cutmix_minmax,
            )
        else:
            targets = one_hot_smooth(labels, hp.num_classes, hp.label_smoothing)

        def loss_fn(params):
            variables = {"params": params}
            # 'quant' rng: the stochastic model supports cfg.quant='int8'
            # (layers.py 2-D DualSto bridge); without a per-step quant fold
            # gradient stochastic rounding would reuse one dither every
            # layer/step — a deterministic, biased estimator (ADVICE r3).
            mean, cov, logits = model.apply(
                variables, img, deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_path, "quant": r_quant},
            )
            ce = L.soft_target_cross_entropy(logits, targets)

            # frozen forward for pos/neg embeddings (dummy model, eval mode)
            pos_mean, pos_cov, _ = model.apply(variables, pos, deterministic=True)
            neg_mean, neg_cov, _ = model.apply(variables, neg, deterministic=True)
            pos_mean = jax.lax.stop_gradient(pos_mean)
            pos_cov = jax.lax.stop_gradient(pos_cov)
            neg_mean = jax.lax.stop_gradient(neg_mean)
            neg_cov = jax.lax.stop_gradient(neg_cov)

            w_loss = L.wasserstein_finetune_loss(
                mean.astype(jnp.float32), cov.astype(jnp.float32),
                pos_mean.astype(jnp.float32), pos_cov.astype(jnp.float32),
                neg_mean.astype(jnp.float32), neg_cov.astype(jnp.float32),
                hp.lambda_finetuning, hp.lambda_pvn,
            )
            loss = ce + w_loss
            return loss, (logits, ce, w_loss)

        (loss, (logits, ce, w_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = hessian_aware_update(
            tx, grads, state.opt_state, state.params, loss_fn=loss_fn,
            rng=jax.random.fold_in(rng, 7919), use_hessian=use_hessian,
        )
        params = optax.apply_updates(state.params, updates)

        new_state = DistFinetuneState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(targets, -1)).astype(jnp.float32)
        )
        metrics = {
            "loss": loss,
            "ce_loss": ce,
            "wasserstein_loss": w_loss,
            "class_acc": acc,
            "grad_norm": global_norm(grads),
        }
        if lr_schedule is not None:
            # schedules are built over update units (cli/builders.py)
            metrics["lr"] = lr_schedule(state.step // hp.update_freq)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_dist_eval_step(model):
    """(variables, images) → (mean, cov, logits) deterministic
    (engine_for_finetuning_dist.dist_evaluate:441-495)."""

    def eval_fn(variables, images):
        return model.apply(variables, images, deterministic=True)

    return jax.jit(eval_fn)


def init_dist_finetune_state(model, tx, rng, sample_images) -> DistFinetuneState:
    params = model.init(rng, sample_images)["params"]
    return DistFinetuneState(
        params=params, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32)
    )
