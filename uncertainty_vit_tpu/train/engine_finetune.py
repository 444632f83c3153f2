"""Supervised finetune engine: fused pjit train/eval steps.

Replaces engine_for_finetuning.py:46-220: mixup/cutmix runs on device inside
the step, grad accumulation is optax.MultiSteps in the optimizer, the
DeepSpeed/NativeScaler dual path collapses to plain bf16 (no loss scaling
needed on TPU), and per-step LR/WD come from in-graph schedules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uncertainty_vit_tpu.ops import losses as L
from uncertainty_vit_tpu.ops.mixup import mixup_cutmix, one_hot_smooth
from uncertainty_vit_tpu.train.ema import ema_on_update_boundary, ema_update
from uncertainty_vit_tpu.train.optim import global_norm, hessian_aware_update


@flax.struct.dataclass
class FinetuneState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    model_ema: Optional[Any] = None  # optional student EMA (run_class_finetuning.py:545-553)
    sngp_state: Optional[Any] = None  # GP precision matrix when head_type='sngp'
    spectral_stats: Optional[Any] = None  # power-iteration vectors
    sngp_frozen: Optional[Any] = None  # frozen RFF projection (never updated)


@dataclasses.dataclass(frozen=True)
class FinetuneHParams:
    num_classes: int = 1000
    # mixup/cutmix (run_class_finetuning.py:339-346)
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    label_smoothing: float = 0.1
    mixup_active: bool = True
    # timm Mixup mode: 'batch' | 'elem' | 'pair' (run_class_finetuning.py:344)
    mixup_mode: str = "batch"
    # timm cutmix_minmax box-ratio bounds, or None (run_class_finetuning.py:342)
    cutmix_minmax: Optional[Tuple[float, float]] = None
    # criterion when mixup is off: 'smooth' | 'ce'
    criterion: str = "smooth"
    # optional on-the-fly masking (engine_for_finetuning.py:80-82)
    masked_position_prob: float = 0.0
    num_patches: int = 196
    # student EMA decay (timm ModelEma default)
    model_ema_decay: float = 0.9999
    # head type decides which mutable collections thread through the step
    head_type: str = "linear"
    # gradient-accumulation factor (optax.MultiSteps): EMA updates and the
    # reported LR are indexed in *update* units (engine_for_finetuning.py:66,
    # 110-127), not mini-steps
    update_freq: int = 1


def make_finetune_train_step(
    model,
    tx: optax.GradientTransformation,
    hp: FinetuneHParams,
    lr_schedule: Optional[Callable] = None,
    aug_fn: Optional[Callable] = None,
    use_hessian: bool = False,
):
    """Returns jitted (state, images, labels, rng[, valid_hw]) → (state, metrics).

    use_hessian: set when needs_hessian(args.opt) — adds the Hutchinson
    jvp-of-grad pass feeding adahessian's hessian_diag extra arg.

    aug_fn: optional (key, images, valid_hw) → f32 images augmentation run
    IN-GRAPH — `images` is then the raw uint8 host batch and the whole
    decode-boundary→aug→fwd→bwd→update program is ONE dispatch, letting XLA
    overlap the augmentation of step i with the tail of step i-1 instead of
    serializing two dispatches per step (the reference pays the same split
    as separate CPU transforms + H2D, run_class_finetuning.py:117)."""
    use_sngp = hp.head_type == "sngp"

    def step_fn(state: FinetuneState, images, labels, rng, valid_hw=None):
        rng = jax.random.fold_in(rng, state.step)
        if aug_fn is not None:
            rng, r_aug = jax.random.split(rng)
            images = aug_fn(r_aug, images, valid_hw)
        r_mix, r_mask, r_drop, r_path, r_mc, r_quant = jax.random.split(rng, 6)

        if hp.mixup_active:
            images, targets = mixup_cutmix(
                r_mix, images, labels, hp.num_classes,
                hp.mixup_alpha, hp.cutmix_alpha, hp.mixup_prob,
                hp.mixup_switch_prob, hp.label_smoothing,
                mode=hp.mixup_mode, cutmix_minmax=hp.cutmix_minmax,
            )
        elif hp.label_smoothing > 0 and hp.criterion == "smooth":
            targets = one_hot_smooth(labels, hp.num_classes, hp.label_smoothing)
        else:
            targets = jax.nn.one_hot(labels, hp.num_classes)

        bool_masked_pos = None
        if hp.masked_position_prob > 0:
            bool_masked_pos = jax.random.bernoulli(
                r_mask, hp.masked_position_prob, (images.shape[0], hp.num_patches)
            ).astype(jnp.float32)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if use_sngp:
                variables["sngp_state"] = state.sngp_state
                variables["sngp_frozen"] = state.sngp_frozen
                if state.spectral_stats is not None:
                    variables["spectral_stats"] = state.spectral_stats
                    mutable = ["sngp_state", "spectral_stats"]
                else:
                    mutable = ["sngp_state"]
            rngs = {"dropout": r_drop, "droppath": r_path, "quant": r_quant}
            if hp.head_type == "het":
                rngs["mc"] = r_mc
            out = model.apply(
                variables, images, bool_masked_pos,
                deterministic=False, update_sngp_cov=use_sngp,
                rngs=rngs, mutable=mutable if mutable else False,
            )
            logits, new_vars = out if mutable else (out, {})
            loss = L.soft_target_cross_entropy(logits, targets)
            return loss, (logits, new_vars)

        (loss, (logits, new_vars)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        updates, opt_state = hessian_aware_update(
            tx, grads, state.opt_state, state.params, loss_fn=loss_fn,
            rng=jax.random.fold_in(rng, 7919), use_hessian=use_hessian,
        )
        params = optax.apply_updates(state.params, updates)

        model_ema = state.model_ema
        if model_ema is not None:
            model_ema = ema_on_update_boundary(
                lambda: ema_update(state.model_ema, params, hp.model_ema_decay),
                state.model_ema, state.step, hp.update_freq,
            )

        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            model_ema=model_ema,
            sngp_state=new_vars.get("sngp_state", state.sngp_state),
            spectral_stats=new_vars.get("spectral_stats", state.spectral_stats),
        )
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(targets, -1)).astype(jnp.float32)
        )
        metrics = {
            "loss": loss,
            "class_acc": acc,
            "grad_norm": global_norm(grads),
        }
        if lr_schedule is not None:
            # schedules are built over update units (cli/builders.py
            # build_lr_schedules); report at the update index, not mini-steps
            metrics["lr"] = lr_schedule(state.step // hp.update_freq)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model, head_type: str = "linear"):
    """Deterministic eval forward: (variables, images) → logits."""

    def eval_fn(variables, images):
        return model.apply(variables, images, deterministic=True)

    return jax.jit(eval_fn)


def init_finetune_state(
    model, tx: optax.GradientTransformation, rng, sample_images,
    use_model_ema: bool = False, head_type: str = "linear",
) -> FinetuneState:
    rngs = {"params": rng}
    if head_type == "het":
        rngs["mc"] = jax.random.fold_in(rng, 99)
    variables = model.init(rngs, sample_images)
    params = variables["params"]
    return FinetuneState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros([], jnp.int32),
        model_ema=jax.tree_util.tree_map(jnp.copy, params) if use_model_ema else None,
        sngp_state=variables.get("sngp_state"),
        spectral_stats=variables.get("spectral_stats"),
        sngp_frozen=variables.get("sngp_frozen"),
    )
