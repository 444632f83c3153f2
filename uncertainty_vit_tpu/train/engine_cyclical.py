"""Cyclical (data2vec) pretraining engine: one fused pjit train step.

Replaces the reference hot loop (engine_for_cyclical.py:45-219) with a single
compiled program per step: teacher forward (EMA params, no grad), target
normalization pipeline, masked student forward, loss, grads, optimizer
update, and the EMA teacher update — all on device. LR/WD schedules are
evaluated inside the step; the DDP all-reduce becomes the XLA-inserted psum
from the data-sharded batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uncertainty_vit_tpu.ops import losses as L
from uncertainty_vit_tpu.train.ema import cyclical_ema_step, ema_on_update_boundary
from uncertainty_vit_tpu.train.optim import global_norm, hessian_aware_update


@flax.struct.dataclass
class CyclicalState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    # SNGP lm_head state when pretraining with --gp_layer
    # (modeling_cyclical.py:133: the student's lm_head is an SNGP module).
    sngp_state: Optional[Any] = None  # streaming GP precision matrix
    sngp_frozen: Optional[Any] = None  # frozen RFF projection (never updated)


@dataclasses.dataclass(frozen=True)
class CyclicalHParams:
    """Knobs of engine_for_cyclical.train_one_epoch (engine_for_cyclical.py:24-32)."""

    target_layers: Tuple[int, ...] = (6, 7, 8, 9, 10, 11)
    layer_results: str = "end"  # 'end' | 'fc'
    l1_beta: float = 2.0
    l2_loss: bool = False
    var_w0: float = 0.0
    var_margin0: float = 0.5
    loss_scale: float = -1.0
    mask_dropout_prob: float = -1.0
    # target normalization ladder (engine_for_cyclical.py:94-118)
    target_layer_norm_last: bool = True
    target_batch_norm: bool = False
    target_instance_norm: bool = False
    post_target_instance_norm: bool = False
    post_target_layer_norm: bool = False
    # EMA teacher (README.md:16 recipe: decay 0.9998, init 0.999, start 0)
    ema_decay: float = 0.9998
    ema_decay_init: float = 0.999
    ema_start_at: int = 0
    start_lr_decay_at_step: int = -1
    # stochastic (dist) variant
    stochastic: bool = False
    lambda_pretraining: float = 1e-5
    # SNGP lm_head (--gp_layer, modeling_cyclical.py:133): threads the
    # 'sngp_state'/'sngp_frozen' collections through the student forward.
    gp_layer: bool = False
    # gradient accumulation (optax.MultiSteps): EMA warmup indexing, the EMA
    # update cadence, and the reported LR all use update units
    update_freq: int = 1


def _ln(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """F.layer_norm over the last dim, no affine (torch default eps)."""
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _instance_norm_bct(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """F.instance_norm on [B, C, T]: normalize over T per (B, C)."""
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _batch_norm_bct(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """F.batch_norm (training, no running stats) on [B, C, T]: normalize over
    (B, T) per channel."""
    x = x.astype(jnp.float32)
    mean = x.mean(axis=(0, 2), keepdims=True)
    var = x.var(axis=(0, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def build_targets(
    layer_outputs: Sequence[jnp.ndarray], hp: CyclicalHParams
) -> jnp.ndarray:
    """Teacher target pipeline (engine_for_cyclical.py:90-118): select layers,
    optional batch/instance norm (in [B,C,T] layout), per-layer layer norm,
    average, optional post-norms. Returns [B, N, C] float32."""
    vals = [layer_outputs[i].astype(jnp.float32) for i in hp.target_layers]

    if hp.target_batch_norm or hp.target_instance_norm:
        vals = [jnp.swapaxes(v, 1, 2) for v in vals]  # btc → bct
        if hp.target_batch_norm:
            vals = [_batch_norm_bct(v) for v in vals]
        if hp.target_instance_norm:
            vals = [_instance_norm_bct(v) for v in vals]
        vals = [jnp.swapaxes(v, 1, 2) for v in vals]  # bct → btc

    if hp.target_layer_norm_last:
        vals = [_ln(v) for v in vals]

    targets = sum(vals) / len(hp.target_layers)

    if hp.post_target_instance_norm:
        targets = jnp.swapaxes(_instance_norm_bct(jnp.swapaxes(targets, 1, 2)), 1, 2)
    if hp.post_target_layer_norm:
        targets = _ln(targets)
    return targets


def make_cyclical_train_step(
    model,
    tx: optax.GradientTransformation,
    hp: CyclicalHParams,
    lr_schedule: Optional[Callable] = None,
    donate: bool = True,
    prep_fn: Optional[Callable] = None,
    use_hessian: bool = False,
):
    """Returns a jitted train step.

    prep_fn=None (default): (state, images, mask, rng) → (state, metrics)
    with images [B, H, W, 3] already normalized and mask [B, num_patches]
    {0,1}.

    prep_fn: optional (key, images_u8, valid_hw) → (images, mask) run
    IN-GRAPH — the step then takes the raw uint8 host batch,
    (state, images_u8, rng[, valid_hw]) → (state, metrics), fusing
    decode-boundary→augment→mask→teacher→student→update into ONE dispatch
    per step (the reference splits CPU transforms + MaskingGenerator from
    the hot loop, run_cyclical.py:463-494, engine_for_cyclical.py:58-60)."""

    def body(state: CyclicalState, images, bool_masked_pos, rng):
        # rng is already folded with state.step by the wrappers below
        r_mask, r_drop, r_path, r_quant = jax.random.split(rng, 4)

        mask = bool_masked_pos.astype(jnp.float32)
        if hp.mask_dropout_prob > 0:
            keep = jax.random.bernoulli(
                r_mask, 1.0 - hp.mask_dropout_prob, mask.shape
            ).astype(jnp.float32)
            mask = keep * mask

        # Teacher forward on EMA params: all tokens, all layers, no grad
        # (engine_for_cyclical.py:68-88).
        teacher_out = model.apply(
            {"params": state.ema_params},
            images,
            None,
            layer_results=hp.layer_results,
            deterministic=True,
        )
        if hp.stochastic:
            mean_layers, cov_layers = teacher_out
            targets = jax.lax.stop_gradient(build_targets(mean_layers, hp))
            # cov targets get only the layer-norm stages of the pipeline
            # (engine_for_cyclical.py:73-86).
            cov_hp = dataclasses.replace(
                hp, target_batch_norm=False, target_instance_norm=False,
                post_target_instance_norm=False,
            )
            cov_targets = jax.lax.stop_gradient(build_targets(cov_layers, cov_hp))
        else:
            targets = jax.lax.stop_gradient(build_targets(teacher_out, hp))
            cov_targets = None

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            extra = {}
            if hp.gp_layer:
                variables["sngp_frozen"] = state.sngp_frozen
                variables["sngp_state"] = state.sngp_state
                mutable = ["sngp_state"]
                extra["update_sngp_cov"] = True
            out = model.apply(
                variables,
                images,
                mask,
                deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_path, "quant": r_quant},
                mutable=mutable if mutable else False,
                **extra,
            )
            student_out, new_vars = out if mutable else (out, {})
            if hp.stochastic:
                outputs, cov_outputs = student_out
                outputs = outputs.astype(jnp.float32)
                cov_outputs = cov_outputs.astype(jnp.float32)
            else:
                outputs = student_out.astype(jnp.float32)
                cov_outputs = None
            loss_cyc = L.masked_regression_loss(
                outputs, targets, mask, beta=hp.l1_beta, l2=hp.l2_loss
            )
            std_loss0 = (
                L.masked_variance_hinge(outputs, mask, hp.var_margin0)
                if hp.var_w0 > 0
                else jnp.zeros((), jnp.float32)
            )
            loss = loss_cyc + std_loss0 * hp.var_w0
            if hp.stochastic:
                loss = loss + L.wasserstein_pretrain_loss(
                    outputs.reshape(-1, outputs.shape[-1]),
                    cov_outputs.reshape(-1, cov_outputs.shape[-1]),
                    targets.reshape(-1, targets.shape[-1]),
                    cov_targets.reshape(-1, cov_targets.shape[-1]),
                    hp.lambda_pretraining,
                    mask=mask,
                )
            if hp.loss_scale != -1:
                loss = loss * hp.loss_scale
            return loss, (loss_cyc, std_loss0, new_vars)

        (loss, (loss_cyc, std_loss0, new_vars)), grads = jax.value_and_grad(
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
                state.ema_params,
                params,
                update_index,
                hp.ema_decay,
                hp.ema_decay_init,
                hp.ema_start_at,
                hp.start_lr_decay_at_step,
            ),
            state.ema_params, state.step, hp.update_freq,
        )

        new_state = CyclicalState(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            step=state.step + 1,
            sngp_state=new_vars.get("sngp_state", state.sngp_state),
            sngp_frozen=state.sngp_frozen,
        )
        metrics = {
            "loss": loss,
            "loss_cyc": loss_cyc,
            "loss_var0": std_loss0,
            "grad_norm": global_norm(grads),
            "mask_count": mask.sum() / mask.shape[0],
        }
        if lr_schedule is not None:
            # schedules are built over update units (cli/builders.py)
            metrics["lr"] = lr_schedule(update_index)
        return new_state, metrics

    if prep_fn is None:

        def step_fn(state: CyclicalState, images, bool_masked_pos, rng):
            return body(state, images, bool_masked_pos,
                        jax.random.fold_in(rng, state.step))

    else:

        def step_fn(state: CyclicalState, images_u8, rng, valid_hw=None):
            rng = jax.random.fold_in(rng, state.step)
            rng, r_prep = jax.random.split(rng)
            images, bool_masked_pos = prep_fn(r_prep, images_u8, valid_hw)
            return body(state, images, bool_masked_pos, rng)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def init_cyclical_state(
    model, tx: optax.GradientTransformation, rng, sample_images, sample_mask
) -> CyclicalState:
    variables = model.init(rng, sample_images, sample_mask)
    params = variables["params"]
    return CyclicalState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros([], jnp.int32),
        sngp_state=variables.get("sngp_state"),
        sngp_frozen=variables.get("sngp_frozen"),
    )
