"""BEiT masked-image-modeling pretraining driver — replaces
run_beit_pretraining.py. The dVAE tokenizer runs in-step on the second
same-crop view (engine_for_pretraining.py:50-57)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.cli import builders as B
from uncertainty_vit_tpu.cli.common import setup_jax
from uncertainty_vit_tpu.data.pipeline import device_prefetch
from uncertainty_vit_tpu.models.mim import MIMViT
from uncertainty_vit_tpu.ops.augment import pretrain_two_view_batch
from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask
from uncertainty_vit_tpu.train.engine_mim import MIMState, make_mim_train_step
from uncertainty_vit_tpu.train.optim import needs_hessian
from uncertainty_vit_tpu.utils import checkpoint as C
from uncertainty_vit_tpu.utils.logging import JsonlLogger, MetricLogger


def get_args_parser():
    p = argparse.ArgumentParser("BEiT MIM pretraining", add_help=True)
    B.add_model_args(p)
    B.add_opt_args(p, lr=1.5e-3)
    B.add_data_args(p)
    B.add_mask_args(p)
    B.add_io_args(p)
    g = p.add_argument_group("beit")
    g.add_argument("--vocab_size", type=int, default=8192)
    g.add_argument("--second_input_size", type=int, default=112)
    g.add_argument("--discrete_vae_weight_path", type=str, default="")
    g.add_argument("--discrete_vae_type", type=str, default="customized",
                   choices=["none", "dall-e", "customized"],
                   help="tokenizer-view transform (datasets.py:86-102): "
                        "dall-e applies map_pixels, customized Inception-"
                        "normalizes, none leaves [0,1]")
    g.add_argument("--dvae_num_layers", type=int, default=3)
    g.add_argument("--dvae_hidden_dim", type=int, default=64)
    return p


def two_view_batch(args, key, images_u8, valid_hw=None):
    """Batched two-pic pipeline: ColorJitter+HFlip on the common image, one
    same-region RRC resampled at (input_size, second_input_size)
    (datasets.py:70-118) — one jitted program per step. valid_hw: letterboxed
    per-sample extents (--decode_letterbox)."""
    return pretrain_two_view_batch(
        key, jnp.asarray(images_u8), args.input_size, args.second_input_size,
        args.imagenet_default_mean_and_std, args.color_jitter,
        args.discrete_vae_type,
        second_interpolation=B.interp_method(args.second_interpolation),
        valid_hw=valid_hw,
    )


def main(args):
    setup_jax()
    B.validate_aug_args(args)
    loader, _ = B.build_loaders(args, is_train=True, letterbox_ok=True)
    steps_per_epoch = args.steps_per_epoch or len(loader)
    cfg = B.model_config_from_args(args, num_classes=0).replace(head_type="none")
    dtype = B.compute_dtype(args)
    model = MIMViT(cfg=cfg, vocab_size=args.vocab_size, dtype=dtype)

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((args.batch_size, args.input_size, args.input_size, 3))
    sample_second = jnp.zeros(
        (args.batch_size, args.second_input_size, args.second_input_size, 3)
    )
    sample_mask = jnp.zeros((args.batch_size, cfg.num_patches))
    dvae, dvae_vars = B.build_discrete_vae(
        args, jax.random.fold_in(rng, 1), sample_second
    )

    params = model.init(rng, sample, sample_mask)["params"]
    lr_schedule, wd_schedule, _ = B.build_lr_schedules(args, steps_per_epoch)
    tx = B.build_optimizer(args, params, lr_schedule, wd_schedule, cfg.depth)
    state = MIMState(params=params, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32))

    start_epoch = 0
    if args.auto_resume:
        state, start_epoch = C.auto_load(args.output_dir, state)

    step_fn = make_mim_train_step(model, dvae, dvae_vars, tx, lr_schedule,
                                  update_freq=max(1, args.update_freq),
                                  use_hessian=needs_hessian(args.opt))
    jsonl = JsonlLogger(args.output_dir)
    grid = cfg.grid_size

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        logger = MetricLogger()
        data_rng = jax.random.fold_in(rng, epoch)
        for step, batch in enumerate(logger.log_every(device_prefetch(loader), 10, f"Epoch: [{epoch}]")):
            if step >= steps_per_epoch:
                break
            akey = jax.random.fold_in(data_rng, step)
            vhw = jnp.asarray(batch[1]) if len(batch) == 3 else None
            images, vae_images = two_view_batch(args, akey, batch[0], vhw)
            masks = batched_blockwise_mask(
                jax.random.fold_in(akey, 1), images.shape[0], grid,
                args.num_mask_patches, args.min_mask_patches_per_block,
                args.max_mask_patches_per_block,
            )
            state, metrics = step_fn(state, images, vae_images, masks, rng)
            loss = float(metrics["loss"])
            B.check_finite_or_die(loss, int(state.step))
            logger.update(**{k: float(v) for k, v in metrics.items()})
        jsonl.write({"epoch": epoch, **logger.epoch_summary()})
        if args.output_dir and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            C.save_checkpoint(args.output_dir, epoch, state)
    return state


if __name__ == "__main__":
    main(get_args_parser().parse_args())
