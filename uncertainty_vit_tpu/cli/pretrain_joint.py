"""Joint cyclical+BEiT pretraining driver — replaces run_cyclical_joint.py.

Combines the EMA-teacher regression (cyclical) with dVAE codebook prediction
(BEiT), mixed by an epoch-annealed weight (engine_for_cyclical_joint.py:84-85).
"""

from __future__ import annotations

import argparse
import ast

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.cli import builders as B
from uncertainty_vit_tpu.cli.common import setup_jax
from uncertainty_vit_tpu.data.pipeline import device_prefetch
from uncertainty_vit_tpu.cli.pretrain_beit import two_view_batch
from uncertainty_vit_tpu.models.mim import JointViT
from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask
from uncertainty_vit_tpu.train.engine_cyclical import CyclicalState
from uncertainty_vit_tpu.train.optim import needs_hessian
from uncertainty_vit_tpu.train.engine_mim import JointHParams, make_joint_train_step
from uncertainty_vit_tpu.utils import checkpoint as C
from uncertainty_vit_tpu.utils.logging import JsonlLogger, MetricLogger


def get_args_parser():
    p = argparse.ArgumentParser("joint cyclical+BEiT pretraining", add_help=True)
    B.add_model_args(p)
    B.add_opt_args(p, lr=2e-3)
    B.add_data_args(p)
    B.add_mask_args(p)
    B.add_io_args(p)
    g = p.add_argument_group("joint")
    g.add_argument("--target_layers", type=str, default="[6,7,8,9,10,11]")
    g.add_argument("--layer_results", type=str, default="end")
    g.add_argument("--l1_beta", type=float, default=2.0)
    g.add_argument("--seed_model", type=str, default="",
                   help="alias of --finetune for the pretrainer "
                        "(run_cyclical.py:332)")
    g.add_argument("--ema_decay", type=float, default=0.9998)
    g.add_argument("--ema_decay_init", type=float, default=0.999)
    g.add_argument("--ema_start_at", type=int, default=0)
    g.add_argument("--vae_loss_weight", type=float, default=100.0,
                   help="annealing horizon in epochs (run_cyclical_joint.py)")
    g.add_argument("--vocab_size", type=int, default=8192)
    g.add_argument("--second_input_size", type=int, default=112)
    g.add_argument("--discrete_vae_weight_path", type=str, default="")
    g.add_argument("--discrete_vae_type", type=str, default="customized",
                   choices=["none", "dall-e", "customized"])
    g.add_argument("--dvae_num_layers", type=int, default=3)
    g.add_argument("--dvae_hidden_dim", type=int, default=64)
    return p


def main(args):
    setup_jax()
    B.validate_aug_args(args)
    if getattr(args, "seed_model", "") and not args.finetune:
        # reference --seed_model: initialize the pretrainer from a
        # checkpoint incl. surgery (run_cyclical.py:332-460)
        args.finetune = args.seed_model
    loader, _ = B.build_loaders(args, is_train=True, letterbox_ok=True)
    steps_per_epoch = args.steps_per_epoch or len(loader)
    cfg = B.model_config_from_args(args, num_classes=0).replace(head_type="none")
    model = JointViT(cfg=cfg, vocab_size=args.vocab_size, dtype=B.compute_dtype(args))

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
    if args.finetune and args.finetune.endswith((".pth", ".pt")):
        # --seed_model / --finetune: torch-checkpoint init + surgery
        # (run_cyclical.py:332-460)
        sd = C.load_torch_state_dict(args.finetune)
        params, missing, unused = C.import_torch_params(sd, params)
        print(f"seeded from {args.finetune}: {len(missing)} missing, "
              f"{len(unused)} unused", flush=True)
    lr_schedule, wd_schedule, _ = B.build_lr_schedules(args, steps_per_epoch)
    tx = B.build_optimizer(args, params, lr_schedule, wd_schedule, cfg.depth)
    state = CyclicalState(
        params=params, opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros([], jnp.int32),
    )
    hp = JointHParams(
        target_layers=tuple(ast.literal_eval(args.target_layers)),
        layer_results=args.layer_results,
        l1_beta=args.l1_beta,
        ema_decay=args.ema_decay,
        ema_decay_init=args.ema_decay_init,
        ema_start_at=args.ema_start_at,
        vae_loss_weight_anneal_epochs=args.vae_loss_weight,
        update_freq=max(1, args.update_freq),
    )

    start_epoch = 0
    if args.auto_resume:
        state, start_epoch = C.auto_load(args.output_dir, state)

    step_fn = make_joint_train_step(model, dvae, dvae_vars, tx, hp, lr_schedule,
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
            state, metrics = step_fn(
                state, images, vae_images, masks, jnp.float32(epoch), rng
            )
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
