"""Cyclical (data2vec) pretraining driver — replaces run_cyclical.py.

Recipe (README.md:11-25): ViT-B, 800 epochs, global batch 2048, lr 2e-3,
mask 120, EMA 0.9998 (init 0.999), clip 3.0, drop-path 0.25, attn-drop 0.05,
target layers [6..11].

Example (smoke):
  python -m uncertainty_vit_tpu.cli.pretrain_cyclical \
      --data_set CIFAR100 --data_path /data/cifar --input_size 224 \
      --batch_size 64 --epochs 1 --steps_per_epoch 20 --output_dir /tmp/cyc
"""

from __future__ import annotations

import argparse
import ast
import collections

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.cli import builders as B
from uncertainty_vit_tpu.cli.common import setup_jax
from uncertainty_vit_tpu.data.pipeline import device_prefetch
from uncertainty_vit_tpu.models.cyclical import CyclicalViT
from uncertainty_vit_tpu.models.dist_vit import DistCyclicalViT
from uncertainty_vit_tpu.ops.augment import pretrain_augment_batch
from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask
from uncertainty_vit_tpu.train.engine_cyclical import (
    CyclicalHParams, init_cyclical_state, make_cyclical_train_step,
)
from uncertainty_vit_tpu.train.optim import needs_hessian
from uncertainty_vit_tpu.utils import checkpoint as C
from uncertainty_vit_tpu.utils.logging import JsonlLogger, MetricLogger, TensorboardLogger


def get_args_parser():
    p = argparse.ArgumentParser("cyclical pretraining", add_help=True)
    B.add_model_args(p)
    B.add_opt_args(p, lr=2e-3)
    B.add_data_args(p)
    B.add_mask_args(p)
    B.add_io_args(p)
    g = p.add_argument_group("cyclical")
    g.add_argument("--target_layers", type=str, default="[6,7,8,9,10,11]")
    g.add_argument("--layer_results", type=str, default="end", choices=["end", "fc"])
    g.add_argument("--l1_beta", type=float, default=2.0)
    g.add_argument("--seed_model", type=str, default="",
                   help="alias of --finetune for the pretrainer "
                        "(run_cyclical.py:332)")
    g.add_argument("--l2_loss", action="store_true")
    g.add_argument("--var_w0", type=float, default=0.0)
    g.add_argument("--var_margin0", type=float, default=0.5)
    # accepted for flag-for-flag recipe compatibility; the w1 hinge term is
    # commented out in the reference itself (engine_for_cyclical.py:142,160)
    g.add_argument("--var_w1", type=float, default=0.0)
    g.add_argument("--var_margin1", type=float, default=0.5)
    g.add_argument("--loss_scale", type=float, default=-1.0)
    g.add_argument("--ema_decay", type=float, default=0.9998)
    g.add_argument("--ema_decay_init", type=float, default=0.999)
    g.add_argument("--ema_start_at", type=int, default=0)
    g.add_argument("--ema_annealing_till_end", action="store_true",
                   help="anneal the EMA decay over the whole run "
                        "(run_cyclical.py:580-582)")
    g.add_argument("--start_lr_decay_at_step", type=int, default=-1)
    g.add_argument("--skip_ema_during_lr_decay_for_tri", action="store_true",
                   help="freeze the EMA teacher once the tri-phase decay "
                        "starts (run_cyclical.py:537-539)")
    g.add_argument("--target_layer_norm_last", default=True, type=ast.literal_eval)
    g.add_argument("--no_target_layer_norm_last", action="store_false",
                   dest="target_layer_norm_last")
    g.add_argument("--target_batch_norm", action="store_true")
    g.add_argument("--target_instance_norm", action="store_true")
    g.add_argument("--post_target_instance_norm", action="store_true")
    g.add_argument("--post_target_layer_norm", action="store_true")
    g.add_argument("--lambda_pretraining", type=float, default=1e-5)
    return p


def main(args):
    setup_jax()
    B.validate_aug_args(args)
    if getattr(args, "seed_model", "") and not args.finetune:
        # reference --seed_model: initialize the pretrainer from a
        # checkpoint incl. surgery (run_cyclical.py:332-460)
        args.finetune = args.seed_model
    print(f"devices: {jax.devices()}", flush=True)

    loader, _ = B.build_loaders(args, is_train=True, letterbox_ok=True)
    steps_per_epoch = args.steps_per_epoch or len(loader)
    cfg = B.model_config_from_args(args, num_classes=0).replace(head_type="none")
    dtype = B.compute_dtype(args)
    if args.stochastic:
        if args.gp_layer:
            raise ValueError(
                "--gp_layer is only supported by the non-stochastic cyclical "
                "model (modeling_cyclical.py:133); the dist variant has no "
                "SNGP lm_head in the reference (modeling_cyclical_dist.py)."
            )
        model = DistCyclicalViT(cfg=cfg, dtype=dtype)
    else:
        # --gp_layer: student lm_head becomes an SNGP module
        # (run_cyclical.py --gp_layer → modeling_cyclical.py:133).
        model = CyclicalViT(cfg=cfg, gp_layer=args.gp_layer, dtype=dtype)

    start_lr_decay_at_step = args.start_lr_decay_at_step
    if args.tri_phase_schedule and args.skip_ema_during_lr_decay_for_tri:
        import ast as _ast

        _, decay_perc = _ast.literal_eval(args.tri_phase_schedule)
        start_lr_decay_at_step = int((1 - decay_perc) * args.epochs * steps_per_epoch)
        print(f"ema will be skipped after {start_lr_decay_at_step} updates", flush=True)

    ema_start_at = args.ema_start_at
    if args.ema_annealing_till_end:
        # linear decay warmup stretched over the whole run (run_cyclical.py:580-582)
        ema_start_at = args.epochs * steps_per_epoch
        print("EMA annealing till the end activated", flush=True)

    hp = CyclicalHParams(
        target_layers=tuple(ast.literal_eval(args.target_layers)),
        layer_results=args.layer_results,
        l1_beta=args.l1_beta,
        l2_loss=args.l2_loss,
        var_w0=args.var_w0,
        var_margin0=args.var_margin0,
        loss_scale=args.loss_scale,
        mask_dropout_prob=args.mask_dropout_prob,
        target_layer_norm_last=args.target_layer_norm_last,
        target_batch_norm=args.target_batch_norm,
        target_instance_norm=args.target_instance_norm,
        post_target_instance_norm=args.post_target_instance_norm,
        post_target_layer_norm=args.post_target_layer_norm,
        ema_decay=args.ema_decay,
        ema_decay_init=args.ema_decay_init,
        ema_start_at=ema_start_at,
        start_lr_decay_at_step=start_lr_decay_at_step,
        stochastic=args.stochastic,
        lambda_pretraining=args.lambda_pretraining,
        gp_layer=args.gp_layer,
        update_freq=max(1, args.update_freq),
    )
    lr_schedule, wd_schedule, total_steps = B.build_lr_schedules(args, steps_per_epoch)

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((args.batch_size, args.input_size, args.input_size, 3))
    sample_mask = jnp.zeros((args.batch_size, cfg.num_patches))
    params = model.init(rng, sample, sample_mask)["params"]
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)) / 1e6
    print(f"model: {args.model} ({n_params:.1f}M params), steps/epoch {steps_per_epoch}, "
          f"total {total_steps}", flush=True)

    tx = B.build_optimizer(args, params, lr_schedule, wd_schedule, cfg.depth)
    state = init_cyclical_state(model, tx, rng, sample, sample_mask)

    start_epoch = 0
    if args.auto_resume and not args.resume:
        state, start_epoch = C.auto_load(args.output_dir, state)
        if start_epoch:
            print(f"auto-resumed from epoch {start_epoch}", flush=True)
    elif args.resume:
        state = C.restore_checkpoint(args.resume, state)

    if args.finetune and args.finetune.endswith((".pth", ".pt")):
        sd = C.load_torch_state_dict(args.finetune)
        params, missing, unused = C.import_torch_params(sd, state.params)
        state = state.replace(params=params, ema_params=params)
        print(f"seeded from {args.finetune}: {len(missing)} missing, {len(unused)} unused",
              flush=True)

    grid = cfg.grid_size

    # fuse augment + blockwise-mask generation into the train-step jit: the
    # uint8 host batch goes straight into ONE dispatch per step (the aug and
    # mask dispatches previously serialized with the step on the host)
    def prep(k, imgs_u8, vhw):
        ka, km = jax.random.split(k)
        images = pretrain_augment_batch(
            ka, imgs_u8, out_size=args.input_size,
            aug_level=args.aug_level,
            imagenet_default_mean_and_std=args.imagenet_default_mean_and_std,
            color_jitter_strength=args.color_jitter,
            valid_hw=vhw,
        )
        masks = batched_blockwise_mask(
            km, images.shape[0], grid,
            args.num_mask_patches, args.min_mask_patches_per_block,
            args.max_mask_patches_per_block,
        )
        return images, masks

    train_step = make_cyclical_train_step(model, tx, hp, lr_schedule, prep_fn=prep,
                                          use_hessian=needs_hessian(args.opt))
    tb = TensorboardLogger(args.log_dir or args.output_dir)
    jsonl = JsonlLogger(args.output_dir)

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        logger = MetricLogger()
        # Deferred metric readback (see cli/finetune.py): a 2-deep window
        # keeps dispatch ~2 steps ahead of the blocking float(loss) sync
        # while still catching NaNs within 2 steps.
        pending: "collections.deque" = collections.deque()
        # NaN reports carry the GLOBAL step (diverges from
        # epoch*steps_per_epoch+step on --start_epoch resumes; advisor r4,
        # same fix as cli/finetune.py)
        step_base = int(state.step)

        def drain_one():
            m, py_step = pending.popleft()
            loss = float(m["loss"])
            B.check_finite_or_die(loss, py_step)
            logger.update(**{k: float(v) for k, v in m.items()})
            tb.update(head="loss", loss=loss)
            tb.update(head="opt", lr=float(m.get("lr", 0.0)),
                      grad_norm=float(m["grad_norm"]))
            tb.set_step()

        for step, batch in enumerate(
            logger.log_every(device_prefetch(loader), 10, f"Epoch: [{epoch}]")
        ):
            if step >= steps_per_epoch:
                break
            images_u8, _ = batch[0], batch[-1]
            # letterboxed batches carry per-sample valid extents so the RRC
            # covers the full original image (--decode_letterbox)
            vhw = jnp.asarray(batch[1]) if len(batch) == 3 else None
            state, metrics = train_step(state, jnp.asarray(images_u8), rng, vhw)
            pending.append((metrics, step_base + step))
            while len(pending) > 2:
                drain_one()
        while pending:
            drain_one()

        summary = logger.epoch_summary()
        jsonl.write({"epoch": epoch, **{f"train_{k}": v for k, v in summary.items()}})
        if args.output_dir and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            C.save_checkpoint(args.output_dir, epoch, state)
        tb.flush()
    print("done.", flush=True)
    return state


if __name__ == "__main__":
    main(get_args_parser().parse_args())
