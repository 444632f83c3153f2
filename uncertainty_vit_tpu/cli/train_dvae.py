"""Discrete-VAE tokenizer trainer.

The reference has NO in-repo producer for its dVAE weights: `Dalle_VAE`
loads OpenAI's pickled encoder/decoder (modeling_discrete_vae.py:203-225,
utils.py:548-560) and `BasicVAE`/`DiscreteVAE` exist untrained. This driver
closes that gap: it trains `models.dvae.DiscreteVAE` with the DALL-E recipe
shape — gumbel-softmax relaxation over the codebook, pixel reconstruction
loss, KL-to-uniform codebook regularizer, cosine temperature annealing —
and exports weights consumable by the BEiT/joint pretrainers'
`--discrete_vae_weight_path`.

Loss = MSE(recon, x) + kl_weight · KL(q(z|x) ‖ Uniform(V)); the KL term
pushes codebook usage up, tracked here as the perplexity of the batch-mean
code distribution (exp of its entropy) and the fraction of distinct argmax
codes per batch.
"""

from __future__ import annotations

import argparse
import ast
import functools

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.cli import builders as B
from uncertainty_vit_tpu.cli.common import setup_jax
from uncertainty_vit_tpu.data.pipeline import device_prefetch
from uncertainty_vit_tpu.models.dvae import DiscreteVAE, map_pixels
from uncertainty_vit_tpu.ops.augment import (
    random_hflip_batch, random_resized_crop_batch, to_planar, from_planar,
)
from uncertainty_vit_tpu.train import schedules
from uncertainty_vit_tpu.train.optim import make_optimizer
from uncertainty_vit_tpu.utils import checkpoint as C
from uncertainty_vit_tpu.utils.logging import JsonlLogger, MetricLogger


def get_args_parser():
    p = argparse.ArgumentParser("dVAE tokenizer training", add_help=True)
    B.add_data_args(p)
    B.add_io_args(p)
    g = p.add_argument_group("dvae")
    g.add_argument("--input_size", type=int, default=112,
                   help="tokenizer-view resolution (BEiT second_input_size)")
    g.add_argument("--vocab_size", type=int, default=8192)
    g.add_argument("--dvae_num_layers", type=int, default=3)
    g.add_argument("--dvae_hidden_dim", type=int, default=64)
    g.add_argument("--codebook_dim", type=int, default=512)
    g.add_argument("--lr", type=float, default=1e-3)
    g.add_argument("--min_lr", type=float, default=1e-5)
    g.add_argument("--warmup_epochs", type=int, default=1)
    g.add_argument("--weight_decay", type=float, default=0.0)
    g.add_argument("--clip_grad", type=float, default=None)
    g.add_argument("--kl_weight", type=float, default=6.6e-3,
                   help="KL(q‖uniform) coefficient (DALL-E final beta / V)")
    g.add_argument("--temperature_start", type=float, default=1.0)
    g.add_argument("--temperature_end", type=float, default=0.0625)
    g.add_argument("--temperature_anneal_steps", type=int, default=150000)
    g.add_argument("--use_map_pixels", type=ast.literal_eval, default=False,
                   help="train in the dall-e logit-Laplace pixel space "
                        "(match --discrete_vae_type dall-e at pretrain time)")
    return p


def augment_batch(key, images_u8, out_size: int, use_map_pixels: bool):
    """RRC(0.3-1.0)+HFlip → [0,1] (or map_pixels space) tokenizer view."""
    kf, kc = jax.random.split(key)
    imgs = to_planar(images_u8)
    imgs = random_hflip_batch(kf, imgs)
    imgs = random_resized_crop_batch(kc, imgs, out_size, scale=(0.3, 1.0))
    out = from_planar(imgs)
    return map_pixels(out) if use_map_pixels else out


def temperature_schedule(step, start: float, end: float, anneal_steps: int):
    t = jnp.clip(step.astype(jnp.float32) / max(anneal_steps, 1), 0.0, 1.0)
    return end + 0.5 * (start - end) * (1.0 + jnp.cos(jnp.pi * t))


def make_dvae_train_step(model: DiscreteVAE, tx, args):
    @jax.jit
    def step_fn(variables, opt_state, step, images, rng):
        tau = temperature_schedule(
            step, args.temperature_start, args.temperature_end,
            args.temperature_anneal_steps,
        )

        def loss_fn(params):
            recon, logits = model.apply(
                {"params": params}, images, tau, jax.random.fold_in(rng, step)
            )
            recon_loss = jnp.mean(
                (recon.astype(jnp.float32) - images.astype(jnp.float32)) ** 2
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            q = jnp.exp(logp)
            # KL(q ‖ U) = log V − H(q), per spatial position
            kl = jnp.log(float(args.vocab_size)) + jnp.mean(
                jnp.sum(q * logp, axis=-1)
            )
            loss = recon_loss + args.kl_weight * kl

            # codebook-usage telemetry: perplexity of the batch-mean code
            # distribution + distinct-argmax fraction
            mean_q = jnp.mean(q.reshape(-1, q.shape[-1]), axis=0)
            perplexity = jnp.exp(
                -jnp.sum(mean_q * jnp.log(mean_q + 1e-10))
            )
            hard = jax.nn.one_hot(jnp.argmax(logits, axis=-1), args.vocab_size)
            used = jnp.sum(jnp.max(hard.reshape(-1, args.vocab_size), axis=0))
            return loss, {
                "loss": loss, "recon_loss": recon_loss, "kl": kl,
                "perplexity": perplexity,
                "codebook_used_frac": used / float(args.vocab_size),
                "temperature": tau,
            }

        grads, metrics = jax.grad(loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, variables["params"], updates
        )
        return {"params": params}, opt_state, step + 1, metrics

    return step_fn


def main(args):
    setup_jax()
    B.validate_aug_args(args)
    loader, _ = B.build_loaders(args, is_train=True)
    steps_per_epoch = args.steps_per_epoch or len(loader)

    model = DiscreteVAE(
        image_size=args.input_size, num_tokens=args.vocab_size,
        codebook_dim=args.codebook_dim, num_layers=args.dvae_num_layers,
        hidden_dim=args.dvae_hidden_dim,
    )
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((2, args.input_size, args.input_size, 3))
    variables = model.init(rng, sample)

    total = args.epochs * steps_per_epoch
    warmup = args.warmup_epochs * steps_per_epoch
    lr = schedules.cosine_schedule(args.lr, args.min_lr, total, warmup)
    tx = make_optimizer(
        variables["params"], lr, weight_decay=args.weight_decay,
        clip_grad=args.clip_grad,
    )
    opt_state = tx.init(variables["params"])
    step = jnp.zeros([], jnp.int32)

    start_epoch = 0
    if args.auto_resume:
        state = {"variables": variables, "opt_state": opt_state, "step": step}
        state, start_epoch = C.auto_load(args.output_dir, state)
        variables, opt_state, step = (
            state["variables"], state["opt_state"], state["step"]
        )

    step_fn = make_dvae_train_step(model, tx, args)
    aug = jax.jit(functools.partial(
        augment_batch, out_size=args.input_size,
        use_map_pixels=args.use_map_pixels,
    ))
    jsonl = JsonlLogger(args.output_dir)

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        logger = MetricLogger()
        data_rng = jax.random.fold_in(rng, epoch)
        for i, batch in enumerate(
            logger.log_every(device_prefetch(loader), 10, f"Epoch: [{epoch}]")
        ):
            if i >= steps_per_epoch:
                break
            images = aug(jax.random.fold_in(data_rng, i), jnp.asarray(batch[0]))
            variables, opt_state, step, metrics = step_fn(
                variables, opt_state, step, images, rng
            )
            loss = float(metrics["loss"])
            B.check_finite_or_die(loss, int(step))
            logger.update(**{k: float(v) for k, v in metrics.items()})
        jsonl.write({
            "epoch": epoch,
            **{f"train_{k}": v for k, v in logger.epoch_summary().items()},
        })
        if args.output_dir and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            C.save_checkpoint(
                args.output_dir, epoch,
                {"variables": variables, "opt_state": opt_state, "step": step},
            )
    if args.output_dir:
        # weights alone, in the layout the BEiT/joint pretrainers restore
        # with --discrete_vae_weight_path (cli/pretrain_beit.py)
        C.save_checkpoint(args.output_dir, "dvae-weights", variables)
    return variables


if __name__ == "__main__":
    main(get_args_parser().parse_args())
