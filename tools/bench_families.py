"""Refresh the model-family throughput numbers on the real chip.

One JSON line per case, matching the batch sizes of the round-2
measurements recorded in PARITY.md ("Performance" table) so the refreshed
numbers are directly comparable:

  eval_fwd_224      ViT-B/16 224 deterministic eval forward, batch 128
  eval_fwd_384      ViT-B/16 384 eval forward (N=577), batch 64
  cyclical_step     data2vec pretrain step, recipe config incl. EMA-teacher
                    forward, batch 128
  vitb_384_train    ViT-B/16 384 train step (multi-head-group kernel), batch 32
  vitl_224_train    ViT-L/16 224 train step, batch 64
  vitl_512_train    ViT-L/16 512 train step (N=1025, streaming kernel), batch 8

Run with PYTHONPATH=/root/.axon_site:/root/repo. All timings close with a
host readback (jax.block_until_ready is a silent no-op under axon).
`--only substr` filters cases; `--smoke` runs a tiny CPU self-test of the
harness itself.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="substring filter on case names")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from uncertainty_vit_tpu.cli.common import setup_jax

    # finetune-recipe attention defaults (bounded scores) — the same
    # trace-time config the refreshed headline uses
    setup_jax(bounded_scores_default=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uncertainty_vit_tpu.core.config import get_preset
    from uncertainty_vit_tpu.models.cyclical import CyclicalViT
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_cyclical import (
        CyclicalHParams, CyclicalState, make_cyclical_train_step,
    )
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, init_finetune_state, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf))

    def measure(name, batch, run, warmup=3):
        for _ in range(warmup):
            out = run()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run()
        sync(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": name,
            "value": round(args.iters * batch / dt, 1),
            "unit": "images/sec/chip",
            "batch": batch,
            "ms_per_step": round(1e3 * dt / args.iters, 2),
        }), flush=True)

    def eval_case(name, preset, size, batch):
        cfg = get_preset(preset, use_shared_rel_pos_bias=True)
        model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        measure(name, batch, lambda: fwd(variables, x))

    def train_case(name, preset, size, batch):
        cfg = get_preset(preset, use_shared_rel_pos_bias=True,
                         drop_path_rate=0.1, init_values=0.1)
        model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
        hp = FinetuneHParams(num_classes=cfg.num_classes,
                             num_patches=cfg.num_patches)
        lr = schedules.cosine_schedule(4e-3, 1e-6, 10_000, warmup_steps=500)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (batch,), 0, cfg.num_classes)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
        tx = make_optimizer(params, lr, weight_decay=0.05, layer_decay=0.65,
                            depth=cfg.depth)
        state = init_finetune_state(model, tx, jax.random.PRNGKey(0), x)
        step = make_finetune_train_step(model, tx, hp, lr)
        holder = {"s": state}
        rng = jax.random.PRNGKey(3)

        def run():
            holder["s"], m = step(holder["s"], x, labels, rng)
            return m["loss"]

        measure(name, batch, run)

    def cyclical_case(name, batch):
        cfg = get_preset("beit_base_patch16_224", num_classes=0,
                         attn_drop_rate=0.05, drop_path_rate=0.25,
                         init_values=1e-4).replace(
            head_type="none", has_masking=True)
        model = CyclicalViT(cfg=cfg, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3))
        mask = batched_blockwise_mask(
            jax.random.PRNGKey(2), batch, (14, 14), 120, 16, 196)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, mask)["params"]
        lr = schedules.cosine_schedule(2e-3, 1e-6, 10_000, warmup_steps=500)
        tx = make_optimizer(params, lr, clip_grad=3.0)
        state = CyclicalState(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params), step=jnp.zeros([], jnp.int32),
        )
        step = make_cyclical_train_step(model, tx, CyclicalHParams(
            target_layers=(6, 7, 8, 9, 10, 11), layer_results="end",
            post_target_layer_norm=True), lr)
        holder = {"s": state}
        rng = jax.random.PRNGKey(3)

        def run():
            holder["s"], m = step(holder["s"], x, mask, rng)
            return m["loss"]

        measure(name, batch, run)

    if args.smoke:
        cases = [("smoke_eval", lambda: eval_case(
            "smoke_eval", "beit_test_patch16_32", 32, 4))]
        args.iters = 2
    else:
        cases = [
            ("eval_fwd_224", lambda: eval_case(
                "vit_b16_224_eval_forward", "beit_base_patch16_224", 224, 128)),
            ("eval_fwd_384", lambda: eval_case(
                "vit_b16_384_eval_forward", "beit_base_patch16_384", 384, 64)),
            ("cyclical_step", lambda: cyclical_case(
                "vit_b16_224_cyclical_pretrain_step", 128)),
            ("vitb_384_train", lambda: train_case(
                "vit_b16_384_train_step", "beit_base_patch16_384", 384, 32)),
            ("vitl_224_train", lambda: train_case(
                "vit_l16_224_train_step", "beit_large_patch16_224", 224, 64)),
            ("vitl_384_train", lambda: train_case(
                "vit_l16_384_train_step", "beit_large_patch16_384", 384, 16)),
            ("vitl_512_train", lambda: train_case(
                "vit_l16_512_train_step", "beit_large_patch16_512", 512, 8)),
        ]
    for name, fn in cases:
        if args.only and args.only not in name:
            continue
        try:
            fn()
        except Exception as e:  # keep the ladder moving; record the failure
            print(json.dumps({"metric": name, "error":
                              f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
