"""Sustained end-to-end train-LOOP throughput from uint8 host batches.

The headline bench.py measures the bare train step (f32 inputs already on
device). The recipe's real throughput is the serialized loop —
decode→H2D→augment→step — which round 3 measured at ~985 img/s vs the
1192 img/s bare step (PARITY.md): a ~17% gap from the separate augmentation
dispatch plus the per-step blocking float(loss) readback. This tool measures
that loop in two modes:

  --mode fused  (default): augmentation runs IN-GRAPH inside the train-step
    jit (engine_finetune aug_fn hook) — one dispatch per step — and the
    loss readback is deferred through a 2-deep window, exactly what
    cli/finetune.py now does.
  --mode split: the round-3 loop shape — separate jitted augmentation
    dispatch, then the step, then an immediate blocking readback.

Host batches are pre-decoded uint8 [B, 256, 256, 3] (the C++ JPEG runtime's
letterbox/decode output shape), cycled from a small pool; the C++ decode
itself was measured to keep ahead of the device at these rates
(tests/test_native_io.py fixtures + PARITY.md), so the device-side pipeline
is the bottleneck being measured.

Reference context: the recipe's throughput is its loop, not its step
(README.md:11-25; engine_for_finetuning.py:46-168 pays CPU transforms +
H2D + per-step .item() syncs for the same roles).

Prints one JSON line per mode.
"""

import argparse
import collections
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fused", "split", "both"], default="both")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--decode_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--window", type=int, default=2,
                    help="deferred-readback depth in fused mode")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU self-test of the tool (timings "
                         "meaningless; validates both loop shapes run)")
    args = ap.parse_args()

    if args.smoke:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.batch, args.decode_size, args.iters = 8, 40, 3
    else:
        from uncertainty_vit_tpu.cli.common import setup_jax

        setup_jax()

    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.core.config import get_preset
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.ops.augment import finetune_train_augment_batch
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams,
        init_finetune_state,
        make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    batch = args.batch
    if args.smoke:
        cfg = get_preset("beit_test_patch16_32", drop_path_rate=0.1)
        input_size = 32
    else:
        cfg = get_preset(
            "beit_base_patch16_224",
            use_shared_rel_pos_bias=True,
            drop_path_rate=0.1,
            init_values=0.1,
        )
        input_size = 224
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    hp = FinetuneHParams(num_classes=cfg.num_classes, num_patches=cfg.num_patches)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 10_000, warmup_steps=500)

    # recipe augmentation: RRC + hflip + rand-m9-mstd0.5-inc1 + erasing 0.25
    def aug(k, imgs, vhw):
        return finetune_train_augment_batch(
            k, imgs, input_size, 0.4, 0.25, True, valid_hw=vhw,
            auto_augment=True, aa_magnitude=9.0, aa_magnitude_std=0.5,
        )

    sample = jax.random.normal(
        jax.random.PRNGKey(1), (batch, input_size, input_size, 3)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)["params"]
    tx = make_optimizer(
        params, lr, weight_decay=0.05, clip_grad=None, layer_decay=0.65,
        depth=cfg.depth,
    )

    # pre-decoded uint8 pool on host (8 distinct batches, cycled)
    rs = np.random.RandomState(0)
    pool = [
        rs.randint(0, 256, (batch, args.decode_size, args.decode_size, 3), np.uint8)
        for _ in range(8)
    ]
    labels_np = rs.randint(0, cfg.num_classes, (batch,)).astype(np.int32)
    rng = jax.random.PRNGKey(3)

    def run_fused():
        state = init_finetune_state(model, tx, jax.random.PRNGKey(0), sample)
        step = make_finetune_train_step(model, tx, hp, lr, aug_fn=aug)
        labels = jnp.asarray(labels_np)
        # warmup/compile
        for i in range(3):
            state, m = step(state, jnp.asarray(pool[i % len(pool)]), labels, rng)
        float(m["loss"])  # readback = the only reliable sync under axon
        pending: "collections.deque" = collections.deque()
        t0 = time.perf_counter()
        for i in range(args.iters):
            imgs = jnp.asarray(pool[i % len(pool)])  # fresh H2D each step
            state, m = step(state, imgs, labels, rng)
            pending.append(m)
            while len(pending) > args.window:
                float(pending.popleft()["loss"])
        while pending:
            float(pending.popleft()["loss"])
        return args.iters * batch / (time.perf_counter() - t0)

    def run_split():
        state = init_finetune_state(model, tx, jax.random.PRNGKey(0), sample)
        step = make_finetune_train_step(model, tx, hp, lr)
        labels = jnp.asarray(labels_np)
        for i in range(3):
            imgs = aug(jax.random.fold_in(rng, i), jnp.asarray(pool[i % len(pool)]), None)
            state, m = step(state, imgs, labels, rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            imgs = aug(jax.random.fold_in(rng, i), jnp.asarray(pool[i % len(pool)]), None)
            state, m = step(state, imgs, labels, rng)
            float(m["loss"])  # round-3 per-step blocking readback
        return args.iters * batch / (time.perf_counter() - t0)

    results = {}
    if args.mode in ("split", "both"):
        results["split"] = run_split()
    if args.mode in ("fused", "both"):
        results["fused"] = run_fused()
    for mode, v in results.items():
        print(json.dumps({
            "metric": f"vit_b16_224_finetune_loop_throughput_{mode}",
            "value": round(v, 1),
            "unit": "images/sec/chip",
            "batch": batch,
            "decode_size": args.decode_size,
        }), flush=True)


if __name__ == "__main__":
    main()
