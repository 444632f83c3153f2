"""Headline benchmark: ViT-B/16 224 finetune training throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: an A100-class GPU sustains roughly 850 img/s on ViT-B/16 224
supervised training in mixed precision (DeiT-class recipes; the reference
publishes no throughput of its own — BASELINE.md). The BASELINE.json north
star asks for ≥2× that per TPU chip, i.e. vs_baseline ≥ 2.0.

The measured step is the full finetune train step: on-device mixup/cutmix,
bf16 forward/backward through the fused Pallas attention path, AdamW with
layer decay + scheduled weight decay, EMA-free (reference finetune default).
"""

import json
import time

A100_CLASS_IMG_PER_SEC = 850.0


def main():
    from uncertainty_vit_tpu.cli.common import setup_jax

    setup_jax()  # persistent compilation cache across driver runs

    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.core.config import get_preset
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams,
        init_finetune_state,
        make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    # batch 256 measured +0.9% over 128 (fixed per-step cost amortizes;
    # 512 regresses −7% on HBM pressure) — tools/bench_quant_step.py sweep
    batch = 256
    cfg = get_preset(
        "beit_base_patch16_224",
        use_shared_rel_pos_bias=True,
        drop_path_rate=0.1,
        init_values=0.1,
    )
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    hp = FinetuneHParams(num_classes=cfg.num_classes, num_patches=cfg.num_patches)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 10_000, warmup_steps=500)

    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, cfg.num_classes)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]
    tx = make_optimizer(
        params, lr, weight_decay=0.05, clip_grad=None, layer_decay=0.65,
        depth=cfg.depth,
    )
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    step = make_finetune_train_step(model, tx, hp, lr)
    rng = jax.random.PRNGKey(3)

    # warmup / compile. NOTE: jax.block_until_ready is a silent no-op under
    # the axon TPU platform — a host readback (float()) is the only reliable
    # synchronization, so all timings close with one.
    for _ in range(3):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = iters * batch / dt
    print(
        json.dumps(
            {
                "metric": "vit_b16_224_finetune_train_throughput",
                "value": round(img_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / A100_CLASS_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
