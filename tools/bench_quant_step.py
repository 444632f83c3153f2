"""Measure the ViT-B/224 finetune train step with --quant int8 vs bf16 on
the real chip.

Usage: python tools/bench_quant_step.py [mode]
  none       bf16 baseline
  int8       Pallas kernels for fwd+dgrad+wgrad
  int8-fwd   Pallas int8 forward only, bf16 dgrad+wgrad
  int8-nowg  Pallas int8 forward+dgrad, bf16 wgrad
  int8-xla   XLA-native int8 for all three matmuls
  int8-xla-fwd / int8-xla-nowg   XLA int8 fwd only / fwd+dgrad only
"""

import sys
import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import get_preset
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.train import schedules
from uncertainty_vit_tpu.train.engine_finetune import (
    FinetuneHParams, init_finetune_state, make_finetune_train_step,
)
from uncertainty_vit_tpu.train.optim import make_optimizer


def main(quant="int8", batch=128):
    from uncertainty_vit_tpu.ops import quant as Q
    mode = quant
    if quant.endswith("-noseed"):
        # ablation: constant SR seeds — measures the 48-module
        # make_rng('quant') fold/threefry cost in the step
        import uncertainty_vit_tpu.models.layers as L

        L._quant_seed = lambda mod, det: jnp.zeros((1,), jnp.int32)
        quant = quant[: -len("-noseed")]
    if quant.endswith("-static"):
        # delayed-scaling SPEED bound: fixed per-tensor scales, no amax
        # pass (numerically uncalibrated — loss is not meaningful)
        Q.STATIC_SCALE = True
        quant = quant[: -len("-static")]
    impls = {
        "int8": ("pallas", "pallas", "pallas"),
        "int8-fwd": ("pallas", "bf16", "bf16"),
        "int8-nowg": ("pallas", "pallas", "bf16"),
        "int8-xla": ("xla", "xla", "xla"),
        "int8-xla-fwd": ("xla", "bf16", "bf16"),
        "int8-xla-nowg": ("xla", "xla", "bf16"),
    }
    if quant in impls:
        Q.FWD, Q.DGRAD, Q.WGRAD = impls[quant]
        quant = "int8"
    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     drop_path_rate=0.1, init_values=0.1, quant=quant)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    hp = FinetuneHParams(num_classes=cfg.num_classes, num_patches=cfg.num_patches)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 10_000, warmup_steps=500)
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, cfg.num_classes)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]
    tx = make_optimizer(params, lr, weight_decay=0.05, clip_grad=None,
                        layer_decay=0.65, depth=cfg.depth)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    step = make_finetune_train_step(model, tx, hp, lr)
    rng = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, images, labels, rng)
    print(f"[{mode}] warm {time.perf_counter()-t0:.1f}s "
          f"loss {float(metrics['loss']):.4f}", flush=True)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    ips = iters * batch / dt
    print(f"{mode}: {ips:.1f} img/s ({dt/iters*1e3:.1f} ms/step) "
          f"vs_baseline {ips/850:.3f}", flush=True)
    return ips


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "int8",
         batch=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
