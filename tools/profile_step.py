"""Decompose the ViT-B/16 224 finetune step time on the real chip.

Times: deterministic fwd, train-mode fwd, value_and_grad, full train step,
and isolated attention fwd/bwd kernels — to locate the non-matmul overhead
(PARITY.md: matmul floor ~54 ms/step vs ~115 ms measured in round 1).

All timings close with a host readback (jax.block_until_ready is a no-op
under the axon plugin). Run with PYTHONPATH=/root/.axon_site:/root/repo.
"""

import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.core.config import get_preset
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.train import schedules
from uncertainty_vit_tpu.train.engine_finetune import (
    FinetuneHParams, init_finetune_state, make_finetune_train_step,
)
from uncertainty_vit_tpu.train.optim import make_optimizer

BATCH = 128


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timeit(fn, *args, iters=20, warmup=3, label=""):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    t = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:22s} {t:8.2f} ms  ({BATCH/t*1e3:7.1f} img/s)")
    return t


def main():
    cfg = get_preset(
        "beit_base_patch16_224", use_shared_rel_pos_bias=True,
        drop_path_rate=0.1, init_values=0.1,
    )
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (BATCH,), 0, cfg.num_classes)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]

    rngs = {"dropout": jax.random.PRNGKey(5), "droppath": jax.random.PRNGKey(6)}

    fwd_det = jax.jit(lambda p, x: model.apply({"params": p}, x, deterministic=True))
    timeit(fwd_det, params, images, label="fwd deterministic")
    timeit(fwd_det, params, images, label="fwd deterministic #2")

    fwd_train = jax.jit(
        lambda p, x: model.apply({"params": p}, x, deterministic=False, rngs=rngs)
    )
    timeit(fwd_train, params, images, label="fwd train-mode")

    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, x, deterministic=False, rngs=rngs)
        one_hot = jax.nn.one_hot(y, cfg.num_classes)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1))

    vg = jax.jit(jax.value_and_grad(loss_fn))
    timeit(vg, params, images, labels, label="value_and_grad")

    hp = FinetuneHParams(num_classes=cfg.num_classes, num_patches=cfg.num_patches)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 10_000, warmup_steps=500)
    tx = make_optimizer(params, lr, weight_decay=0.05, clip_grad=None,
                        layer_decay=0.65, depth=cfg.depth)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    step = make_finetune_train_step(model, tx, hp, lr)
    rng = jax.random.PRNGKey(3)

    # donated state: thread it through the loop like the real driver
    for _ in range(3):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    t = (time.perf_counter() - t0) / iters * 1e3
    print(f"{'full train step':22s} {t:8.2f} ms  ({BATCH/t*1e3:7.1f} img/s)")

    # isolated attention kernels at ViT-B shapes
    from uncertainty_vit_tpu.ops.flash_attention import fused_qkv_attention

    n, c, h = 197, 768, 12
    qkv = jax.random.normal(jax.random.PRNGKey(7), (BATCH, n, 3 * c), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(8), (h, n, n), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    scale = (c // h) ** -0.5

    att = jax.jit(lambda q: fused_qkv_attention(q, bias, None, seed, scale, h, 0.0))
    t = timeit(att, qkv, label="attn fwd kernel")
    print(f"    ×12 layers = {12*t:6.1f} ms")

    def att_loss(q, b_):
        return fused_qkv_attention(q, b_, None, seed, scale, h, 0.0).astype(jnp.float32).sum()

    att_g = jax.jit(jax.grad(att_loss, argnums=(0, 1)))
    t = timeit(att_g, qkv, bias, label="attn fwd+bwd")
    print(f"    ×12 layers = {12*t:6.1f} ms")

    # matmul floor: the big matmuls of one block, fwd+bwd
    x = jax.random.normal(jax.random.PRNGKey(9), (BATCH * n, c), jnp.bfloat16)
    w_qkv = jax.random.normal(jax.random.PRNGKey(10), (c, 3 * c), jnp.bfloat16)
    w_proj = jax.random.normal(jax.random.PRNGKey(11), (c, c), jnp.bfloat16)
    w_fc1 = jax.random.normal(jax.random.PRNGKey(12), (c, 4 * c), jnp.bfloat16)
    w_fc2 = jax.random.normal(jax.random.PRNGKey(13), (4 * c, c), jnp.bfloat16)

    def block_matmuls(x, wq, wp, w1, w2):
        a = x @ wq
        b_ = a[:, :c] @ wp
        f = x @ w1
        g = jax.nn.gelu(f) @ w2
        return (b_ + g).astype(jnp.float32).sum()

    mm = jax.jit(jax.grad(block_matmuls, argnums=(0, 1, 2, 3, 4)))
    t = timeit(mm, x, w_qkv, w_proj, w_fc1, w_fc2, label="block matmuls f/b")
    print(f"    ×12 layers = {12*t:6.1f} ms")


if __name__ == "__main__":
    main()
