"""Decompose the transformer-trunk fwd+bwd cost on the real chip.

Chains 12 Blocks inside ONE jit (per-dispatch tunnel overhead otherwise
dominates and corrupts isolated timings — measured ~1.3 ms/dispatch and
output-transfer artifacts; see round-2 notes). Compares:

  - block chain grad  (full Block: LN + attn kernel + MLP + residuals)
  - attn-only chain grad (fused kernel alone)
  - matmul-only chain grad (the qkv/proj/fc1/fc2 stack alone)

block − attn − matmul ≈ the LN/residual/droppath/gelu "fat" the round-1
verdict asked to quantify. Run: PYTHONPATH=/root/.axon_site:/root/repo.
"""

import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.models.layers import Block

B, N, C, H, LAYERS = 128, 197, 768, 12, 12


def bench(fn, args, iters=10, warm=2, label=""):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt*1e3:8.2f} ms  ({dt/LAYERS*1e3:6.3f} ms/layer)")
    return dt


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N), jnp.float32)

    block = Block(dim=C, num_heads=H, drop_path_rate=0.1, init_values=0.1,
                  layer_id=1, dtype=jnp.bfloat16)
    params = block.init(
        {"params": jax.random.PRNGKey(2)}, x, bias, True
    )["params"]
    rngs = {"droppath": jax.random.PRNGKey(3)}

    def chain_loss(p, x_, b_):
        h = x_
        for _ in range(LAYERS):
            h, _ = block.apply({"params": p}, h, b_, False, rngs=rngs)
        return h.astype(jnp.float32).mean()

    g = jax.jit(jax.grad(chain_loss, argnums=(0, 1)))
    bench(g, (params, x, bias), label="block chain grad")

    # attention kernel alone
    from uncertainty_vit_tpu.ops.flash_attention import fused_qkv_attention

    seed = jnp.zeros((1,), jnp.int32)
    scale = (C // H) ** -0.5
    qkv = jax.random.normal(jax.random.PRNGKey(4), (B, N, 3 * C), jnp.bfloat16)

    def attn_loss(q, b_):
        h = q
        for _ in range(LAYERS):
            o = fused_qkv_attention(h, b_, None, seed, scale, H, 0.0)
            h = jnp.concatenate([o, o, o], axis=-1)
        return h.astype(jnp.float32).mean()

    ga = jax.jit(jax.grad(attn_loss, argnums=(0, 1)))
    bench(ga, (qkv, bias), label="attn chain grad")

    # matmul stack alone
    t = jax.random.normal(jax.random.PRNGKey(5), (B * N, C), jnp.bfloat16)
    ws = {
        "qkv": jax.random.normal(jax.random.PRNGKey(6), (C, 3 * C), jnp.bfloat16),
        "proj": jax.random.normal(jax.random.PRNGKey(7), (C, C), jnp.bfloat16),
        "fc1": jax.random.normal(jax.random.PRNGKey(8), (C, 4 * C), jnp.bfloat16),
        "fc2": jax.random.normal(jax.random.PRNGKey(9), (4 * C, C), jnp.bfloat16),
    }

    def mm_loss(w, x_):
        h = x_
        for _ in range(LAYERS):
            a = h @ w["qkv"]
            h = a[:, :C] @ w["proj"]
            f = jax.nn.gelu(h @ w["fc1"], approximate=True)
            h = f @ w["fc2"]
        return h.astype(jnp.float32).mean()

    gm = jax.jit(jax.grad(mm_loss, argnums=(0, 1)))
    bench(gm, (ws, t), label="matmul chain grad")


if __name__ == "__main__":
    main()
