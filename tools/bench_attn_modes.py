"""Time the REAL fused attention kernel under the micro-mode flags.

tools/profile_attn_ablate.py times mirror kernels with pieces removed; this
times ops/flash_attention.fused_qkv_attention itself (fwd and fwd+bwd,
12-layer chained so nothing hoists) under the four combinations of
BOUNDED_SCORES × LSE_DTYPE, plus output parity of each mode against the
baseline. This is the measurement for VERDICT round-3 item 4 (harvest the
max-pass + lse-store headroom; floor 1.81 ms/layer fwd+bwd, full kernel
measured 2.19 → target ≤ 2.0).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_attn_modes.py
`--smoke` runs tiny shapes in the Pallas interpreter on CPU — a tool
self-test so a latent bug here can't waste a TPU window (timings are
meaningless in that mode; only the drift columns matter).
"""

import sys
import time

SMOKE = "--smoke" in sys.argv

if SMOKE:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
else:
    from uncertainty_vit_tpu.cli.common import setup_jax

    setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.ops import flash_attention as FA

if SMOKE:
    FA.INTERPRET = True
    B, N, C, H, LAYERS = 2, 17, 128, 2, 2  # D=64 so the kernel routes
else:
    B, N, C, H, LAYERS = 128, 197, 768, 12, 12
D = C // H
SCALE = D**-0.5


def build(grad: bool):
    seed = jnp.zeros((1,), jnp.int32)

    def chain(qkv, bias):
        h = qkv
        for _ in range(LAYERS):
            o = FA.fused_qkv_attention(h, bias, None, seed, SCALE, H, 0.0)
            h = jnp.concatenate([o, o, o], axis=-1)
        return h.astype(jnp.float32).mean()

    if grad:
        return jax.jit(jax.grad(chain, argnums=(0, 1)))
    return jax.jit(chain)


def bench(fn, args, iters=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N), jnp.float32) * 0.1

    modes = [
        ("baseline", False, jnp.float32),
        ("bounded", True, jnp.float32),
        ("bf16lse", False, jnp.bfloat16),
        ("bounded+bf16lse", True, jnp.bfloat16),
    ]
    ref_out = ref_g = None
    for name, bs, lse_dt in modes:
        FA.BOUNDED_SCORES, FA.LSE_DTYPE = bs, lse_dt
        fwd = build(grad=False)
        fb = build(grad=True)
        t_f = bench(fwd, (qkv, bias))
        t_fb = bench(fb, (qkv, bias))
        g = fb(qkv, bias)
        out = fwd(qkv, bias)
        if ref_g is None:
            ref_out, ref_g = out, g
            fdrift, drift = 0.0, (0.0, 0.0)
        else:
            # forward parity vs baseline (chained 12-layer mean): exact in
            # bounded mode, bit-identical in bf16lse (fwd never reads lse)
            fdrift = float(jnp.abs(out - ref_out) / jnp.abs(ref_out))
            d0 = float(jnp.max(jnp.abs(g[0].astype(jnp.float32) -
                                       ref_g[0].astype(jnp.float32))) /
                       jnp.max(jnp.abs(ref_g[0].astype(jnp.float32))))
            d1 = float(jnp.max(jnp.abs(g[1] - ref_g[1])) / jnp.max(jnp.abs(ref_g[1])))
            drift = (d0, d1)
        print(
            f"{name:16s} fwd {t_f*1e3:7.2f} ms ({t_f/LAYERS*1e3:5.3f}/layer)  "
            f"fwd+bwd {t_fb*1e3:7.2f} ms ({t_fb/LAYERS*1e3:5.3f}/layer)  "
            f"fwd-drift {fdrift:.5f}  "
            f"grad-drift dqkv {drift[0]:.4f} dbias {drift[1]:.4f}",
            flush=True,
        )
    FA.BOUNDED_SCORES, FA.LSE_DTYPE = False, jnp.float32


if __name__ == "__main__":
    main()
