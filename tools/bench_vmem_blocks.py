"""Measure the attention kernel under a raised Mosaic scoped-VMEM limit.

The batch-block heuristic (ops/flash_attention.py:_batch_block) targets
Mosaic's DEFAULT scoped-vmem limit (~16MiB): at ViT-B/224 that pins the
backward to bb=2 (bb=4 fails to compile at the default limit) and the
forward to bb=4. The forward's own bb=2→4 move measured +13% in round 2,
so the backward likely leaves similar per-program launch/DMA amortization
on the table. UVIT_ATTN_VMEM_BUDGET_MB raises the heuristic budget AND a
per-kernel pltpu.CompilerParams(vmem_limit_bytes=...) in lockstep (the
global --xla_tpu_scoped_vmem_limit_kib flag aborts the axon PJRT client:
"Unknown flag in XLA_FLAGS" — measured round 5). Both are read at TRACE
time, so one process can sweep all configs.

Times the 12-layer chained kernel (fwd and fwd+bwd) at the headline bench
batch (160) per config, with cross-config parity columns (bb is pure
tiling; only dbias f32 accumulation order may drift).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_vmem_blocks.py
`--smoke` self-tests the plumbing on CPU in the Pallas interpreter (tiny
shapes; timings meaningless, only bb/parity columns matter).
"""

import json
import os
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
    B, N, C, H, LAYERS, ITERS = 4, 17, 128, 2, 2, 1
elif "--vitb384" in sys.argv:
    # ViT-B/384 family shapes (N=577: head-group pinned to 2 at the default
    # budget; budget 30 admits group 6 — see _head_group)
    B, N, C, H, LAYERS, ITERS = 32, 577, 768, 12, 12, 8
elif "--vitl384" in sys.argv:
    # ViT-L/384 (N=577, 16 heads): default group 2 → budget 30 group 4
    B, N, C, H, LAYERS, ITERS = 16, 577, 1024, 16, 12, 8
else:
    # headline bench batch (bench.py: 160, the round-5 sweep optimum)
    B, N, C, H, LAYERS, ITERS = 160, 197, 768, 12, 12, 8
D = C // H
SCALE = D**-0.5

# (label, UVIT_ATTN_VMEM_BUDGET_MB or None for the 14.5 default)
CONFIGS = [
    ("default", None),
    ("budget30", "30"),
    ("budget56", "56"),
]


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


def bench(fn, *args):
    for _ in range(2):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    # measure pure env-budget configs: the automatic train-path raise
    # (TRAIN_PINNED_BUDGET_MB, added from this tool's own measurements)
    # would otherwise make the 'default' row raised at N=577
    FA.TRAIN_PINNED_BUDGET_MB = 0.0
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N), jnp.float32) * 0.1

    ref_out = ref_g = None
    for label, budget in CONFIGS:
        if budget is None:
            os.environ.pop("UVIT_ATTN_VMEM_BUDGET_MB", None)
        else:
            os.environ["UVIT_ATTN_VMEM_BUDGET_MB"] = budget
        group = FA._head_group(D, H, N)  # budget-dependent (N=577: 2 → 6)
        fwd_bb, bwd_bb = FA._fwd_bwd_blocks(B, N, group * D, group, 0.0)
        try:
            fwd = build(grad=False)
            fb = build(grad=True)
            t_f = bench(fwd, qkv, bias)
            t_fb = bench(fb, qkv, bias)
            out = float(fwd(qkv, bias))
            g = fb(qkv, bias)
        except Exception as e:  # compile failure at a too-big block
            print(json.dumps({"label": label, "fwd_bb": fwd_bb,
                              "bwd_bb": bwd_bb,
                              "error": str(e).splitlines()[:2]}), flush=True)
            continue
        if ref_g is None:
            ref_out, ref_g = out, g
            drift = (0.0, 0.0)
        else:
            d0 = float(jnp.max(jnp.abs(g[0].astype(jnp.float32) -
                                       ref_g[0].astype(jnp.float32))) /
                       jnp.max(jnp.abs(ref_g[0].astype(jnp.float32))))
            d1 = float(jnp.max(jnp.abs(g[1] - ref_g[1])) /
                       jnp.max(jnp.abs(ref_g[1])))
            drift = (d0, d1)
        print(
            json.dumps(
                {
                    "label": label,
                    "budget_mb": budget or "14.5",
                    "group": group,
                    "fwd_bb": fwd_bb,
                    "bwd_bb": bwd_bb,
                    "fwd_ms_layer": round(t_f / LAYERS * 1e3, 3),
                    "fwdbwd_ms_layer": round(t_fb / LAYERS * 1e3, 3),
                    "fwd_drift_vs_default": abs(out - ref_out) / max(abs(ref_out), 1e-30),
                    "dqkv_drift": drift[0],
                    "dbias_drift": drift[1],
                }
            ),
            flush=True,
        )
    os.environ.pop("UVIT_ATTN_VMEM_BUDGET_MB", None)


if __name__ == "__main__":
    main()
