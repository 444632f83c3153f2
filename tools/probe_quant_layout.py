"""Test the layout-copy hypothesis for the int8 composed-forward regression.

dump_quant_hlo.py showed XLA assigns the [B, N, C] activations the
{2,0,1} layout (batch minor); its own dots read that natively but every
Pallas call requires standard {2,1,0}, so each boundary pays a ~0.4 ms
relayout copy (estimated_cycles 432620 at [128,197,768]).

This times an LN -> int8 fc1 -> gelu -> int8 fc2 -> residual chain with the
activations kept 3-D [B, N, C] (model's current shape) vs flattened 2-D
[B*N, C], and counts relayout copies in the optimized HLO for both.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_quant_layout.py
"""

import re
import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.ops import quant as Q

B, N, C, H = 128, 197, 768, 3072
LAYERS = 12
seed = jnp.zeros((1,), jnp.int32)


def ln(x):
    m = x.astype(jnp.float32).mean(-1, keepdims=True)
    v = jnp.square(x.astype(jnp.float32) - m).mean(-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-6)).astype(x.dtype)


def make(three_d: bool, quant: bool):
    w1 = jax.random.normal(jax.random.PRNGKey(2), (C, H), jnp.float32) * 0.03
    w2 = jax.random.normal(jax.random.PRNGKey(3), (H, C), jnp.float32) * 0.03

    def chain(x):
        for _ in range(LAYERS):
            h = ln(x)
            if quant:
                y = Q.int8_dense(h, w1, None, seed)
                z = jax.nn.gelu(y, approximate=True)
                o = Q.int8_dense(z, w2, None, seed)
            else:
                y = h @ w1.astype(x.dtype)
                z = jax.nn.gelu(y, approximate=True)
                o = z @ w2.astype(x.dtype)
            x = x + o
        return x

    shape = (B, N, C) if three_d else (B * N, C)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    return jax.jit(chain), x


def run(label, three_d, quant):
    fn, x = make(three_d, quant)
    txt = fn.lower(x).compile().as_text()
    copies = 0
    for line in txt.splitlines():
        m = re.search(r"= (bf16|f32)\[([\d,]+)\][^ ]* copy\(", line)
        if m:
            dims = [int(d) for d in m.group(2).split(",")]
            if np.prod(dims) >= 1_000_000:
                copies += 1
    for _ in range(2):
        out = fn(x)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(x)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / 10
    print(f"{label:28s} {dt*1e3:8.2f} ms/chain   big copies: {copies}",
          flush=True)


if __name__ == "__main__":
    run("bf16 3d", True, False)
    run("bf16 2d", False, False)
    run("int8 3d", True, True)
    run("int8 2d", False, True)
