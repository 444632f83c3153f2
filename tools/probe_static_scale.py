"""Probe: does DELAYED/static scaling rescue XLA-native int8?

Dynamic per-row quantization costs ~3 HBM passes per matmul (amax reduce →
scale+round → dot reads); the full-step benches showed that overhead beats
the int8 MXU saving. Transformer-Engine-style delayed scaling replaces the
amax reduce with a per-tensor scale carried from the previous step, making
quantization ONE fused pass. This measures the chained-pair rate of that
arithmetic (scale is a traced scalar, update of the running amax is NOT
included — i.e. the optimistic bound for a delayed-scaling deployment).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_static_scale.py
"""

import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

M = 128 * 197
PAIRS = {
    "qkv-ish (768<->2304)": (768, 2304),
    "proj-ish (768<->768)": (768, 768),
    "mlp-ish (768<->3072)": (768, 3072),
}
REPS = 32


def bench(fn, args, label, flops, iters=4, warm=1):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"  {label:24s} {dt*1e3:7.3f} ms/pair  {flops/dt/1e12:6.1f} T/s",
          flush=True)
    return dt


def main():
    for name, (k, n) in PAIRS.items():
        print(f"{name}:", flush=True)
        fl = 2 * M * k * n * 2
        x = jax.random.normal(jax.random.PRNGKey(0), (M, k), jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(2), (k, n), jnp.float32) * 0.03
        w2 = jax.random.normal(jax.random.PRNGKey(3), (n, k), jnp.float32) * 0.03

        def qcols(w):
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-30) / 127.0
            return jnp.round(w / s).astype(jnp.int8), s

        w1q, w1s = qcols(w1)
        w2q, w2s = qcols(w2)

        @jax.jit
        def bf16_pair(x, w1, w2):
            a, b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
            def body(i, x):
                return jnp.tanh((x @ a) @ b)
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        bench(bf16_pair, (x, w1, w2), "bf16", fl)

        @jax.jit
        def dyn_pair(x, w1q, w1s, w2q, w2s):
            def body(i, x):
                def one(t, wq, ws):
                    a = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=1,
                                keepdims=True)
                    inv = 127.0 / jnp.maximum(a, 1e-30)
                    tq = jnp.round(t.astype(jnp.float32) * inv).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        tq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return (acc.astype(jnp.float32) * (a / 127.0) * ws
                            ).astype(jnp.bfloat16)
                return jnp.tanh(one(one(x, w1q, w1s), w2q, w2s))
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        bench(dyn_pair, (x, w1q, w1s, w2q, w2s), "xla dynamic (row amax)", fl)

        @jax.jit
        def static_pair(x, w1q, w1s, w2q, w2s, sx):
            # sx: per-tensor scale from "the previous step" — traced scalar
            def body(i, x):
                def one(t, wq, ws, s):
                    tq = jnp.round(t.astype(jnp.float32) * (127.0 / s)
                                   ).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        tq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return (acc.astype(jnp.float32) * (s / 127.0) * ws
                            ).astype(jnp.bfloat16)
                return jnp.tanh(one(one(x, w1q, w1s, sx), w2q, w2s, sx))
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        sx = jnp.float32(4.0)
        bench(static_pair, (x, w1q, w1s, w2q, w2s, sx),
              "xla static (per-tensor)", fl)


if __name__ == "__main__":
    main()
