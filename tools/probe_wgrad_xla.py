"""Probe: wgrad (dw = x^T @ g over M=B*N tokens) strategies on the chip.

The Pallas int8 wgrad kernel LOSES to bf16 (62-139 vs 102-156 T/s measured:
every extra output tile re-reads the other side's whole [M, .] tensor, and
the in-kernel quantize repeats per tile). This probes the alternative: int8
quantization as plain XLA passes, then a plain XLA int8 dot_general with
int32 accumulation. Scales are per-column (constant along the M
contraction), so they factor out of the sum exactly.

Chained so nothing hoists (see tools/profile_quant.py): every body consumes
the previous body's (x, g) pair and produces the next via two bf16 consumer
matmuls whose cost is measured separately and subtracted.

Ladder per shape:
  consumer-only        the two bf16 feed matmuls alone
  bf16                 + bf16 wgrad (the thing to beat)
  int8-cast            + int8 wgrad with raw .astype(int8) casts (upper
                       bound: what reusing kernel-emitted int8 copies buys)
  int8-quant           + full dynamic quantization (col-amax + scale + round
                       for BOTH sides) — the honest standalone-XLA cost

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_wgrad_xla.py
"""

import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

M = 128 * 197
SHAPES = {
    "qkv  (768x2304)": (768, 2304),
    "proj (768x768)": (768, 768),
    "fc1  (768x3072)": (768, 3072),
    "fc2  (3072x768)": (3072, 768),
}
REPS = 24


def bench(fn, args, label, flops_per_rep, iters=4, warm=1):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"  {label:18s} {dt*1e3:7.3f} ms/rep  {flops_per_rep/dt/1e12:6.1f} T/s",
          flush=True)
    return dt


def _consume(g_, dw, k, n):
    """Two bf16 matmuls turning ([M, n] grad, [k, n] dw) into the next
    (x [M, k], g [M, n]) pair; tanh bounds the chain."""
    a = jax.lax.dot_general(
        g_, dw, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    x_next = jnp.tanh(a).astype(jnp.bfloat16)
    g_next = jax.lax.dot_general(
        x_next, dw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    return x_next, g_next


def main():
    for name, (k, n) in SHAPES.items():
        print(f"{name}:", flush=True)
        fl = 2 * M * k * n
        x0 = jax.random.normal(jax.random.PRNGKey(0), (M, k), jnp.bfloat16)
        g0 = jax.random.normal(jax.random.PRNGKey(1), (M, n), jnp.bfloat16) * 0.1
        dw0 = jax.random.normal(jax.random.PRNGKey(2), (k, n), jnp.bfloat16) * 0.02

        @jax.jit
        def consumer_chain(x, g):
            def body(i, carry):
                x_, g_ = carry
                return _consume(g_, dw0, k, n)
            return jax.lax.fori_loop(0, REPS, body, (x, g))[1][0, 0]
        t_cons = bench(consumer_chain, (x0, g0), "consumer-only", 2 * fl)

        @jax.jit
        def bf16_chain(x, g):
            def body(i, carry):
                x_, g_ = carry
                dw = jax.lax.dot_general(
                    x_, g_, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16) * 0.001
                return _consume(g_, dw, k, n)
            return jax.lax.fori_loop(0, REPS, body, (x, g))[1][0, 0]
        t = bench(bf16_chain, (x0, g0), "bf16", 3 * fl)
        w = t - t_cons
        print(f"    -> wgrad alone   {w*1e3:7.3f} ms     {fl/w/1e12:6.1f} T/s", flush=True)

        @jax.jit
        def int8_cast_chain(x, g):
            def body(i, carry):
                x_, g_ = carry
                dw = jax.lax.dot_general(
                    (x_ * 8.0).astype(jnp.int8), (g_ * 64.0).astype(jnp.int8),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.bfloat16) * 1e-6
                return _consume(g_, dw, k, n)
            return jax.lax.fori_loop(0, REPS, body, (x, g))[1][0, 0]
        t = bench(int8_cast_chain, (x0, g0), "int8-cast", 3 * fl)
        w = t - t_cons
        print(f"    -> wgrad alone   {w*1e3:7.3f} ms     {fl/w/1e12:6.1f} T/s", flush=True)

        @jax.jit
        def int8_quant_chain(x, g):
            def body(i, carry):
                x_, g_ = carry
                sx = jnp.maximum(jnp.max(jnp.abs(x_.astype(jnp.float32)),
                                         axis=0, keepdims=True), 1e-30)
                sg = jnp.maximum(jnp.max(jnp.abs(g_.astype(jnp.float32)),
                                         axis=0, keepdims=True), 1e-30)
                xq = jnp.round(x_.astype(jnp.float32) * (127.0 / sx)).astype(jnp.int8)
                gq = jnp.round(g_.astype(jnp.float32) * (127.0 / sg)).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, gq, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                dw = (acc.astype(jnp.float32)
                      * (sx.reshape(k, 1) / 127.0) * (sg / 127.0)).astype(jnp.bfloat16)
                return _consume(g_, dw, k, n)
            return jax.lax.fori_loop(0, REPS, body, (x, g))[1][0, 0]
        t = bench(int8_quant_chain, (x0, g0), "int8-quant", 3 * fl)
        w = t - t_cons
        print(f"    -> wgrad alone   {w*1e3:7.3f} ms     {fl/w/1e12:6.1f} T/s", flush=True)


if __name__ == "__main__":
    main()
