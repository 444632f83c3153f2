"""Probe 2: XLA-native int8 dot vs Pallas tile plans, fc1 shape.

Pair-chained (output feeds next input through a requantize) so XLA cannot
hoist or strength-reduce — see profile_quant.py for why naive loops lie.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8b.py
"""

import functools
import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 128 * 197
K, N = 768, 3072
REPS = 32
FL = 2 * M * K * N * 2  # two matmuls per chained pair


def bench(fn, args, label, iters=4, warm=1):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"  {label:40s} {dt*1e3:7.3f} ms/pair  {FL/dt/1e12:6.1f} T/s",
          flush=True)
    return dt


def quant_rows_xla(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    return jnp.round(x / s).astype(jnp.int8), s


def mm_kernel(x_ref, xs_ref, wq_ref, ws_ref, o_ref, os_ref, *, requant):
    acc = jax.lax.dot_general(
        x_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs_ref[...] * ws_ref[...]
    y = jnp.tanh(y)
    if requant:
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        inv = 127.0 / jnp.maximum(amax, 1e-30)
        o_ref[...] = jnp.round(y * inv).astype(jnp.int8)
        os_ref[...] = 1.0 / inv
    else:
        o_ref[...] = y.astype(jnp.bfloat16)
        os_ref[...] = jnp.ones_like(os_ref)


def pallas_mm(xq, xs, wq, ws, tm, tn, requant=True):
    m, k = xq.shape
    n = wq.shape[1]
    grid = (m // tm,) if tn == n else (m // tm, n // tn)
    if tn == n:
        ix = lambda i: (i, 0)
        iw = lambda i: (0, 0)
        iws = lambda i: (0, 0)
        io = lambda i: (i, 0)
        ios = lambda i: (i, 0)
    else:
        ix = lambda i, j: (i, 0)
        iw = lambda i, j: (0, j)
        iws = lambda i, j: (0, j)
        io = lambda i, j: (i, j)
        ios = lambda i, j: (i, 0)
    out_dt = jnp.int8 if requant else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(mm_kernel, requant=requant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), iw, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), iws, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), ios, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), out_dt),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=m * k + k * n + m * n,
            transcendentals=0,
        ),
    )(xq, xs, wq, ws)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(2), (K, N), jnp.float32) * 0.03
    w2 = jax.random.normal(jax.random.PRNGKey(3), (N, K), jnp.float32) * 0.03

    def qc(w):
        amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
        return jnp.round(w / s).astype(jnp.int8), s

    w1q, w1s = qc(w1)
    w2q, w2s = qc(w2)
    xq, xs = quant_rows_xla(x)

    # --- XLA-native int8 dot, quant/dequant as XLA epilogues ---
    @jax.jit
    def xla_int8_pair(xq, xs, w1q, w1s, w2q, w2s):
        def body(i, carry):
            xq, xs = carry
            acc = jax.lax.dot_general(
                xq, w1q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = jnp.tanh(acc.astype(jnp.float32) * xs * w1s)
            yq, ys = quant_rows_xla(y)
            acc2 = jax.lax.dot_general(
                yq, w2q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            z = jnp.tanh(acc2.astype(jnp.float32) * ys * w2s)
            return quant_rows_xla(z)
        out = jax.lax.fori_loop(0, REPS, body, (xq, xs))
        return out[0][0, 0].astype(jnp.float32)
    bench(xla_int8_pair, (xq, xs, w1q, w1s, w2q, w2s), "XLA int8 dot + XLA requant")

    # --- Pallas, tile-plan variants (requant epilogue, steady state) ---
    for tm, tn in ((512, N), (256, N), (1024, N), (512, 1536), (512, 1024),
                   (1024, 1536), (2048, 768)):
        tn2 = K if tn == N else min(tn, K)
        @jax.jit
        def pallas_pair(xq, xs, w1q, w1s, w2q, w2s, tm=tm, tn=tn, tn2=tn2):
            def body(i, carry):
                xq, xs = carry
                yq, ys = pallas_mm(xq, xs, w1q, w1s, tm, tn)
                zq, zs = pallas_mm(yq, ys, w2q, w2s, tm, tn2)
                return zq, zs
            out = jax.lax.fori_loop(0, REPS, body, (xq, xs))
            return out[0][0, 0].astype(jnp.float32)
        try:
            bench(pallas_pair, (xq, xs, w1q, w1s, w2q, w2s),
                  f"Pallas int8+requant tm={tm} tn={tn}")
        except Exception as e:
            print(f"  Pallas tm={tm} tn={tn}: FAIL {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
