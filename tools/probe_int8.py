"""Probe the int8 matmul ceiling: how much of the gap to the 394 T/s int8
peak is the in-kernel activation quantize, and what epilogue fusions cost.

Pallas calls are opaque to XLA, so a fori_loop whose input VARIES per
iteration (dynamic slice of a stacked input) cannot be hoisted, and an
accumulated y[0, 0] cannot be strength-reduced into the kernel. That makes
single-kernel rates measurable here, unlike XLA dots (see profile_quant.py).

Variants at the fc1 shape (M=25216, 768->3072), the step's biggest matmul:
  A bf16 in, in-kernel row-quantize, bf16 out   (= ops/quant._qmm today)
  B int8 in (pre-quantized), bf16 out           (pure-matmul ceiling)
  C int8 in, bf16 out + GELU epilogue           (epilogue cost)
  D int8 in, int8 out + row-requant epilogue    (quantized-dataflow steady state)
  E bf16 in, in-kernel quantize + bf16 out + GELU

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8.py
"""

import functools
import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uncertainty_vit_tpu.ops import quant as Q

M = 128 * 197
K, N = 768, 3072
R = 4       # distinct inputs cycled through the loop (defeats LICM)
REPS = 32
TM = 512


def _rowmax_inv(y):
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    return 127.0 / jnp.maximum(amax, 1e-30)


def kernel_b(x_ref, xs_ref, wq_ref, ws_ref, o_ref, *, gelu):
    acc = jax.lax.dot_general(
        x_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs_ref[...] * ws_ref[...]
    if gelu:
        y = jax.nn.gelu(y, approximate=True)
    o_ref[...] = y.astype(o_ref.dtype)


def kernel_d(x_ref, xs_ref, wq_ref, ws_ref, o_ref, os_ref):
    acc = jax.lax.dot_general(
        x_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs_ref[...] * ws_ref[...]
    inv = _rowmax_inv(y)
    o_ref[...] = jnp.round(y * inv).astype(jnp.int8)
    os_ref[...] = 1.0 / inv


def run_int8_in(xq, xs, wq, ws, out_dtype, gelu=False, requant=False):
    m, k = xq.shape
    n = wq.shape[1]
    in_specs = [
        pl.BlockSpec((TM, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if requant:
        return pl.pallas_call(
            kernel_d,
            grid=(m // TM,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((TM, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m, n), jnp.int8),
                jax.ShapeDtypeStruct((m, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k * n, bytes_accessed=m * k + k * n + m * n,
                transcendentals=0,
            ),
        )(xq, xs, wq, ws)
    return pl.pallas_call(
        functools.partial(kernel_b, gelu=gelu),
        grid=(m // TM,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TM, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=m * k + k * n + m * n * 2,
            transcendentals=0,
        ),
    )(xq, xs, wq, ws)


def bench(fn, args, label, iters=4, warm=1):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    fl = 2 * M * K * N
    print(f"  {label:44s} {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} T/s", flush=True)
    return dt


def main():
    seed = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(0)
    x_all = jax.random.normal(key, (R, M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (K, N), jnp.float32) * 0.03
    wq, ws = Q.quantize_cols(w)
    # pre-quantized inputs for the int8-in variants
    xf = x_all.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=2, keepdims=True)
    xs_all = jnp.maximum(amax, 1e-30) / 127.0
    xq_all = jnp.round(xf / xs_all).astype(jnp.int8)
    xs_all = xs_all.reshape(R, M, 1)

    @jax.jit
    def var_a(x_all, wq, ws):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(x_all, i % R, 0, keepdims=False)
            y = Q._qmm(x, wq, ws, None, seed, sr=False, out_dtype=jnp.bfloat16)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    bench(var_a, (x_all, wq, ws), "A bf16-in + in-kernel quantize -> bf16")

    @jax.jit
    def var_b(xq_all, xs_all, wq, ws):
        def body(i, acc):
            xq = jax.lax.dynamic_index_in_dim(xq_all, i % R, 0, keepdims=False)
            xs = jax.lax.dynamic_index_in_dim(xs_all, i % R, 0, keepdims=False)
            y = run_int8_in(xq, xs, wq, ws, jnp.bfloat16)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    bench(var_b, (xq_all, xs_all, wq, ws), "B int8-in (pure matmul) -> bf16")

    @jax.jit
    def var_c(xq_all, xs_all, wq, ws):
        def body(i, acc):
            xq = jax.lax.dynamic_index_in_dim(xq_all, i % R, 0, keepdims=False)
            xs = jax.lax.dynamic_index_in_dim(xs_all, i % R, 0, keepdims=False)
            y = run_int8_in(xq, xs, wq, ws, jnp.bfloat16, gelu=True)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    bench(var_c, (xq_all, xs_all, wq, ws), "C int8-in + GELU epilogue -> bf16")

    @jax.jit
    def var_d(xq_all, xs_all, wq, ws):
        def body(i, acc):
            xq = jax.lax.dynamic_index_in_dim(xq_all, i % R, 0, keepdims=False)
            xs = jax.lax.dynamic_index_in_dim(xs_all, i % R, 0, keepdims=False)
            yq, ysc = run_int8_in(xq, xs, wq, ws, None, requant=True)
            return acc + yq[0, 0].astype(jnp.float32) + ysc[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    bench(var_d, (xq_all, xs_all, wq, ws), "D int8-in + requant epilogue -> int8")

    print("  (bf16 XLA reference at this shape from profile_quant.py: "
          "~163 T/s)", flush=True)


if __name__ == "__main__":
    main()
