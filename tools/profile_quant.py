"""Decompose the int8 quantized-matmul cost per kernel on the real chip.

Measurement design: naive fori_loop benchmarks of a matmul are WRONG twice
over — if the body consumes y[0, 0], XLA strength-reduces slice-of-dot to
dot-of-slices (a physically impossible 587 T/s "bf16 baseline" was measured
that way), and if the loop input never changes, LICM hoists the matmul out
of the loop even through an optimization_barrier (496-790 T/s, also
measured). So every loop here CHAINS: the full output of iteration i is the
input of iteration i+1 (pairs of matmuls K->N->K, exactly the fc1->fc2 /
qkv->proj shape pattern), making hoisting and slicing both impossible.

wgrad has a [K, N] output that can't re-enter as [M, K] input directly, so
its chain is wgrad + a bf16 consumer matmul (g @ dw^T), and the reported
wgrad time subtracts the measured bf16 rate at that consumer shape.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_quant.py
"""

import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops import quant as Q

M = 128 * 197
PAIRS = {
    "qkv-ish (768<->2304)": (768, 2304),
    "proj-ish (768<->768)": (768, 768),
    "mlp-ish (768<->3072)": (768, 3072),
}
REPS = 32  # pairs per dispatch


def bench(fn, args, label, flops, iters=4, warm=1):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"  {label:22s} {dt*1e3:7.3f} ms/pair  {flops/dt/1e12:6.1f} T/s",
          flush=True)
    return dt


def main():
    seed = jnp.zeros((1,), jnp.int32)
    for name, (k, n) in PAIRS.items():
        print(f"{name}:", flush=True)
        fl = 2 * M * k * n * 2  # two matmuls per chained pair
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (M, k), jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), (M, n), jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(2), (k, n), jnp.float32) * 0.03
        w2 = jax.random.normal(jax.random.PRNGKey(3), (n, k), jnp.float32) * 0.03
        w1q, w1s = Q.quantize_cols(w1)
        w2q, w2s = Q.quantize_cols(w2)

        @jax.jit
        def bf16_pair(x, w1, w2):
            a, b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
            def body(i, x):
                # tanh keeps activations bounded so the chain can't overflow
                return jnp.tanh((x @ a) @ b)
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        t_bf16 = bench(bf16_pair, (x, w1, w2), "bf16 fwd pair", fl)

        @jax.jit
        def int8_pair(x, w1q, w1s, w2q, w2s):
            def body(i, x):
                y = Q._qmm(x, w1q, w1s, None, seed, sr=False, out_dtype=jnp.bfloat16)
                z = Q._qmm(y, w2q, w2s, None, seed, sr=False, out_dtype=jnp.bfloat16)
                return jnp.tanh(z)
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        bench(int8_pair, (x, w1q, w1s, w2q, w2s), "int8 fwd pair", fl)

        @jax.jit
        def int8_sr_pair(x, w1q, w1s, w2q, w2s):
            def body(i, x):
                y = Q._qmm(x, w1q, w1s, None, seed, sr=True, out_dtype=jnp.bfloat16)
                z = Q._qmm(y, w2q, w2s, None, seed, sr=True, out_dtype=jnp.bfloat16)
                return jnp.tanh(z)
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        bench(int8_sr_pair, (x, w1q, w1s, w2q, w2s), "int8 dgrad(SR) pair", fl)

        # wgrad chain: dw = x^T @ g (the kernel under test), then a bf16
        # consumer x' = tanh(g @ dw^T) re-enters the loop. Reported time
        # subtracts the bf16 consumer using the bf16-pair rate above.
        @jax.jit
        def wgrad_chain(x, g):
            def body(i, x):
                dw = Q._wgrad(x, g, seed)
                return jnp.tanh(jax.lax.dot_general(
                    g, dw.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                ))
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        t_chain = bench(wgrad_chain, (x, g), "wgrad+consumer chain", fl)
        t_wgrad = t_chain - t_bf16 / 2
        print(f"  {'-> int8 wgrad alone':22s} {t_wgrad*1e3:7.3f} ms      "
              f"{fl/2/t_wgrad/1e12:6.1f} T/s", flush=True)

        @jax.jit
        def bf16_wgrad_chain(x, g):
            def body(i, x):
                dw = jax.lax.dot_general(
                    x, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return jnp.tanh(jax.lax.dot_general(
                    g, dw.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                ))
            return jax.lax.fori_loop(0, REPS, body, x)[0, 0]
        t_bchain = bench(bf16_wgrad_chain, (x, g), "bf16 wgrad chain", fl)
        t_bwgrad = t_bchain - t_bf16 / 2
        print(f"  {'-> bf16 wgrad alone':22s} {t_bwgrad*1e3:7.3f} ms      "
              f"{fl/2/t_bwgrad/1e12:6.1f} T/s", flush=True)


if __name__ == "__main__":
    main()
