"""Int8 quantized matmuls for the ViT trunk (AQT-style dynamic quantization).

The v5e MXU runs int8×int8→int32 at ~2× its bf16 rate (measured on this
chip: 342 vs 182 TFLOP/s on the trunk's [25216, 768/3072] shapes). XLA's
own quantize/dequantize epilogues eat most of that win (230 T/s measured —
each quantization is ~3 extra VPU/HBM passes over the activations), so the
hot path here is a Pallas kernel that quantizes the activation tile in VMEM
immediately before the MXU and dequantizes in the epilogue: measured
286 T/s-equivalent end-to-end, 1.57× over the bf16 matmul floor.

Scheme (per jax.lax.dot_general rule: scales must be constant along the
contraction dimension):
  forward   y = x @ w          x per-row scales,     w per-col scales
  dgrad    dx = g @ wᵀ         g per-row scales,     w per-ROW scales
                               (a second int8 copy of w, scales over N)
  wgrad    dw = xᵀ @ g         x per-COL scales,     g per-col scales
                               (global column abs-max, one cheap XLA pass;
                               the scales factor out of the token sum, so
                               the kernel accumulates raw int32 products)
Gradients are quantized with STOCHASTIC rounding (per-program pltpu prng)
so the wgrad/dgrad estimators stay unbiased — plain round-to-nearest
systematically zeroes small gradient components. Activations/weights use
round-to-nearest.

This replaces the reference's fp16 GradScaler training arithmetic
(utils.py:364-390) with the TPU-native low-precision recipe; no reference
counterpart exists (DeepSpeed fp16 was the reference's fastest mode,
run_class_finetuning.py:583-594).

Weights stay f32 master copies; quantization happens per step inside the
jitted train step (the [K, N] weight pass is negligible next to the [M, K]
activation pass the kernel absorbs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to exercise the kernels in the Pallas interpreter on CPU.
INTERPRET = False

# Trace-time implementation switches per training matmul (ablations via
# tools/bench_quant_step.py). "pallas": the VMEM-quantizing kernels below;
# "xla": plain XLA quantize passes + int8 dot_general — slower per matmul
# (230 vs 286 T/s measured) but keeps the whole step in ONE XLA fusion
# graph, which the step-level ablations showed matters more: every
# XLA↔Pallas boundary strands LN/gelu/residual glue in standalone HBM
# passes and blocks cross-op scheduling (int8-fwd Pallas measured +7 ms on
# the full step despite −8.5 ms of per-kernel wins); "bf16": exact matmul.
FWD = "pallas"
DGRAD = "pallas"
WGRAD = "pallas"
# Speed-probe switch: fixed per-tensor activation/grad scales in the XLA
# impl (no amax pass) — see _quantize_rows_xla.
STATIC_SCALE = False

_TM = 512  # rows per program; 512 measured fastest (1024 exceeds VMEM)


# The wgrad kernel accumulates raw int8 products in int32; the worst-case
# bound |sum| <= 127*127*M stays below 2^31 only for M <= 133_152. Cap at
# the power of two below it (ViT-B/224 at batch 256 is M=50_432; a 384-input
# batch-256 finetune would be M≈148k and must fall back to bf16).
_MAX_M_INT32_ACC = 131_072


def supported(m: int, k: int, n: int) -> bool:
    """Kernel constraints: lane dims must be 128-aligned; tiny trunks are
    not worth quantizing (and the MXU needs the big tiles to win); M is
    bounded so the wgrad int32 accumulator guarantee holds."""
    return k % 128 == 0 and n % 128 == 0 and 8 <= m <= _MAX_M_INT32_ACC


def _tm(m: int) -> int:
    return min(_TM, -(-m // 8) * 8)


def quantize_cols(w: jnp.ndarray):
    """Per-output-column symmetric int8 quantization of a [K, N] matrix
    (XLA; the weight pass is tiny next to the activation pass)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    wq = jnp.round(wf / scale).astype(jnp.int8)
    return wq, scale


def _sr_uniform(shape):
    """[0,1) uniforms from the per-core prng. Mosaic cannot cast uint32→f32;
    keep the top 24 bits, bitcast to int32 (positive), then int32→f32."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top.astype(jnp.float32) * (1.0 / (1 << 24))


def _sr_uniform_interp(shape, seed):
    """Interpreter fallback: pltpu.prng_* has no CPU lowering, so tests use
    a counter-based integer hash (xxhash-style avalanche) over the tile's
    (row, col) indices. Statistical quality is ample for SR unbiasedness."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    x = (r * jnp.uint32(0x9E3779B1) + c * jnp.uint32(0x85EBCA77)
         + seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D) + jnp.uint32(1))
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> jnp.uint32(12))) * jnp.uint32(0x297A2D39)
    x = x ^ (x >> jnp.uint32(15))
    return (x >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))


def _quantize_rows_tile(xf, sr: bool, interp: bool, seed):
    """Quantize a [TM, K] f32 tile per-row. Returns (xq int8, row_scale f32)."""
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    inv = 127.0 / jnp.maximum(amax, 1e-30)
    if sr:
        u = _sr_uniform_interp(xf.shape, seed) if interp else _sr_uniform(xf.shape)
        xq = jnp.floor(xf * inv + u).astype(jnp.int8)
    else:
        xq = jnp.round(xf * inv).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def _fwd_kernel(seed_ref, x_ref, wq_ref, ws_ref, b_ref, o_ref, *, sr, has_bias,
                interp):
    seed = seed_ref[0] + pl.program_id(0)
    if sr and not interp:
        pltpu.prng_seed(seed)
    xq, sa = _quantize_rows_tile(x_ref[...].astype(jnp.float32), sr, interp, seed)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sa * ws_ref[...]
    if has_bias:
        y = y + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _qmm(x2d, wq, ws, bias, seed, sr: bool, out_dtype):
    """y[M, N] = dequant(quant_rows(x) @ wq) (+ bias). One Pallas pass:
    the activation tile is quantized in VMEM right before the MXU."""
    m, k = x2d.shape
    n = wq.shape[1]
    tm = _tm(m)
    has_bias = bias is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [seed, x2d, wq, ws]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, n).astype(jnp.float32))
    else:
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, n), jnp.float32))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, sr=sr, has_bias=has_bias,
                          interp=INTERPRET),
        interpret=INTERPRET,
        grid=(-(-m // tm),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0,
        ),
    )(*args)


# Mosaic double-buffers even the revisited [tk, tn] int32 accumulator, so
# its single-copy size must stay well under half of VMEM (a 7.08MB qkv
# block OOM'd at 16.45/16MB — measured).
_WGRAD_OUT_LIMIT = 4_500_000


def _split(dim: int, other: int) -> int:
    for cand in (dim, dim // 2, dim // 3, dim // 4, dim // 6, dim // 8,
                 dim // 12, dim // 16, dim // 24):
        if cand and dim % cand == 0 and cand % 128 == 0 \
                and other * cand * 4 <= _WGRAD_OUT_LIMIT:
            return cand
    return 128 if dim % 128 == 0 else dim


def _wgrad_plan(m, k, n):
    """(tm, tk, tn) for the wgrad kernel; at most ONE of k/n is tiled.

    Every extra tile of one dim re-reads the OTHER side's whole [M, ·]
    tensor (an early fine-grained n-tiling plan cost ~18 ms/step of pure
    re-read traffic at ViT-B batch 128), so: no tiling when the int32
    accumulator fits, else tile the LARGER dim — the re-read tensor is then
    the narrower one."""
    tk, tn = k, n
    if k * n * 4 > _WGRAD_OUT_LIMIT:
        if n >= k:
            tn = _split(n, k)
        else:
            tk = _split(k, n)
    budget = 15_000_000 - 2 * tk * tn * 4
    tm = _tm(m)
    while tm > 8 and 2 * tm * (tk + tn) * 2 > budget:
        tm //= 2
    return max(tm, 8), tk, tn


def _wgrad_kernel(seed_ref, x_ref, g_ref, invx_ref, invg_ref, o_ref, *,
                  m_total, tm, interp):
    # grid (n_tiles, m_tiles): m innermost → the [k, tn] output block is
    # revisited across m steps and accumulates in VMEM
    j, i = pl.program_id(0), pl.program_id(1)
    seed = seed_ref[0] + i * pl.num_programs(0) + j
    if not interp:
        pltpu.prng_seed(seed)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    xf = x_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    if m_total % tm != 0:
        # ragged last tile: OOB rows are garbage and feed the token-sum —
        # zero them (quantized zeros contribute nothing)
        rows = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        valid = rows < m_total
        xf = jnp.where(valid, xf, 0.0)
        gf = jnp.where(valid, gf, 0.0)
    # scales are per-COLUMN (constant along the token contraction), so they
    # factor out of the sum entirely — accumulate raw int32 products.
    # |sum| <= 127*127*M = 4.1e8 at M=25216 < 2^31.
    xq = jnp.round(xf * invx_ref[...]).astype(jnp.int8)
    u = _sr_uniform_interp(gf.shape, seed) if interp else _sr_uniform(gf.shape)
    gq = jnp.floor(gf * invg_ref[...] + u).astype(jnp.int8)
    o_ref[...] += jax.lax.dot_general(
        xq, gq, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )


def _wgrad(x2d, g2d, seed):
    """dw[K, N] = xᵀ @ g with per-column int8 quantization (global column
    abs-max; SR on the gradient side). Returns f32."""
    m, k = x2d.shape
    n = g2d.shape[1]
    tm, tk, tn = _wgrad_plan(m, k, n)
    k_tiled = tk != k
    xf = x2d.astype(jnp.float32)
    gf = g2d.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=0, keepdims=True), 1e-30) * (1.0 / 127.0)
    sg = jnp.maximum(jnp.max(jnp.abs(gf), axis=0, keepdims=True), 1e-30) * (1.0 / 127.0)
    acc = pl.pallas_call(
        functools.partial(_wgrad_kernel, m_total=m, tm=tm, interp=INTERPRET),
        interpret=INTERPRET,
        grid=((k // tk) * (n // tn), -(-m // tm)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tk), lambda j, i: (i, j if tk != k else 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda j, i: (i, j if tn != n else 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda j, i: (0, j if tk != k else 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j if tn != n else 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tk, tn),
            (lambda j, i: (j, 0)) if k_tiled else (lambda j, i: (0, j)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + m * n * 2 + k * n * 4,
            transcendentals=0,
        ),
    )(seed, x2d, g2d, 1.0 / sx, 1.0 / sg)
    return acc.astype(jnp.float32) * sx.reshape(k, 1) * sg


def _quantize_rows_xla(t2d, sr: bool, seed):
    """Per-row symmetric int8 quantization as plain XLA ops (fuses with the
    surrounding graph). Returns (int8 matrix, [M, 1] f32 scales).

    STATIC_SCALE replaces the per-row amax reduce with a fixed per-tensor
    scale — the arithmetic a TE-style delayed-scaling deployment would run
    (scale carried from the previous step). SPEED-PROBE ONLY: the constant
    here is not calibrated, so losses/grads are numerically wrong; it
    exists to measure the composed-step bound of delayed scaling without
    the quant_stats state threading (tools/bench_quant_step.py
    int8-xla-static*)."""
    tf = t2d.astype(jnp.float32)
    if STATIC_SCALE:
        amax = jnp.full((1, 1), 4.0, jnp.float32)
    else:
        amax = jnp.max(jnp.abs(tf), axis=1, keepdims=True)
    inv = 127.0 / jnp.maximum(amax, 1e-30)
    if sr:
        u = _sr_uniform_interp(t2d.shape, seed)
        tq = jnp.floor(tf * inv + u).astype(jnp.int8)
    else:
        tq = jnp.round(tf * inv).astype(jnp.int8)
    return tq, amax * (1.0 / 127.0)


def _xla_fwd_mm(x2d, w, bias, out_dtype):
    """y = dequant(quant_rows(x) @ quant_cols(w)) (+bias), all XLA."""
    xq, sx = _quantize_rows_xla(x2d, False, None)
    wq, ws = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * sx * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _xla_dgrad_mm(g2d, w, seed, out_dtype):
    """dx = dequant(quant_rows_sr(g) @ quant_rows(w)ᵀ): contraction over N,
    g per-row scales (SR — unbiased) and w per-K-row scales both constant
    along it."""
    gq, sg = _quantize_rows_xla(g2d, True, seed)
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    ws = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    wq = jnp.round(wf / ws).astype(jnp.int8)
    acc = jax.lax.dot_general(
        gq, wq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sg * ws.reshape(1, -1)).astype(out_dtype)


def _xla_wgrad_mm(x2d, g2d, seed):
    """dw[K, N] = dequant(quant_cols(x)ᵀ @ quant_cols_sr(g)): contraction
    over M, per-column scales on both sides constant along it."""
    xf = x2d.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=0, keepdims=True), 1e-30) * (1.0 / 127.0)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    gf = g2d.astype(jnp.float32)
    sg = jnp.maximum(jnp.max(jnp.abs(gf), axis=0, keepdims=True), 1e-30) * (1.0 / 127.0)
    u = _sr_uniform_interp(g2d.shape, seed)
    gq = jnp.floor(gf / sg + u).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, gq, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sx.reshape(-1, 1) * sg


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_dense(x: jnp.ndarray, w: jnp.ndarray, bias: Optional[jnp.ndarray],
               seed: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w (+ bias) with all three training matmuls (fwd, dgrad,
    wgrad) running int8 on the MXU.

    x: [..., K] (bf16/f32); w: [K, N] f32 master weights; bias: [N] or None;
    seed: int32 [1] for the gradient stochastic rounding. Gradients flow to
    x, w, and bias; seed gets none.
    """
    return _int8_fwd(x, w, bias, seed)[0]


def _int8_fwd(x, w, bias, seed):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    if FWD == "xla":
        y = _xla_fwd_mm(x2d, w, bias, x.dtype)
    elif FWD == "pallas":
        wq, ws = quantize_cols(w)
        y = _qmm(x2d, wq, ws, bias, seed, sr=False, out_dtype=x.dtype)
    else:  # bf16 ablation
        y = jax.lax.dot_general(
            x2d, w.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(x.dtype)
    return y.reshape(shape[:-1] + (w.shape[1],)), (x2d, w, seed, shape,
                                                   bias is not None)


def _int8_bwd(res, g):
    x2d, w, seed, shape, has_bias = res
    n = w.shape[1]
    g2d = g.reshape(-1, n)
    if DGRAD == "xla":
        dx2d = _xla_dgrad_mm(g2d, w, seed, g.dtype)
    elif DGRAD == "pallas":
        # dgrad: dx = g @ wᵀ — second int8 copy of w with scales over N
        # (constant along the new contraction dim), SR on g
        wtq, wts = quantize_cols(w.T)
        dx2d = _qmm(g2d, wtq, wts, None, seed, sr=True, out_dtype=g.dtype)
    else:
        dx2d = jax.lax.dot_general(
            g2d, w.astype(g.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(g.dtype)
    if WGRAD == "xla":
        dw = _xla_wgrad_mm(x2d, g2d, seed + 1)
    elif WGRAD == "pallas":
        dw = _wgrad(x2d, g2d, seed + 1)
    else:
        dw = jax.lax.dot_general(
            x2d, g2d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    db = g2d.astype(jnp.float32).sum(axis=0) if has_bias else None
    return dx2d.reshape(shape), dw.astype(w.dtype), db, None


int8_dense.defvjp(lambda x, w, b, s: _int8_fwd(x, w, b, s),
                  _int8_bwd)
