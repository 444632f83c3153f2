"""Fused TPU attention kernels (Pallas).

Profiling on v5e showed XLA's unfused attention spending ~3.6 ms/layer at
ViT-B batch 128 where the raw FLOPs are worth ~0.15 ms: the [B, H, N, N]
score tensor round-trips HBM and the qkv head split materializes three
transposed copies. These kernels remove both:

- inputs are the *fused* qkv activations [B, N, 3C] straight out of the qkv
  matmul — per-head q/k/v slabs are BlockSpec slices, so no transpose or
  reshape ever materializes;
- each program handles a (batch, head-group) tile — head groups of
  128/head_dim heads keep the lane dimension at the 128 the Mosaic tiling
  requires — computing scores + bias + exact softmax + optional attention
  dropout + PV entirely in VMEM;
- the backward is a second Pallas kernel (same layout) that recomputes
  probabilities, regenerates the identical dropout mask from the same
  per-(b,h) seed (pltpu.prng), and accumulates the rel-pos-bias gradient by
  revisiting its output block across the inner batch grid dimension;
- outputs write back as [B, N, C] head slices, feeding the projection matmul
  directly.

Replaces the reference attention data path (modeling_finetune.py:150-185).
Sequence lengths up to ~1k (ViT 224/384/512) fit one program's VMEM; exotic
probability variants and the correctness reference live in ops/attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Set True (tests) to run the kernels in the Pallas interpreter — gives the
# kernel code path CPU coverage where the suite runs.
INTERPRET = False
# VMEM budget per program for the bias block + live score/prob tiles; the
# chip has ~16MB of VMEM and Mosaic double-buffers blocks.
_VMEM_BUDGET = 6 * 1024 * 1024


def _group_candidates(num_heads: int, head_dim: int):
    return [
        g for g in range(num_heads, 0, -1)
        if num_heads % g == 0 and (g * head_dim) % _LANE == 0
    ]


def _group_bytes(g: int, head_dim: int, n: int) -> int:
    bias = g * n * n * 4
    qkv = 3 * n * g * head_dim * 2
    scores = 2 * n * n * 4  # scores + probs for one head live at a time
    return bias + qkv + scores


def _head_group(head_dim: int, num_heads: int, n: int) -> int:
    """Largest head group per program that keeps lanes 128-aligned and fits
    the VMEM budget (measured fastest: more heads per program amortizes
    per-program overhead — group=12 beat group=2 by 1.5× at ViT-B/224)."""
    for g in _group_candidates(num_heads, head_dim):
        if _group_bytes(g, head_dim, n) <= _VMEM_BUDGET:
            return g
    return 0


def kernel_supported(num_heads: int, head_dim: int, seq_len: int = 197) -> bool:
    return _head_group(head_dim, num_heads, seq_len) > 0


def _dropout_mask(shape, rate: float):
    """Regenerable in-kernel dropout keep-mask (scaled). Caller must have
    seeded pltpu.prng for the current program."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (2**32)), 2**32 - 1))
    keep = bits >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _scores_softmax_parts(q, k, bias, scale: float):
    """Batched [BB, N, D] q/k → (e [BB, N, N] f32 unnormalized, r [BB, N, 1]
    reciprocal row sums). probs = e · r, but the division is NEVER applied to
    the [N, N] tile — callers fold r into the [N, D]-shaped side instead
    (one full VPU pass over the padded score tile saved; the kernel is
    VPU-bound on softmax, not MXU-bound).

    q/k stay in the input dtype (bf16 on the hot path) — the MXU takes bf16
    inputs with f32 accumulation natively, while f32 inputs fall back to the
    slow multi-pass path. The softmax scale applies to the f32 scores
    (mathematically identical to scaling q). The leading BB dim batches
    several images through one program: ~8× less per-program launch/DMA
    overhead than one-image programs."""
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    return e, r


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale: float, dropout_rate: float, group: int, head_dim: int,
                num_groups: int):
    b_idx = pl.program_id(0)
    g_idx = pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b_idx * num_groups + g_idx)
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        bias = bias_ref[i].astype(jnp.float32) if bias_ref is not None else None
        e, r = _scores_softmax_parts(q, k, bias, scale)
        if dropout_rate > 0.0:
            e = e * _dropout_mask(e.shape, dropout_rate)
        # out = (probs_dropped @ v) = ((e·mask) @ v) · r — the row-recip
        # scales the [N, D] output instead of the [N, N] probs
        out = jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * r
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale: float, dropout_rate: float, group: int, head_dim: int,
                num_groups: int):
    # grid is (G, B): head-group outer, batch inner → dbias_ref revisits the
    # same block across b steps and accumulates in VMEM.
    g_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b_idx * num_groups + g_idx)

    @pl.when(b_idx == 0)
    def _():
        if dbias_ref is not None:
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        g = g_ref[:, :, sl]
        bias = bias_ref[i].astype(jnp.float32) if bias_ref is not None else None

        # Recompute the softmax parts; work with the UNNORMALIZED e and the
        # row reciprocal r, folding r into [N, D]-shaped operands wherever
        # possible (saves full [N, N] VPU passes; see _scores_softmax_parts).
        # With probs = e·r (r constant per row i) and e_d = e·mask:
        #   dv = probs_droppedᵀ g = e_dᵀ (g·r)
        #   dp_raw = g vᵀ;  dprobs·e = dp_raw·mask·e = dp_raw·e_d =: t
        #   c_i = Σ_j dprobs·probs = r_i · rowsum(t)
        #   ds  = probs·(dprobs − c) = (t − e·c) · r
        e, r = _scores_softmax_parts(q, k, bias, scale)
        if dropout_rate > 0.0:
            e_d = e * _dropout_mask(e.shape, dropout_rate)
        else:
            e_d = e

        g_r = (g.astype(jnp.float32) * r).astype(v.dtype)
        dv = jax.lax.dot_general(
            e_d.astype(g_r.dtype), g_r, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp_raw = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        t = dp_raw * e_d
        c = r * jnp.sum(t, axis=-1, keepdims=True)
        ds = (t - e * c) * r
        ds_c = ds.astype(q_ref.dtype)

        dq = jax.lax.dot_general(
            ds_c, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds_c, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale

        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        if dbias_ref is not None:
            dbias_ref[i] += jnp.sum(ds, axis=0)


def _qkv_specs(n: int, lanes: int, num_groups: int, bh_grid: bool, bb: int):
    """BlockSpecs slicing per-head-group q/k/v slabs of `bb` batch items from
    the fused [B, N, 3C] tensor. bh_grid=True → grid (B/bb, G); False →
    grid (G, B/bb)."""

    def idx(offset_groups):
        if bh_grid:
            return lambda b, g: (b, 0, offset_groups + g)
        return lambda g, b: (b, 0, offset_groups + g)

    shape = (bb, n, lanes)
    return [
        pl.BlockSpec(shape, idx(0), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, idx(num_groups), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, idx(2 * num_groups), memory_space=pltpu.VMEM),
    ]


def _batch_block(b: int, n: int, lanes: int, group: int, num_slabs: int,
                 live_scores: int, num_bias_blocks: int = 1) -> int:
    """Largest batch-block per program that fits VMEM. `num_slabs` counts the
    [bb, n, lanes] blocks that Mosaic double-buffers (qkv in + out for the
    forward; + grad in and dq/dk/dv out for the backward); `live_scores`
    counts concurrent [bb, n, n] f32 intermediates; `num_bias_blocks` the
    resident [group, n, n] f32 blocks (bias, + dbias in the backward).
    Batching several images per program amortizes the fixed launch +
    DMA-setup cost, which dominates at ViT shapes (compute is ~2 µs/program,
    overhead ~13 µs)."""
    bias_bytes = num_bias_blocks * group * n * n * 4
    for bb in (8, 4, 2, 1):
        if b % bb != 0:
            continue
        slabs = num_slabs * bb * n * lanes * 2 * 2  # ×2 double buffering
        scores = live_scores * bb * n * n * 4
        # 14MB: bb=4 forward at ViT-B (13.5MB estimated) compiles and runs
        # 13% faster than bb=2; the backward's 7-slab estimate keeps it at 2
        # (bb=4 backward fails to compile — measured, not margin)
        if bias_bytes + slabs + scores <= 14 * 1024 * 1024:
            return bb
    return 1


def _fwd_bwd_blocks(b: int, n: int, lanes: int, group: int, dropout_rate: float):
    """(fwd_bb, bwd_bb). With in-kernel dropout the backward REPLAYS the
    forward's prng sequence, so both kernels must agree on the batch-block
    (seed mapping and per-head mask shapes depend on it)."""
    fwd_bb = _batch_block(b, n, lanes, group, num_slabs=4, live_scores=3,
                          num_bias_blocks=1)
    bwd_bb = _batch_block(b, n, lanes, group, num_slabs=7, live_scores=4,
                          num_bias_blocks=2)
    if dropout_rate > 0.0:
        shared = min(fwd_bb, bwd_bb)
        return shared, shared
    return fwd_bb, bwd_bb


def _fwd_impl(qkv, bias, seed, scale, num_heads, dropout_rate):
    b, n, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // num_heads
    group = _head_group(head_dim, num_heads, n)
    assert group > 0, (num_heads, head_dim, n)
    num_groups = num_heads // group
    lanes = group * head_dim
    bb, _ = _fwd_bwd_blocks(b, n, lanes, group, dropout_rate)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += _qkv_specs(n, lanes, num_groups, bh_grid=True, bb=bb)
    args = [seed, qkv, qkv, qkv]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((group, n, n), lambda b_, g: (g, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = _fwd_kernel
    else:
        kernel = lambda s, q, k, v, o, **kw: _fwd_kernel(s, q, k, v, None, o, **kw)

    return pl.pallas_call(
        functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                          group=group, head_dim=head_dim, num_groups=num_groups),
        interpret=INTERPRET,
        grid=(b // bb, num_groups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, n, lanes), lambda b_, g: (b_, 0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * head_dim,
            bytes_accessed=2 * b * n * c3 * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(*args)


def _bwd_impl(qkv, bias, seed, g, scale, num_heads, dropout_rate):
    b, n, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // num_heads
    group = _head_group(head_dim, num_heads, n)
    assert group > 0, (num_heads, head_dim, n)
    num_groups = num_heads // group
    lanes = group * head_dim
    _, bb = _fwd_bwd_blocks(b, n, lanes, group, dropout_rate)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += _qkv_specs(n, lanes, num_groups, bh_grid=False, bb=bb)
    args = [seed, qkv, qkv, qkv]
    has_bias = bias is not None
    if has_bias:
        in_specs.append(
            pl.BlockSpec((group, n, n), lambda gg, b_: (gg, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    in_specs.append(
        pl.BlockSpec((bb, n, lanes), lambda gg, b_: (b_, 0, gg), memory_space=pltpu.VMEM)
    )
    args.append(g)

    grad_spec = pl.BlockSpec(
        (bb, n, lanes), lambda gg, b_: (b_, 0, gg), memory_space=pltpu.VMEM
    )
    out_specs = [grad_spec, grad_spec, grad_spec]
    out_shapes = [jax.ShapeDtypeStruct((b, n, c), qkv.dtype)] * 3
    if has_bias:
        out_specs.append(
            pl.BlockSpec((group, n, n), lambda gg, b_: (gg, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct(bias.shape, jnp.float32))
        kernel = _bwd_kernel
    else:
        kernel = lambda s, q, k, v, g_, dq, dk, dv, **kw: _bwd_kernel(
            s, q, k, v, None, g_, dq, dk, dv, None, **kw
        )

    outs = pl.pallas_call(
        functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                          group=group, head_dim=head_dim, num_groups=num_groups),
        interpret=INTERPRET,
        grid=(num_groups, b // bb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * n * n * head_dim,
            bytes_accessed=4 * b * n * c3 * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(*args)

    dq, dk, dv = outs[:3]
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    dbias = outs[3].astype(bias.dtype) if has_bias else None
    return dqkv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_qkv_attention(
    qkv: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    seed: jnp.ndarray,
    scale: float,
    num_heads: int,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Fused multi-head attention over packed qkv activations.

    qkv: [B, N, 3C] (q|k|v concatenated, heads interleaved as C = H·D);
    bias: [H, N, N] or None; seed: int32 [1] (ignored when dropout_rate=0).
    Returns [B, N, C] in qkv.dtype. Numerics match
    ops.attention.naive_attention(softmax); dropout masks are the kernel's
    own (pltpu prng), deterministic per (seed, batch, head).
    """
    return _fwd_impl(qkv, bias, seed, scale, num_heads, dropout_rate)


def _fused_fwd(qkv, bias, seed, scale, num_heads, dropout_rate):
    out = _fwd_impl(qkv, bias, seed, scale, num_heads, dropout_rate)
    return out, (qkv, bias, seed)


def _fused_bwd(scale, num_heads, dropout_rate, res, g):
    qkv, bias, seed = res
    dqkv, dbias = _bwd_impl(qkv, bias, seed, g, scale, num_heads, dropout_rate)
    return (dqkv, dbias, None)


fused_qkv_attention.defvjp(_fused_fwd, _fused_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
    block_q: int = 512,
) -> jnp.ndarray:
    """Compatibility wrapper over [B, H, N, D] inputs (repacks into the fused
    qkv layout; prefer fused_qkv_attention to avoid the transposes)."""
    del block_q
    b, h, n, d = q.shape
    to_flat = lambda t: jnp.moveaxis(t, 1, 2).reshape(b, n, h * d)
    qkv = jnp.concatenate([to_flat(q), to_flat(k), to_flat(v)], axis=-1)
    seed = jnp.zeros((1,), jnp.int32)
    out = fused_qkv_attention(qkv, bias, seed, scale, h, 0.0)
    return jnp.moveaxis(out.reshape(b, n, h, d), 2, 1)
