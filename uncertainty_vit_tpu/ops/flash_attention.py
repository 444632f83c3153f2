"""Fused TPU attention kernels (Pallas).

Profiling on v5e showed XLA's unfused attention spending ~3.6 ms/layer at
ViT-B batch 128 where the raw FLOPs are worth ~0.15 ms: the [B, H, N, N]
score tensor round-trips HBM and the qkv head split materializes three
transposed copies. These kernels remove both:

- inputs are the *fused* qkv activations [B, N, 3C] straight out of the qkv
  matmul — per-head q/k/v slabs are BlockSpec slices, so no transpose or
  reshape ever materializes. The reference's q/v bias add (torch cat of
  q_bias|zeros|v_bias, modeling_finetune.py:146-151) happens IN-kernel on the
  VMEM slabs, saving a full [B, N, 3C] HBM round trip per layer;
- each program handles a (batch-block, head-group) tile — head groups of
  128/head_dim heads keep the lane dimension at the 128 the Mosaic tiling
  requires — computing scores + bias + exact softmax + optional attention
  dropout + PV entirely in VMEM;
- the forward also emits the per-row softmax log-sum-exp ([B, N, H]), so the
  backward reconstructs probabilities as exp(scores − lse) in ONE VPU pass —
  no max or row-sum recompute (the standard flash-attention residual);
- the backward is a second Pallas kernel (same layout) that regenerates the
  identical dropout mask from the same per-(b,h) seed (pltpu.prng) and
  accumulates the rel-pos-bias gradient by revisiting its output block across
  the inner batch grid dimension;
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


def _scores(q, k, bias, scale: float):
    """Batched [BB, N, D] q/k → raw f32 scores [BB, N, N] (scaled, biased).

    q/k stay in the input dtype (bf16 on the hot path) — the MXU takes bf16
    inputs with f32 accumulation natively, while f32 inputs fall back to the
    slow multi-pass path. The softmax scale applies to the f32 scores
    (mathematically identical to scaling q). The leading BB dim batches
    several images through one program: ~8× less per-program launch/DMA
    overhead than one-image programs."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias[None]
    return s


def _qv_biased(qkv_slab, qvb_row, sl):
    """Add the per-head-group q/v bias slice to a VMEM slab (bf16 add, same
    numerics as the reference's out-of-kernel qkv + cat(q_bias,0,v_bias))."""
    return qkv_slab + qvb_row[sl].astype(qkv_slab.dtype)[None, None, :]


def _fwd_kernel(refs, *, scale: float, dropout_rate: float, group: int,
                head_dim: int, num_groups: int, has_bias: bool, has_qvb: bool,
                want_lse: bool):
    it = iter(refs)
    seed_ref = next(it)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    qvb_ref = next(it) if has_qvb else None
    o_ref = next(it)
    lse_ref = next(it) if want_lse else None

    b_idx = pl.program_id(0)
    g_idx = pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b_idx * num_groups + g_idx)
    qvb = qvb_ref[...] if has_qvb else None
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        if has_qvb:
            q = _qv_biased(q, qvb[0], sl)
            v = _qv_biased(v, qvb[2], sl)
        bias = bias_ref[i].astype(jnp.float32) if has_bias else None
        s = _scores(q, k, bias, scale)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        if want_lse:
            # softmax log-sum-exp for the backward: probs = exp(s − lse).
            # Single-lane store per head (a lane-dim concat of the per-head
            # columns measured ~0.5 ms/layer of relayout; this doesn't).
            lse_ref[:, :, i:i + 1] = m - jnp.log(r)
        if dropout_rate > 0.0:
            e = e * _dropout_mask(e.shape, dropout_rate)
        # out = (probs_dropped @ v) = ((e·mask) @ v) · r — the row-recip
        # scales the [N, D] output instead of the [N, N] probs
        out = jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * r
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _bwd_kernel(refs, *, scale: float, dropout_rate: float, group: int,
                head_dim: int, num_groups: int, has_bias: bool, has_qvb: bool):
    # grid is (G, B): head-group outer, batch inner → dbias_ref revisits the
    # same block across b steps and accumulates in VMEM.
    it = iter(refs)
    seed_ref = next(it)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    qvb_ref = next(it) if has_qvb else None
    lse_ref, g_ref = next(it), next(it)
    dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
    dbias_ref = next(it) if has_bias else None

    g_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b_idx * num_groups + g_idx)

    @pl.when(b_idx == 0)
    def _():
        if has_bias:
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    qvb = qvb_ref[...] if has_qvb else None
    lse_all = lse_ref[...]
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        if has_qvb:
            q = _qv_biased(q, qvb[0], sl)
            v = _qv_biased(v, qvb[2], sl)
        g = g_ref[:, :, sl]
        bias = bias_ref[i].astype(jnp.float32) if has_bias else None

        # Normalized probabilities straight from the saved log-sum-exp —
        # one exp pass, no max/row-sum recompute. With p_d = p·mask:
        #   dv = p_dᵀ g
        #   dp_raw = g vᵀ;  t = dp_raw·p_d  (= dprobs·p)
        #   c = rowsum(t);  ds = t − p·c    (softmax vjp)
        s = _scores(q, k, bias, scale)
        p = jnp.exp(s - lse_all[:, :, i:i + 1])
        if dropout_rate > 0.0:
            p_d = p * _dropout_mask(p.shape, dropout_rate)
        else:
            p_d = p

        dv = jax.lax.dot_general(
            p_d.astype(g.dtype), g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp_raw = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        t = dp_raw * p_d
        c = jnp.sum(t, axis=-1, keepdims=True)
        ds = t - p * c
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
        if has_bias:
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


def _lse_bytes(bb: int, n: int, group: int) -> int:
    # [bb, n, group] f32, lanes padded to 128, double-buffered
    return 2 * bb * n * max(group, _LANE) * 4


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
        # 14.5MB: bb=4 forward at ViT-B (13.5MB slab/score estimate + the
        # 0.8MB lse block) compiles and runs 13% faster than bb=2; the
        # backward's 7-slab estimate keeps it at 2 (bb=4 backward fails to
        # compile — measured, not margin)
        if bias_bytes + slabs + scores + _lse_bytes(bb, n, group) <= int(14.5 * 1024 * 1024):
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


def _fwd_impl(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate,
              want_lse: bool = True):
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
    if qv_bias is not None:
        in_specs.append(
            pl.BlockSpec((3, lanes), lambda b_, g: (0, g), memory_space=pltpu.VMEM)
        )
        args.append(qv_bias)

    kernel = functools.partial(
        lambda *refs, **kw: _fwd_kernel(refs, **kw),
        scale=scale, dropout_rate=dropout_rate, group=group,
        head_dim=head_dim, num_groups=num_groups,
        has_bias=bias is not None, has_qvb=qv_bias is not None,
        want_lse=want_lse,
    )
    out_specs = [
        pl.BlockSpec((bb, n, lanes), lambda b_, g: (b_, 0, g), memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((b, n, c), qkv.dtype)]
    if want_lse:
        out_specs.append(
            pl.BlockSpec((bb, n, group), lambda b_, g: (b_, 0, g), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((b, n, num_heads), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(b // bb, num_groups),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * head_dim,
            bytes_accessed=2 * b * n * c3 * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(*args)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


def _bwd_impl(qkv, bias, qv_bias, seed, lse, g, scale, num_heads, dropout_rate):
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
    if qv_bias is not None:
        in_specs.append(
            pl.BlockSpec((3, lanes), lambda gg, b_: (0, gg), memory_space=pltpu.VMEM)
        )
        args.append(qv_bias)
    in_specs.append(
        pl.BlockSpec((bb, n, group), lambda gg, b_: (b_, 0, gg), memory_space=pltpu.VMEM)
    )
    args.append(lse)
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

    kernel = functools.partial(
        lambda *refs, **kw: _bwd_kernel(refs, **kw),
        scale=scale, dropout_rate=dropout_rate, group=group,
        head_dim=head_dim, num_groups=num_groups,
        has_bias=has_bias, has_qvb=qv_bias is not None,
    )
    outs = pl.pallas_call(
        kernel,
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
    if qv_bias is None:
        dqvb = None
    else:
        # d(q/v bias) = per-section reduction of dqkv over (batch, tokens);
        # the k row is structurally unused by the caller (zero key bias).
        dqvb = dqkv.reshape(b, n, 3, c).astype(jnp.float32).sum(axis=(0, 1))
        dqvb = dqvb.astype(qv_bias.dtype)
    return dqkv, dbias, dqvb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_qkv_attention(
    qkv: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    qv_bias: Optional[jnp.ndarray],
    seed: jnp.ndarray,
    scale: float,
    num_heads: int,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Fused multi-head attention over packed qkv activations.

    qkv: [B, N, 3C] (q|k|v concatenated, heads interleaved as C = H·D);
    bias: [H, N, N] or None; qv_bias: [3, C] f32 (rows = q|k|v bias, the k row
    zero per the reference's no-key-bias rule, modeling_finetune.py:146-151)
    added to the q/v slabs in-kernel, or None; seed: int32 [1] (ignored when
    dropout_rate=0). Returns [B, N, C] in qkv.dtype. Numerics match
    ops.attention.naive_attention(softmax); dropout masks are the kernel's
    own (pltpu prng), deterministic per (seed, batch, head).
    """
    out, _ = _fwd_impl(
        qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate, want_lse=False
    )
    return out


def _fused_fwd(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate):
    out, lse = _fwd_impl(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate)
    return out, (qkv, bias, qv_bias, seed, lse)


def _fused_bwd(scale, num_heads, dropout_rate, res, g):
    qkv, bias, qv_bias, seed, lse = res
    dqkv, dbias, dqvb = _bwd_impl(
        qkv, bias, qv_bias, seed, lse, g, scale, num_heads, dropout_rate
    )
    return (dqkv, dbias, dqvb, None)


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
    out = fused_qkv_attention(qkv, bias, None, seed, scale, h, 0.0)
    return jnp.moveaxis(out.reshape(b, n, h, d), 2, 1)
