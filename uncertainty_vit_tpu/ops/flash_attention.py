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

import contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Set True (tests) to run the kernels in the Pallas interpreter — gives the
# kernel code path CPU coverage where the suite runs.
INTERPRET = False
# Trace-time switch: when True, model code must route attention through the
# XLA (naive) implementation instead of these kernels. Pallas calls have no
# JVP rule, so any forward-mode AD over a program containing them fails at
# trace time (AssertionError in _pallas_call_jvp_rule). AdaHessian's
# Hutchinson pass is forward-over-reverse (train/optim.py
# hutchinson_hessian_diag); it flips this around its jax.jvp so the Hessian
# sub-graph stages the differentiable-path attention while the step's own
# gradient keeps the fused kernel. Read at TRACE time, like INTERPRET.
FORWARD_AD_ONLY = False


@contextlib.contextmanager
def forward_ad_safe():
    """Trace-time context: route attention through the XLA path (kernels
    disabled) so the enclosed program supports jax.jvp/jax.linearize."""
    global FORWARD_AD_ONLY
    prev = FORWARD_AD_ONLY
    FORWARD_AD_ONLY = True
    try:
        yield
    finally:
        FORWARD_AD_ONLY = prev
# Micro-headroom knobs (round-3 fwd ablation ladder,
# tools/profile_attn_ablate.py: max pass 0.08 + lse store 0.07 ms/layer).
# Both are read at TRACE time — set before building the jitted step.
#
# BOUNDED_SCORES skips the forward max pass: softmax(s) = exp(s)/Σexp(s) is
# the same value whenever exp(s) doesn't overflow f32 (|s| ≲ 88). Scores are
# scale·q·k + bias; safe for trained ViTs at these shapes (|s| ≲ 40
# observed), NOT safe for arbitrary inputs — hence opt-in.
BOUNDED_SCORES = False
# LSE_DTYPE = jnp.bfloat16 halves the lse store (fwd) and read (bwd)
# bandwidth. The backward rebuilds p = exp(s − lse), so a quantized lse
# scales each probability ROW by exp(δ), |δ| ≤ lse·2⁻⁹ (bf16 half-ULP) —
# ≤~2% per-row grad scale at typical lse ≈ 3–10 (tests gate at 2%).
# Opt-in for the same reason.
LSE_DTYPE = jnp.float32
# VMEM budget per program for the bias block + live score/prob tiles; the
# chip has ~16MB of VMEM and Mosaic double-buffers blocks.
_VMEM_BUDGET = 6 * 1024 * 1024
# TRAIN-path budget (MB) used automatically at shapes where the default
# budget pins the head group (N=577 presets) — see _train_raise for the
# round-5 measurements. 0/None disables the automatic raise; the
# UVIT_ATTN_VMEM_BUDGET_MB env override takes precedence over both. Read
# at TRACE time, like BOUNDED_SCORES/LSE_DTYPE above.
TRAIN_PINNED_BUDGET_MB = 30.0


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


def _head_group(head_dim: int, num_heads: int, n: int,
                raised: bool = False) -> int:
    """Largest head group per program that keeps lanes 128-aligned and fits
    the VMEM budget (measured fastest: more heads per program amortizes
    per-program overhead — group=12 beat group=2 by 1.5× at ViT-B/224).

    The budget scales with the effective block budget (default 6MB at the
    default 14.5MB block budget, i.e. ×6/14.5): at N=577 (the 384-res
    presets) the default pins group=2, while the raised train-path budget
    (see _train_raise) admits group=6 (B/384) / group=4 (L/384) — the same
    per-program amortization the 224 shapes already enjoy."""
    budget = max(_VMEM_BUDGET, int(_block_budget_bytes(raised) * (6.0 / 14.5)))
    for g in _group_candidates(num_heads, head_dim):
        if _group_bytes(g, head_dim, n) <= budget:
            return g
    return 0


def _train_raise(head_dim: int, num_heads: int, n: int) -> bool:
    """True when the TRAIN path (want_lse forward + backward) should use
    TRAIN_PINNED_BUDGET_MB: the default 6MB budget pins the head group
    below what the raised budget admits, and no env override is present.

    Round-5 on-chip measurements (measurements/r5/vmem_blocks.log): at
    N=577 this is fwd+bwd −5.7% (ViT-B/384, group 2→6) and −2.3%
    (ViT-L/384, group 2→4, bwd bb 1→2) with exact dqkv parity (dbias
    ≤4e-7, f32 accumulation order), +2.4% on the vit_b16_384_train family
    number. The same raise measured ~1.7% SLOWER on the eval-only forward
    (no lse store / no backward), so eval keeps the default. 224 shapes
    are unaffected (group already maxed at the default budget); N=1025
    takes the streaming route and never consults this."""
    if os.environ.get("UVIT_ATTN_VMEM_BUDGET_MB", ""):
        return False  # explicit override applies to train AND eval
    if not TRAIN_PINNED_BUDGET_MB:
        return False
    return _head_group(head_dim, num_heads, n, raised=True) > _head_group(
        head_dim, num_heads, n
    )


def kernel_supported(num_heads: int, head_dim: int, seq_len: int = 197) -> bool:
    """True when a Pallas path exists: the VMEM-resident fused kernel (N up
    to ~600) or the q-tiled streaming kernel (ViT-L/512 N=1025 and up)."""
    return _route(num_heads, head_dim, seq_len) is not None


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
        if BOUNDED_SCORES:
            e = jnp.exp(s)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            lse = None
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            lse = m
        if want_lse:
            # softmax log-sum-exp for the backward: probs = exp(s − lse).
            # Single-lane store per head (a lane-dim concat of the per-head
            # columns measured ~0.5 ms/layer of relayout; this doesn't).
            # 4-D [B, G, N, group] layout: the block must be FULL in its
            # last dim — Mosaic rejects a partial non-128 last dim, which
            # [B, N, H] blocks hit whenever group < num_heads (N=577).
            # Both modes store log Σexp(s): m + log Σexp(s−m) ≡ −log r.
            lse = -jnp.log(r) if lse is None else lse - jnp.log(r)
            lse_ref[:, 0, :, i:i + 1] = lse.astype(lse_ref.dtype)
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
                head_dim: int, num_groups: int, has_bias: bool, has_qvb: bool,
                single_out: bool = False):
    # grid is (G, B): head-group outer, batch inner → dbias_ref revisits the
    # same block across b steps and accumulates in VMEM.
    it = iter(refs)
    seed_ref = next(it)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    qvb_ref = next(it) if has_qvb else None
    lse_ref, g_ref = next(it), next(it)
    if single_out:
        # one packed [bb, n, 3C] block — dq|dk|dv written at column offsets,
        # so the caller never pays the [B, N, 3C] concatenate pass
        # (~0.28 ms/layer of pure HBM copy at ViT-B/224 batch 128). Only
        # valid when the head group spans all heads (num_groups == 1).
        dq_ref = dk_ref = dv_ref = next(it)
        lanes = group * head_dim
        k_off, v_off = lanes, 2 * lanes
    else:
        dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
        k_off = v_off = 0
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
        p = jnp.exp(s - lse_all[:, 0, :, i:i + 1].astype(jnp.float32))
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
        dk_ref[:, :, slice(k_off + sl.start, k_off + sl.stop)] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, slice(v_off + sl.start, v_off + sl.stop)] = dv.astype(dv_ref.dtype)
        if has_bias:
            dbias_ref[i] += jnp.sum(ds, axis=0)


def _reduce_qv_bias_grad(dqkv, b, n, c, dtype):
    """d(q/v bias) = per-section reduction of dqkv over (batch, tokens).
    The k row is ZEROED: the forward never adds a key bias
    (modeling_finetune.py:146-151), so its true cotangent is 0 — a
    sum-of-dk row would feed spurious gradient to a parameter with no
    forward effect."""
    dqvb = dqkv.reshape(b, n, 3, c).astype(jnp.float32).sum(axis=(0, 1))
    dqvb = dqvb * jnp.asarray([1.0, 0.0, 1.0])[:, None]
    return dqvb.astype(dtype)


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


def _block_budget_bytes(raised: bool = False) -> int:
    """Mosaic scoped-VMEM working budget for the batch-block heuristic.

    The 14.5MB default targets Mosaic's default scoped-vmem limit (~16MiB):
    bb=4 forward at ViT-B (13.5MB slab/score estimate + the 0.8MB lse block)
    compiles and runs 13% faster than bb=2, while the backward's 7-slab
    estimate keeps it at 2 (bb=4 backward fails to COMPILE at the default
    limit — measured, not margin). UVIT_ATTN_VMEM_BUDGET_MB overrides the
    budget for BOTH train and eval paths (paired with the per-kernel
    vmem_limit_bytes in _compiler_params); without an override, the train
    path at pinned-head-group shapes uses TRAIN_PINNED_BUDGET_MB (see
    _train_raise). Read at TRACE time, like the micro-mode flags above."""
    env = os.environ.get("UVIT_ATTN_VMEM_BUDGET_MB", "")
    if env:
        try:
            return int(float(env) * 1024 * 1024)
        except ValueError:
            pass
    if raised and TRAIN_PINNED_BUDGET_MB:
        return int(TRAIN_PINNED_BUDGET_MB * 1024 * 1024)
    return int(14.5 * 1024 * 1024)


def _compiler_params(raised: bool = False):
    """Per-kernel Mosaic scoped-VMEM limit matching the heuristic budget.

    Mosaic's default scoped-vmem limit is ~16MiB; when the budget rises
    past the 14.5MB default, the kernels must carry a matching
    vmem_limit_bytes or Mosaic rejects the bigger blocks at compile time.
    The 9/8 headroom mirrors the 16MiB-limit / 14.5MB-budget ratio the
    default config is tuned to. The global --xla_tpu_scoped_vmem_limit_kib
    flag is NOT usable here: the axon PJRT client aborts on unknown
    XLA_FLAGS (measured, round 5), and the per-kernel param is the
    TPU-native scoping anyway."""
    budget = _block_budget_bytes(raised)
    if budget <= int(14.5 * 1024 * 1024):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(budget * 9 // 8))


def _batch_block(b: int, n: int, lanes: int, group: int, num_slabs: int,
                 live_scores: int, num_bias_blocks: int = 1,
                 raised: bool = False) -> int:
    """Largest batch-block per program that fits VMEM. `num_slabs` counts the
    [bb, n, lanes] blocks that Mosaic double-buffers (qkv in + out for the
    forward; + grad in and dq/dk/dv out for the backward); `live_scores`
    counts concurrent [bb, n, n] f32 intermediates; `num_bias_blocks` the
    resident [group, n, n] f32 blocks (bias, + dbias in the backward).
    Batching several images per program amortizes the fixed launch +
    DMA-setup cost, which dominates at ViT shapes (compute is ~2 µs/program,
    overhead ~13 µs)."""
    bias_bytes = num_bias_blocks * group * n * n * 4
    budget = _block_budget_bytes(raised)
    for bb in (16, 8, 4, 2, 1):
        if b % bb != 0:
            continue
        slabs = num_slabs * bb * n * lanes * 2 * 2  # ×2 double buffering
        scores = live_scores * bb * n * n * 4
        if bias_bytes + slabs + scores + _lse_bytes(bb, n, group) <= budget:
            return bb
    return 1


def _fwd_bwd_blocks(b: int, n: int, lanes: int, group: int, dropout_rate: float,
                    raised: bool = False):
    """(fwd_bb, bwd_bb). With in-kernel dropout the backward REPLAYS the
    forward's prng sequence, so both kernels must agree on the batch-block
    (seed mapping and per-head mask shapes depend on it)."""
    fwd_bb = _batch_block(b, n, lanes, group, num_slabs=4, live_scores=3,
                          num_bias_blocks=1, raised=raised)
    bwd_bb = _batch_block(b, n, lanes, group, num_slabs=7, live_scores=4,
                          num_bias_blocks=2, raised=raised)
    if dropout_rate > 0.0:
        shared = min(fwd_bb, bwd_bb)
        return shared, shared
    return fwd_bb, bwd_bb


def _fwd_impl(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate,
              want_lse: bool = True):
    b, n, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // num_heads
    # the train forward (want_lse: paired with a backward) may use the
    # raised budget; the eval forward keeps the default (measured slower
    # raised — see _train_raise). Backward pairing stays consistent:
    # _bwd_impl recomputes the same raised flag.
    raised = want_lse and _train_raise(head_dim, num_heads, n)
    group = _head_group(head_dim, num_heads, n, raised=raised)
    assert group > 0, (num_heads, head_dim, n)
    num_groups = num_heads // group
    lanes = group * head_dim
    bb, _ = _fwd_bwd_blocks(b, n, lanes, group, dropout_rate, raised=raised)

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
            pl.BlockSpec(
                (bb, 1, n, group), lambda b_, g: (b_, g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((b, num_groups, n, group), LSE_DTYPE)
        )
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
        compiler_params=_compiler_params(raised),
    )(*args)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


def _bwd_impl(qkv, bias, qv_bias, seed, lse, g, scale, num_heads, dropout_rate):
    b, n, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // num_heads
    # the backward only exists on the train path: mirror the train
    # forward's raised flag so group/bb (and the lse layout) line up
    raised = _train_raise(head_dim, num_heads, n)
    group = _head_group(head_dim, num_heads, n, raised=raised)
    assert group > 0, (num_heads, head_dim, n)
    num_groups = num_heads // group
    lanes = group * head_dim
    _, bb = _fwd_bwd_blocks(b, n, lanes, group, dropout_rate, raised=raised)

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
        pl.BlockSpec(
            (bb, 1, n, group), lambda gg, b_: (b_, gg, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    args.append(lse)
    in_specs.append(
        pl.BlockSpec((bb, n, lanes), lambda gg, b_: (b_, 0, gg), memory_space=pltpu.VMEM)
    )
    args.append(g)

    single_out = num_groups == 1
    if single_out:
        out_specs = [
            pl.BlockSpec(
                (bb, n, 3 * c), lambda gg, b_: (b_, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        out_shapes = [jax.ShapeDtypeStruct((b, n, 3 * c), qkv.dtype)]
    else:
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
        single_out=single_out,
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
        compiler_params=_compiler_params(raised),
    )(*args)

    if single_out:
        dqkv = outs[0]
        dbias = outs[1].astype(bias.dtype) if has_bias else None
    else:
        dq, dk, dv = outs[:3]
        dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
        dbias = outs[3].astype(bias.dtype) if has_bias else None
    dqvb = None if qv_bias is None else _reduce_qv_bias_grad(
        dqkv, b, n, c, qv_bias.dtype
    )
    return dqkv, dbias, dqvb


# ---------------------------------------------------------------------------
# q-tiled streaming kernels (big N: ViT-L/512 → N=1025 and beyond)
# ---------------------------------------------------------------------------
#
# When the full [N, N] score tile no longer fits VMEM, queries are tiled and
# keys/values stay VMEM-resident for a whole head group (k+v for a 2-head
# group at N=1025 is ~0.5 MB — tiny). Each q-tile then computes an EXACT
# full-row softmax against all keys in one shot, so no running-max/rescale
# stream is needed (the part of "flash attention" that exists to handle
# k-tiling, which this regime doesn't require).
#
# The backward splits into two kernels because its two accumulations run
# over different grid dimensions:
#   - dq + dbias:  grid (G, QT, B) — dbias revisits its (g, qt) block across
#     the innermost batch steps (same trick as the fused kernel);
#   - dk + dv:     grid (G, B, QT) — dk/dv revisit their (b, g) block across
#     the innermost q-tile steps, accumulating in f32 outputs.
# Each recomputes the probability tile from the saved lse (one exp pass), so
# the score matmul runs twice in the backward — ~3% of the step's MXU time
# at these shapes, far cheaper than staging [B, H, N, N] through HBM.

# Tests flip this to exercise the streaming path at interpreter-friendly
# sizes (the fused path otherwise wins the route for any N that fits VMEM).
_FORCE_STREAM = False


def _q_tile(n: int, cap: int) -> int:
    """Query-tile rows: n itself when it fits (block dim == array dim is
    always Mosaic-legal), else the smallest tile count ≤ cap rounded up to
    the sublane quantum of 8 (Mosaic requires tiled dims % 8 == 0). The tile
    grid is ceil(n / tq); the ragged last tile relies on masked OOB stores
    plus explicit row masking where values feed accumulations (dk/dv)."""
    if n <= cap:
        return n
    tiles = -(-n // cap)
    return -(-(-(-n // tiles)) // 8) * 8


# Tile caps tried largest-first; tests shrink this to force multi-tile grids
# at interpreter-friendly sizes.
_STREAM_CAPS = (512, 256, 128, 64, 32)


def _stream_plan(head_dim: int, num_heads: int, n: int):
    """(head_group, q_tile) for the streaming kernels, or None. Chosen
    jointly: the largest tile whose worst kernel (bwd-dq: bias + dbias
    blocks + live score tiles + VMEM-resident k/v) fits, with the largest
    128-lane-aligned head group at that tile."""
    for cap in _STREAM_CAPS:
        tq = _q_tile(n, cap)
        for g in _group_candidates(num_heads, head_dim):
            lanes = g * head_dim
            kv_resident = 2 * 2 * n * lanes * 2       # k+v, double-buffered
            tiles = 3 * tq * n * 4                    # live score-tile f32s
            bias_blocks = 2 * 2 * g * tq * n * 4      # bias + dbias, buffered
            small = 4 * 2 * tq * lanes * 4            # q/g/dq/o tiles
            if kv_resident + tiles + bias_blocks + small <= 13 * 1024 * 1024:
                return g, tq
    return None


def _stream_seed(seed_ref, b_idx, g_idx, qt_idx, num_groups, num_tiles):
    return seed_ref[0] + (b_idx * num_groups + g_idx) * num_tiles + qt_idx


def _stream_fwd_kernel(refs, *, scale, dropout_rate, group, head_dim,
                       num_groups, num_tiles, has_bias, has_qvb, want_lse):
    it = iter(refs)
    seed_ref = next(it)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    qvb_ref = next(it) if has_qvb else None
    o_ref = next(it)
    lse_ref = next(it) if want_lse else None

    b_idx, g_idx, qt_idx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            _stream_seed(seed_ref, b_idx, g_idx, qt_idx, num_groups, num_tiles)
        )
    qvb = qvb_ref[...] if has_qvb else None
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        if has_qvb:
            q = _qv_biased(q, qvb[0], sl)
            v = _qv_biased(v, qvb[2], sl)
        bias = bias_ref[i].astype(jnp.float32)[None] if has_bias else None
        s = _scores(q, k, None, scale)
        if bias is not None:
            s = s + bias
        if BOUNDED_SCORES:
            e = jnp.exp(s)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            lse = None
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            lse = m
        if want_lse:
            # 4-D [B, G, N, group] layout: the block is full in its last dim,
            # which Mosaic requires when group < num_heads.
            lse = -jnp.log(r) if lse is None else lse - jnp.log(r)
            lse_ref[:, 0, :, i:i + 1] = lse.astype(lse_ref.dtype)
        if dropout_rate > 0.0:
            e = e * _dropout_mask(e.shape, dropout_rate)
        out = jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * r
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _stream_recompute_tile(q, k, v, g_t, bias, lse_i, scale, dropout_rate,
                           valid=None):
    """Shared bwd tile algebra: (p, ds) from the saved lse (see _bwd_kernel
    for the derivation). `valid` masks ragged-last-tile query rows whose
    loads are OOB garbage — required wherever p/ds feed an accumulation
    (dk/dv); plain stores are masked by Pallas itself."""
    s = _scores(q, k, None, scale)
    if bias is not None:
        s = s + bias
    p = jnp.exp(s - lse_i.astype(jnp.float32))
    if valid is not None:
        p = jnp.where(valid, p, 0.0)
    if dropout_rate > 0.0:
        p_d = p * _dropout_mask(p.shape, dropout_rate)
    else:
        p_d = p
    dp_raw = jax.lax.dot_general(
        g_t, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    t = dp_raw * p_d
    c = jnp.sum(t, axis=-1, keepdims=True)
    ds = t - p * c
    return p_d, ds


def _stream_bwd_dq_kernel(refs, *, scale, dropout_rate, group, head_dim,
                          num_groups, num_tiles, has_bias, has_qvb,
                          seq_len, q_tile):
    # seq_len/q_tile unused: dq and dbias garbage rows die at the masked
    # block store; only the dkv kernel's accumulations need explicit masking.
    del seq_len, q_tile
    it = iter(refs)
    seed_ref = next(it)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    qvb_ref = next(it) if has_qvb else None
    lse_ref, g_ref = next(it), next(it)
    dq_ref = next(it)
    dbias_ref = next(it) if has_bias else None

    g_idx, qt_idx, b_idx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            _stream_seed(seed_ref, b_idx, g_idx, qt_idx, num_groups, num_tiles)
        )

    @pl.when(b_idx == 0)
    def _():
        if has_bias:
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    qvb = qvb_ref[...] if has_qvb else None
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        if has_qvb:
            q = _qv_biased(q, qvb[0], sl)
            v = _qv_biased(v, qvb[2], sl)
        g_t = g_ref[:, :, sl]
        bias = bias_ref[i].astype(jnp.float32)[None] if has_bias else None
        _, ds = _stream_recompute_tile(
            q, k, v, g_t, bias, lse_ref[:, 0, :, i:i + 1], scale, dropout_rate
        )
        dq = jax.lax.dot_general(
            ds.astype(q_ref.dtype), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        if has_bias:
            dbias_ref[i] += jnp.sum(ds, axis=0)


def _stream_bwd_dkv_kernel(refs, *, scale, dropout_rate, group, head_dim,
                           num_groups, num_tiles, has_bias, has_qvb,
                           seq_len, q_tile):
    it = iter(refs)
    seed_ref = next(it)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    qvb_ref = next(it) if has_qvb else None
    lse_ref, g_ref = next(it), next(it)
    dk_ref, dv_ref = next(it), next(it)

    g_idx, b_idx, qt_idx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            _stream_seed(seed_ref, b_idx, g_idx, qt_idx, num_groups, num_tiles)
        )

    @pl.when(qt_idx == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    # Ragged last tile: rows ≥ seq_len are OOB garbage but their p/ds feed
    # the dk/dv accumulation — mask them (and g, whose garbage could be
    # non-finite and poison 0·inf) to zero.
    valid = None
    if seq_len % q_tile != 0:
        rows = qt_idx * q_tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, q_tile, 1), 1
        )
        valid = rows < seq_len

    qvb = qvb_ref[...] if has_qvb else None
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        if has_qvb:
            q = _qv_biased(q, qvb[0], sl)
            v = _qv_biased(v, qvb[2], sl)
        g_t = g_ref[:, :, sl]
        if valid is not None:
            # dk/dv contract over query rows: zero every factor of a garbage
            # row (0·NaN = NaN otherwise).
            g_t = jnp.where(valid, g_t, jnp.zeros_like(g_t))
            q = jnp.where(valid, q, jnp.zeros_like(q))
        bias = bias_ref[i].astype(jnp.float32)[None] if has_bias else None
        p_d, ds = _stream_recompute_tile(
            q, k, v, g_t, bias, lse_ref[:, 0, :, i:i + 1], scale, dropout_rate,
            valid=valid,
        )
        dv_ref[:, :, sl] += jax.lax.dot_general(
            p_d.astype(g_t.dtype), g_t, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk_ref[:, :, sl] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale


def _stream_common(qkv, num_heads):
    b, n, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // num_heads
    plan = _stream_plan(head_dim, num_heads, n)
    assert plan is not None, (num_heads, head_dim, n)
    group, tq = plan
    num_groups = num_heads // group
    lanes = group * head_dim
    return b, n, c, head_dim, group, num_groups, lanes, tq


def _stream_io_specs(n, tq, lanes, group, num_groups, has_bias, has_qvb,
                     order):
    """in_specs (after the seed) for the streaming kernels. `order` maps the
    grid axes to (b, g, qt) by name — e.g. fwd grid (B, G, QT) → 'b g q'."""
    names = order.split()

    def pick(*vals):
        by = dict(zip(names, range(len(names))))
        def f(key, default=0):
            return vals[by[key]] if key in by else default
        return f

    def qtile_idx(offset_groups):
        def im(*axes):
            g = pick(*axes)
            return (g("b"), g("q"), offset_groups + g("g"))
        return im

    def full_idx(offset_groups):
        def im(*axes):
            g = pick(*axes)
            return (g("b"), 0, offset_groups + g("g"))
        return im

    specs = [
        pl.BlockSpec((1, tq, lanes), qtile_idx(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, lanes), full_idx(num_groups), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, lanes), full_idx(2 * num_groups), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        def bias_im(*axes):
            g = pick(*axes)
            return (g("g"), g("q"), 0)
        specs.append(
            pl.BlockSpec((group, tq, n), bias_im, memory_space=pltpu.VMEM)
        )
    if has_qvb:
        def qvb_im(*axes):
            g = pick(*axes)
            return (0, g("g"))
        specs.append(pl.BlockSpec((3, lanes), qvb_im, memory_space=pltpu.VMEM))

    def lse_im(*axes):
        g = pick(*axes)
        return (g("b"), g("g"), g("q"), 0)

    # lse lives as [B, G, N, group] so the block is FULL in its last dim —
    # Mosaic rejects a partial last dim that isn't 128-aligned (group is
    # typically 2 at these shapes).
    lse_spec = pl.BlockSpec((1, 1, tq, group), lse_im, memory_space=pltpu.VMEM)
    qtile_spec = pl.BlockSpec((1, tq, lanes), qtile_idx(0), memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, n, lanes), full_idx(0), memory_space=pltpu.VMEM)
    return specs, lse_spec, qtile_spec, full_spec


def _stream_fwd_impl(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate,
                     want_lse: bool = True):
    b, n, c, head_dim, group, num_groups, lanes, tq = _stream_common(qkv, num_heads)
    num_tiles = -(-n // tq)
    has_bias, has_qvb = bias is not None, qv_bias is not None

    specs, lse_spec, qtile_spec, _ = _stream_io_specs(
        n, tq, lanes, group, num_groups, has_bias, has_qvb, "b g q"
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs
    args = [seed, qkv, qkv, qkv]
    if has_bias:
        args.append(bias)
    if has_qvb:
        args.append(qv_bias)

    kernel = functools.partial(
        lambda *refs, **kw: _stream_fwd_kernel(refs, **kw),
        scale=scale, dropout_rate=dropout_rate, group=group,
        head_dim=head_dim, num_groups=num_groups, num_tiles=num_tiles,
        has_bias=has_bias, has_qvb=has_qvb, want_lse=want_lse,
    )
    out_specs = [qtile_spec]
    out_shapes = [jax.ShapeDtypeStruct((b, n, c), qkv.dtype)]
    if want_lse:
        out_specs.append(lse_spec)
        out_shapes.append(
            jax.ShapeDtypeStruct((b, num_groups, n, group), LSE_DTYPE)
        )
    outs = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(b, num_groups, num_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * head_dim,
            bytes_accessed=2 * b * n * 3 * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(*args)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


def _stream_bwd_impl(qkv, bias, qv_bias, seed, lse, g, scale, num_heads,
                     dropout_rate):
    b, n, c, head_dim, group, num_groups, lanes, tq = _stream_common(qkv, num_heads)
    num_tiles = -(-n // tq)
    has_bias, has_qvb = bias is not None, qv_bias is not None
    kw = dict(
        scale=scale, dropout_rate=dropout_rate, group=group,
        head_dim=head_dim, num_groups=num_groups, num_tiles=num_tiles,
        has_bias=has_bias, has_qvb=has_qvb, seq_len=n, q_tile=tq,
    )

    # kernel 1: dq (written once per tile) + dbias (accumulated over batch)
    specs, lse_spec, qtile_spec, _ = _stream_io_specs(
        n, tq, lanes, group, num_groups, has_bias, has_qvb, "g q b"
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs + [lse_spec, qtile_spec]
    args = [seed, qkv, qkv, qkv]
    if has_bias:
        args.append(bias)
    if has_qvb:
        args.append(qv_bias)
    args += [lse, g]
    out_specs = [qtile_spec]
    out_shapes = [jax.ShapeDtypeStruct((b, n, c), qkv.dtype)]
    if has_bias:
        def dbias_im(gg, qt, b_):
            return (gg, qt, 0)
        out_specs.append(
            pl.BlockSpec((group, tq, n), dbias_im, memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct(bias.shape, jnp.float32))
    outs1 = pl.pallas_call(
        functools.partial(lambda *refs, **k: _stream_bwd_dq_kernel(refs, **k), **kw),
        interpret=INTERPRET,
        grid=(num_groups, num_tiles, b),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * num_heads * n * n * head_dim,
            bytes_accessed=3 * b * n * 3 * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(*args)
    dq = outs1[0]
    dbias = outs1[1].astype(bias.dtype) if has_bias else None

    # kernel 2: dk/dv (accumulated over q-tiles in f32 outputs)
    specs, lse_spec, qtile_spec, full_spec = _stream_io_specs(
        n, tq, lanes, group, num_groups, has_bias, has_qvb, "g b q"
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs + [lse_spec, qtile_spec]
    outs2 = pl.pallas_call(
        functools.partial(lambda *refs, **k: _stream_bwd_dkv_kernel(refs, **k), **kw),
        interpret=INTERPRET,
        grid=(num_groups, b, num_tiles),
        in_specs=in_specs,
        out_specs=[full_spec, full_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * num_heads * n * n * head_dim,
            bytes_accessed=3 * b * n * 3 * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(*args)
    dk = outs2[0].astype(qkv.dtype)
    dv = outs2[1].astype(qkv.dtype)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    dqvb = None if qv_bias is None else _reduce_qv_bias_grad(
        dqkv, b, n, c, qv_bias.dtype
    )
    return dqkv, dbias, dqvb


# ---------------------------------------------------------------------------
# Cross attention (separate q / packed kv) + the sequence-parallel wrapper
# ---------------------------------------------------------------------------
#
# The streaming kernels above already read q, k and v through SEPARATE refs;
# packing was only ever a property of the call-level BlockSpecs. These impls
# point the same kernels at two arrays — q [B, Nq, C] and kv [B, Nk, 2C] —
# which is exactly the local view of token(seq)-sharded attention after the
# k/v all-gather: q rows stay sharded over the 'seq' mesh axis, keys/values
# are gathered (the standard sequence-parallel attention decomposition; the
# gather rides ICI). seq_sharded_qkv_attention wraps this in a shard_map.


def _cross_plan(head_dim: int, num_heads: int, nq: int, nk: int):
    """(head_group, q_tile) for the cross kernels (see _stream_plan)."""
    for cap in _STREAM_CAPS:
        tq = _q_tile(nq, cap)
        for g in _group_candidates(num_heads, head_dim):
            lanes = g * head_dim
            kv_resident = 2 * 2 * nk * lanes * 2
            tiles = 3 * tq * nk * 4
            bias_blocks = 2 * 2 * g * tq * nk * 4
            small = 4 * 2 * tq * lanes * 4
            if kv_resident + tiles + bias_blocks + small <= 13 * 1024 * 1024:
                return g, tq
    return None


def _cross_specs(nq, nk, tq, lanes, group, num_groups, has_bias, has_qvb,
                 order):
    """in_specs (after the seed) for the cross kernels: q tiles come from the
    [B, Nq, C] array, k/v slabs from the [B, Nk, 2C] array (k at group
    offset 0, v at offset num_groups)."""
    names = order.split()

    def pick(*vals):
        by = dict(zip(names, range(len(names))))
        def f(key, default=0):
            return vals[by[key]] if key in by else default
        return f

    def q_idx(*axes):
        g = pick(*axes)
        return (g("b"), g("q"), g("g"))

    def kv_idx(offset_groups):
        def im(*axes):
            g = pick(*axes)
            return (g("b"), 0, offset_groups + g("g"))
        return im

    specs = [
        pl.BlockSpec((1, tq, lanes), q_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, lanes), kv_idx(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, lanes), kv_idx(num_groups), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        def bias_im(*axes):
            g = pick(*axes)
            return (g("g"), g("q"), 0)
        specs.append(
            pl.BlockSpec((group, tq, nk), bias_im, memory_space=pltpu.VMEM)
        )
    if has_qvb:
        def qvb_im(*axes):
            g = pick(*axes)
            return (0, g("g"))
        specs.append(pl.BlockSpec((3, lanes), qvb_im, memory_space=pltpu.VMEM))

    def lse_im(*axes):
        g = pick(*axes)
        return (g("b"), g("g"), g("q"), 0)

    lse_spec = pl.BlockSpec((1, 1, tq, group), lse_im, memory_space=pltpu.VMEM)
    qtile_spec = pl.BlockSpec((1, tq, lanes), q_idx, memory_space=pltpu.VMEM)

    def kvfull_idx(*axes):
        g = pick(*axes)
        return (g("b"), 0, g("g"))

    kvfull_spec = pl.BlockSpec((1, nk, lanes), kvfull_idx, memory_space=pltpu.VMEM)
    return specs, lse_spec, qtile_spec, kvfull_spec


def _cross_common(q, kv, num_heads):
    b, nq, c = q.shape
    nk = kv.shape[1]
    head_dim = c // num_heads
    plan = _cross_plan(head_dim, num_heads, nq, nk)
    assert plan is not None, (num_heads, head_dim, nq, nk)
    group, tq = plan
    return b, nq, nk, c, head_dim, group, num_heads // group, group * head_dim, tq


def _cross_fwd_impl(q, kv, bias, qv_bias, seed, scale, num_heads,
                    dropout_rate, want_lse=True):
    b, nq, nk, c, head_dim, group, num_groups, lanes, tq = _cross_common(
        q, kv, num_heads)
    num_tiles = -(-nq // tq)
    has_bias, has_qvb = bias is not None, qv_bias is not None
    specs, lse_spec, qtile_spec, _ = _cross_specs(
        nq, nk, tq, lanes, group, num_groups, has_bias, has_qvb, "b g q"
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs
    args = [seed, q, kv, kv]
    if has_bias:
        args.append(bias)
    if has_qvb:
        args.append(qv_bias)
    kernel = functools.partial(
        lambda *refs, **kw: _stream_fwd_kernel(refs, **kw),
        scale=scale, dropout_rate=dropout_rate, group=group,
        head_dim=head_dim, num_groups=num_groups, num_tiles=num_tiles,
        has_bias=has_bias, has_qvb=has_qvb, want_lse=want_lse,
    )
    out_specs = [qtile_spec]
    out_shapes = [jax.ShapeDtypeStruct((b, nq, c), q.dtype)]
    if want_lse:
        out_specs.append(lse_spec)
        out_shapes.append(
            jax.ShapeDtypeStruct((b, num_groups, nq, group), LSE_DTYPE))
    outs = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(b, num_groups, num_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * nq * nk * head_dim,
            bytes_accessed=2 * b * (nq + nk) * c * q.dtype.itemsize,
            transcendentals=b * num_heads * nq * nk,
        ),
    )(*args)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


def _cross_bwd_impl(q, kv, bias, qv_bias, seed, lse, g, scale, num_heads,
                    dropout_rate):
    b, nq, nk, c, head_dim, group, num_groups, lanes, tq = _cross_common(
        q, kv, num_heads)
    num_tiles = -(-nq // tq)
    has_bias, has_qvb = bias is not None, qv_bias is not None
    kw = dict(
        scale=scale, dropout_rate=dropout_rate, group=group,
        head_dim=head_dim, num_groups=num_groups, num_tiles=num_tiles,
        has_bias=has_bias, has_qvb=has_qvb, seq_len=nq, q_tile=tq,
    )

    specs, lse_spec, qtile_spec, _ = _cross_specs(
        nq, nk, tq, lanes, group, num_groups, has_bias, has_qvb, "g q b"
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs + [lse_spec, qtile_spec]
    args = [seed, q, kv, kv]
    if has_bias:
        args.append(bias)
    if has_qvb:
        args.append(qv_bias)
    args += [lse, g]
    out_specs = [qtile_spec]
    out_shapes = [jax.ShapeDtypeStruct((b, nq, c), q.dtype)]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((group, tq, nk), lambda gg, qt, b_: (gg, qt, 0),
                         memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(bias.shape, jnp.float32))
    outs1 = pl.pallas_call(
        functools.partial(lambda *refs, **k: _stream_bwd_dq_kernel(refs, **k), **kw),
        interpret=INTERPRET,
        grid=(num_groups, num_tiles, b),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * num_heads * nq * nk * head_dim,
            bytes_accessed=3 * b * (nq + nk) * c * q.dtype.itemsize,
            transcendentals=b * num_heads * nq * nk,
        ),
    )(*args)
    dq = outs1[0]
    dbias = outs1[1].astype(bias.dtype) if has_bias else None

    specs, lse_spec, qtile_spec, kvfull_spec = _cross_specs(
        nq, nk, tq, lanes, group, num_groups, has_bias, has_qvb, "g b q"
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs + [lse_spec, qtile_spec]
    outs2 = pl.pallas_call(
        functools.partial(lambda *refs, **k: _stream_bwd_dkv_kernel(refs, **k), **kw),
        interpret=INTERPRET,
        grid=(num_groups, b, num_tiles),
        in_specs=in_specs,
        out_specs=[kvfull_spec, kvfull_spec],
        out_shape=[jax.ShapeDtypeStruct((b, nk, c), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * num_heads * nq * nk * head_dim,
            bytes_accessed=3 * b * (nq + nk) * c * q.dtype.itemsize,
            transcendentals=b * num_heads * nq * nk,
        ),
    )(*args)
    dkv = jnp.concatenate(
        [outs2[0].astype(q.dtype), outs2[1].astype(q.dtype)], axis=-1)
    dqvb = None
    if qv_bias is not None:
        # q/v bias cotangents from the separate grads; k row stays zero
        # (see _reduce_qv_bias_grad)
        dqb = dq.astype(jnp.float32).sum(axis=(0, 1))
        dvb = dkv[..., c:].astype(jnp.float32).sum(axis=(0, 1))
        dqvb = jnp.stack([dqb, jnp.zeros_like(dqb), dvb]).astype(qv_bias.dtype)
    return dq, dkv, dbias, dqvb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def cross_qkv_attention(q, kv, bias, qv_bias, scale, num_heads, dropout_rate,
                        seed=None):
    """Attention of q [B, Nq, C] against packed kv [B, Nk, 2C] (k|v).

    The local computation of token(seq)-sharded attention: q rows are a
    shard, kv is the all-gathered whole. bias: [H, Nq, Nk] or None (query
    rows sharded like q). dropout_rate must be 0 — the in-kernel prng seed
    replay is not defined across re-sharded grids (finetune's default
    attn_drop=0; error otherwise)."""
    assert dropout_rate == 0.0, "seq-sharded attention requires attn_drop=0"
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out, _ = _cross_fwd_impl(q, kv, bias, qv_bias, seed, scale, num_heads,
                             0.0, want_lse=False)
    return out


def _cross_vjp_fwd(q, kv, bias, qv_bias, scale, num_heads, dropout_rate,
                   seed=None):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out, lse = _cross_fwd_impl(q, kv, bias, qv_bias, seed, scale, num_heads,
                               0.0, want_lse=True)
    return out, (q, kv, bias, qv_bias, seed, lse)


def _cross_vjp_bwd(scale, num_heads, dropout_rate, res, g):
    q, kv, bias, qv_bias, seed, lse = res
    dq, dkv, dbias, dqvb = _cross_bwd_impl(
        q, kv, bias, qv_bias, seed, lse, g, scale, num_heads, 0.0
    )
    return dq, dkv, dbias, dqvb, None


cross_qkv_attention.defvjp(_cross_vjp_fwd, _cross_vjp_bwd)


def seq_sharded_qkv_attention(
    qkv: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    qv_bias: Optional[jnp.ndarray],
    scale: float,
    num_heads: int,
    mesh,
    data_axis: str = "data",
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """Token(seq)-sharded fused attention over a (data × seq × …) mesh.

    qkv [B, N, 3C] is sharded P(data, seq, None); each shard all-gathers
    k/v over `seq` (ICI collective — the canonical sequence-parallel
    decomposition, SURVEY §5.7) and runs the cross kernel on its local query
    rows; dk/dv scatter back through the gather's transpose
    (reduce-scatter), emitted by jax autodiff. bias [H, N, N] shards its
    QUERY rows over `seq`. ViT's odd N = grid²+1 is padded here to a
    multiple of the seq axis on the QUERY side only (zero queries, outputs
    sliced off); the gathered kv is sliced back to the real n keys inside
    the shard — the tail padding drops out exactly, so no key mask (and no
    dense [H, n_pad, n_pad] mask bias — round-3 ADVICE measured ~67MB of
    HBM for it at N=1025) is ever materialized.
    Training only supports attn dropout 0 (cross_qkv_attention)."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    c = qkv.shape[-1] // 3
    b, n, _ = qkv.shape
    s = mesh.shape[seq_axis]
    if s == 1:
        seed = jnp.zeros((1,), jnp.int32)
        return fused_qkv_attention(qkv, bias, qv_bias, seed, scale, num_heads, 0.0)
    n_pad = -(-n // s) * s
    if n_pad != n:
        pad = n_pad - n
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
        if bias is not None:
            # query rows only; the key dim stays n (padded keys are sliced
            # out of the gathered kv below, so they need no mask)
            bias = jnp.pad(bias, ((0, 0), (0, pad), (0, 0)))
    has_bias, has_qvb = bias is not None, qv_bias is not None

    def local(qkv_l, bias_l, qvb_l):
        kv = jax.lax.all_gather(qkv_l[..., c:], seq_axis, axis=1, tiled=True)
        # tiled gather preserves global token order, so the n_pad − n pad
        # rows sit at the tail — drop them; autodiff zero-pads dk/dv back
        # before the gather's reduce-scatter transpose (exact)
        kv = kv[:, :n]
        return cross_qkv_attention(
            qkv_l[..., :c], kv, bias_l if has_bias else None,
            qvb_l if has_qvb else None, scale, num_heads, 0.0,
        )

    in_specs = (
        P(data_axis, seq_axis, None),
        P(None, seq_axis, None) if has_bias else P(),
        P() if has_qvb else P(),
    )
    zeros = jnp.zeros((1,), jnp.float32)
    out = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=P(data_axis, seq_axis, None),
        # pallas_call out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )(qkv, bias if has_bias else zeros, qv_bias if has_qvb else zeros)
    return out[:, :n] if n_pad != n else out


def _route(num_heads: int, head_dim: int, n: int) -> Optional[str]:
    if not _FORCE_STREAM and _head_group(head_dim, num_heads, n) > 0:
        return "fused"
    if _stream_plan(head_dim, num_heads, n) is not None:
        return "stream"
    return None


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
    fwd = _dispatch_fwd(qkv, num_heads)
    out, _ = fwd(
        qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate, want_lse=False
    )
    return out


def _dispatch_fwd(qkv, num_heads):
    c = qkv.shape[-1] // 3
    route = _route(num_heads, c // num_heads, qkv.shape[1])
    assert route is not None, (num_heads, c // num_heads, qkv.shape[1])
    return _fwd_impl if route == "fused" else _stream_fwd_impl


def _dispatch_bwd(qkv, num_heads):
    c = qkv.shape[-1] // 3
    route = _route(num_heads, c // num_heads, qkv.shape[1])
    return _bwd_impl if route == "fused" else _stream_bwd_impl


def _fused_fwd(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate):
    fwd = _dispatch_fwd(qkv, num_heads)
    out, lse = fwd(qkv, bias, qv_bias, seed, scale, num_heads, dropout_rate)
    return out, (qkv, bias, qv_bias, seed, lse)


def _fused_bwd(scale, num_heads, dropout_rate, res, g):
    qkv, bias, qv_bias, seed, lse = res
    bwd = _dispatch_bwd(qkv, num_heads)
    dqkv, dbias, dqvb = bwd(
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
