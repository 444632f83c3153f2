"""Fused Pallas dropout: in-kernel hardware RNG, no HBM bits tensor.

VERDICT r4 item 10 — the residual cost of FULL-DEPTH MC-dropout
(uncertainty_evaluations.py:41-89 is the reference frame) is dropout-mask
traffic: XLA lowers every nn.Dropout to an RngBitGenerator HLO whose u32
bits tensor is a non-fusible producer — at the K-folded batch it
round-trips [K·B, N, C] of HBM per mask (24 masks/fwd at depth 12: the
MLP-fc2 and attn-proj dropouts), plus the generator compute (threefry
measured 87 ms of the K=8·B=128 pass on v5e; the rbg generator in
evals/mc_dropout.py cut ~30% of that). This kernel generates the bits
in-register via the TPU hardware PRNG (pltpu.prng_random_bits, the same
plumbing as the attention kernel's in-kernel dropout,
ops/flash_attention.py:96-103) so the dropout costs exactly one read +
one write of x.

Trace-time switch, flash_attention-style: set FUSED = True (or
UVIT_FUSED_DROPOUT=1 through cli.common.setup_jax) BEFORE building the
jitted forward. Forward-only by design — the eval-time MC-dropout path is
inference; training keeps the XLA lowering (its masks must be regenerable
by the custom-VJP convention, which only the attention kernel implements).
tools/bench_mc_dropout.py measures the end-to-end effect on chip; if the
saving does not materialize, record the result and close the item like
int8 (PARITY.md evidence-pack convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Trace-time opt-in (read by models/layers._dropout). TPU-only: the Pallas
# interpreter does not implement pltpu.prng_seed, so there is no CPU path.
FUSED = False

_LANE = 128
_BLOCK_BYTES = 1 << 20  # ~1MB x-block per program; Mosaic double-buffers


def _kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (2**32)), 2**32 - 1))
    keep = bits >= threshold
    scale = jnp.float32(1.0 / (1.0 - rate))
    o_ref[...] = jnp.where(
        keep, x_ref[...].astype(jnp.float32) * scale, 0.0
    ).astype(o_ref.dtype)


def supported(x: jnp.ndarray) -> bool:
    """Lane-aligned last dim (768/3072 on every ViT path), ≥2D, and a TPU
    backend (the hardware PRNG has no CPU/interpreter lowering — same gate
    as models.layers._maybe_quant)."""
    return (
        x.ndim >= 2
        and x.shape[-1] % _LANE == 0
        and jax.default_backend() == "tpu"
    )


def _block_rows(m: int, c: int, itemsize: int) -> int:
    """Row-block size for the (m, c) grid. Mosaic requires the second-minor
    block dim be a multiple of 8 (sublanes) OR equal to the full array dim —
    the raw ~1MB budget (682 rows at c=768 bf16) violated that and failed
    lowering on chip (round-5 TPU ladder, stage 6). Full array when it fits
    in one program's budget; otherwise the budget floored to a sublane
    multiple."""
    budget = max(1, _BLOCK_BYTES // (c * itemsize))
    if m <= budget:
        return m
    return max(8, (budget // 8) * 8)


@functools.partial(jax.jit, static_argnames=("rate",))
def fused_dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout with in-kernel PRNG; keep-probability 1-rate, kept
    values scaled by 1/(1-rate) (torch/flax convention). Each call consumes
    one int32 seed derived from `rng`; blocks are reseeded per program id so
    masks are independent across the grid."""
    if rate <= 0.0:
        return x
    if not supported(x):
        raise ValueError(f"fused_dropout needs a {_LANE}-aligned last dim, got {x.shape}")
    c = x.shape[-1]
    xm = x.reshape(-1, c)
    m = xm.shape[0]
    block_m = _block_rows(m, c, x.dtype.itemsize)
    grid = pl.cdiv(m, block_m)
    seed = jax.random.randint(rng, (1,), -(2**31), 2**31 - 1, dtype=jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, rate=float(rate)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xm.shape, x.dtype),
    )(seed, xm)
    return out.reshape(x.shape)
