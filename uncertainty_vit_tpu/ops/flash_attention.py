"""Fused TPU attention kernel (Pallas).

The reference's attention (modeling_finetune.py:155-185) materializes the
[B, H, N, N] score tensor in HBM four times (scores, +bias, softmax, dropout).
For ViT sequence lengths (197 / 577 / 1025 tokens) the whole key/value block
fits in VMEM, so instead of a streaming flash-attention we fuse the entire
q-tile × full-K attention into one kernel: scores, bias add, padding mask,
exact softmax, and the PV matmul never leave VMEM.

Forward is a Pallas kernel; backward is an exact jnp recompute (registered via
custom_vjp) whose matmuls XLA maps straight onto the MXU. Attention dropout
and the exotic probability variants route to ops/attention.py instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uncertainty_vit_tpu.ops.attention import attention_scores

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, n_real: int):
    """One (batch, head, q-tile) program: full-K fused attention.

    q_ref: [1, 1, bq, D]; k_ref/v_ref: [1, 1, Np, D]; bias_ref: [1, bq, Np]
    (or None); o_ref: [1, 1, bq, D].
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    scores = jax.lax.dot_general(
        q.astype(jnp.float32) * scale,
        k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, Np]
    if bias_ref is not None:
        scores = scores + bias_ref[0].astype(jnp.float32)

    n_pad = scores.shape[-1]
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_real, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
    block_q: int,
) -> jnp.ndarray:
    b, h, n, d = q.shape
    n_pad = _round_up(n, _LANE)
    d_pad = _round_up(d, _LANE)
    bq = min(block_q, n_pad)
    n_q_blocks = pl.cdiv(n_pad, bq)

    pad4 = [(0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)]
    qp = jnp.pad(q, pad4)
    kp = jnp.pad(k, pad4)
    vp = jnp.pad(v, pad4)
    if bias is not None:
        bias = jnp.broadcast_to(bias, (h, n, n))
        bias_p = jnp.pad(bias, [(0, 0), (0, n_pad - n), (0, n_pad - n)])
        bias_spec = pl.BlockSpec(
            (1, bq, n_pad), lambda ib, ih, iq: (ih, iq, 0), memory_space=pltpu.VMEM
        )
        bias_args = (bias_p,)
    else:
        bias_spec = None
        bias_args = ()

    kernel = functools.partial(_attn_kernel, scale=scale, n_real=n)
    if bias is None:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _attn_kernel(qr, kr, vr, None, orf, **kw),
            scale=scale,
            n_real=n,
        )

    in_specs = [
        pl.BlockSpec(
            (1, 1, bq, d_pad), lambda ib, ih, iq: (ib, ih, iq, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, n_pad, d_pad), lambda ib, ih, iq: (ib, ih, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, n_pad, d_pad), lambda ib, ih, iq: (ib, ih, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    if bias_spec is not None:
        in_specs.append(bias_spec)

    out = pl.pallas_call(
        kernel,
        grid=(b, h, n_q_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, bq, d_pad), lambda ib, ih, iq: (ib, ih, iq, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * d_pad,
            bytes_accessed=(3 * b * h * n_pad * d_pad + b * h * n_pad * d_pad)
            * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qp, kp, vp, *bias_args)
    return out[:, :, :n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
    block_q: int = 512,
) -> jnp.ndarray:
    """Fused softmax attention. q/k/v: [B, H, N, D]; bias: [H, N, N] or None.

    Exact (non-approximate) softmax over the full key axis; numerically
    matches ops.attention.naive_attention(variant='softmax') with no dropout.
    """
    return _flash_fwd_impl(q, k, v, bias, scale, block_q)


def _flash_fwd(q, k, v, bias, scale, block_q):
    out = _flash_fwd_impl(q, k, v, bias, scale, block_q)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, res, g):
    q, k, v, bias = res
    # Exact recompute in f32: cheap at ViT sequence lengths, and XLA fuses the
    # elementwise chain into the MXU matmuls.
    scores = attention_scores(q, k, scale, bias)
    probs = jax.nn.softmax(scores, axis=-1)

    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32, preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = (
        jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    )
    dk = (
        jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    )
    if bias is not None:
        dbias = ds
        # Reduce over broadcast dims to recover the bias shape.
        while dbias.ndim > bias.ndim:
            dbias = dbias.sum(axis=0)
        for ax in range(bias.ndim):
            if bias.shape[ax] == 1 and dbias.shape[ax] != 1:
                dbias = dbias.sum(axis=ax, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    else:
        dbias = None
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
