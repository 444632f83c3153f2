"""Decompose the fused attention kernel's in-kernel cost on the real chip.

Builds standalone Pallas kernels that mirror ops/flash_attention.py's
_fwd_kernel/_bwd_kernel structure (same grid/BlockSpecs/head-grouping) with
pieces progressively removed, and times LAYERS-deep chains of each (chained
i/o so nothing hoists — see tools/profile_quant.py for why).

Forward ladder:   full → no-lse-store → no-max → no-softmax → matmul-only
Backward ladder:  full → no-dbias → no-softmax-vjp → matmul-only

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_attn_ablate.py
"""

import functools
import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uncertainty_vit_tpu.ops import flash_attention as FA

B, N, C, H, LAYERS = 128, 197, 768, 12, 12
D = C // H
SCALE = D**-0.5


def bench(fn, args, label, iters=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:26s} {dt*1e3:8.2f} ms  ({dt/LAYERS*1e3:6.3f} ms/layer)",
          flush=True)
    return dt


def _fwd_ablate_kernel(refs, *, group, head_dim, mode, has_bias, want_lse):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    lse_ref = next(it) if want_lse else None
    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mode != "mmonly":
            s = s * SCALE
            if has_bias:
                s = s + bias_ref[i].astype(jnp.float32)
        if mode in ("full", "nolse"):
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            if want_lse and mode == "full":
                lse_ref[:, 0, :, i:i + 1] = m - jnp.log(r)
        elif mode == "nomax":
            e = jnp.exp(s)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        else:  # nosmax / mmonly
            e, r = s, None
        out = jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if r is not None:
            out = out * r
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def make_fwd(mode, has_bias=True):
    group = FA._head_group(D, H, N)
    num_groups = H // group
    lanes = group * D
    bb, _ = FA._fwd_bwd_blocks(B, N, lanes, group, 0.0)
    want_lse = mode == "full"

    def call(qkv, bias):
        in_specs = FA._qkv_specs(N, lanes, num_groups, bh_grid=True, bb=bb)
        args = [qkv, qkv, qkv]
        if has_bias:
            in_specs.append(pl.BlockSpec((group, N, N), lambda b_, g: (g, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(bias)
        out_specs = [pl.BlockSpec((bb, N, lanes), lambda b_, g: (b_, 0, g),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((B, N, C), qkv.dtype)]
        if want_lse:
            out_specs.append(pl.BlockSpec((bb, 1, N, group),
                                          lambda b_, g: (b_, g, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((B, num_groups, N, group), jnp.float32))
        outs = pl.pallas_call(
            functools.partial(
                lambda *refs, **kw: _fwd_ablate_kernel(refs, **kw),
                group=group, head_dim=D, mode=mode, has_bias=has_bias,
                want_lse=want_lse,
            ),
            grid=(B // bb, num_groups),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * N * N * D,
                bytes_accessed=2 * B * N * 3 * C * 2,
                transcendentals=B * H * N * N,
            ),
        )(*args)
        return outs[0]

    return jax.jit(
        lambda qkv, bias: _chain(call, qkv, bias)
    )


def _chain(call, qkv, bias):
    h = qkv
    for _ in range(LAYERS):
        o = call(h, bias)
        h = jnp.concatenate([o, o, o], axis=-1)
    return h.astype(jnp.float32).mean()


def _bwd_ablate_kernel(refs, *, group, head_dim, mode, has_bias):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    lse_ref, g_ref = next(it), next(it)
    dqkv_ref = next(it)
    dbias_ref = next(it) if (has_bias and mode in ("full",)) else None
    lanes = group * head_dim
    b_idx = pl.program_id(1)

    if dbias_ref is not None:
        @pl.when(b_idx == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for i in range(group):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        g = g_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mode != "mmonly":
            s = s * SCALE
            if has_bias:
                s = s + bias_ref[i].astype(jnp.float32)
        if mode in ("full", "nodbias"):
            p = jnp.exp(s - lse_ref[:, 0, :, i:i + 1])
        else:
            p = s  # novjp / mmonly: pretend scores are probabilities
        dv = jax.lax.dot_general(
            p.astype(g.dtype), g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp_raw = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mode in ("full", "nodbias"):
            t = dp_raw * p
            c = jnp.sum(t, axis=-1, keepdims=True)
            ds = t - p * c
        else:
            ds = dp_raw
        ds_c = ds.astype(q_ref.dtype)
        dq = jax.lax.dot_general(
            ds_c, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds_c, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mode != "mmonly":
            dq = dq * SCALE
            dk = dk * SCALE
        dqkv_ref[:, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, lanes + sl.start:lanes + sl.stop] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * lanes + sl.start:2 * lanes + sl.stop] = dv.astype(dqkv_ref.dtype)
        if dbias_ref is not None:
            dbias_ref[i] += jnp.sum(ds, axis=0)


def make_bwd(mode, has_bias=True):
    group = FA._head_group(D, H, N)
    num_groups = H // group
    lanes = group * D
    _, bb = FA._fwd_bwd_blocks(B, N, lanes, group, 0.0)
    with_dbias = has_bias and mode == "full"

    def call(qkv, bias, lse, g):
        in_specs = FA._qkv_specs(N, lanes, num_groups, bh_grid=False, bb=bb)
        args = [qkv, qkv, qkv]
        if has_bias:
            in_specs.append(pl.BlockSpec((group, N, N), lambda gg, b_: (gg, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(bias)
        in_specs.append(pl.BlockSpec((bb, 1, N, group),
                                     lambda gg, b_: (b_, gg, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lse)
        in_specs.append(pl.BlockSpec((bb, N, lanes), lambda gg, b_: (b_, 0, gg),
                                     memory_space=pltpu.VMEM))
        args.append(g)
        out_specs = [pl.BlockSpec((bb, N, 3 * C), lambda gg, b_: (b_, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((B, N, 3 * C), qkv.dtype)]
        if with_dbias:
            out_specs.append(pl.BlockSpec((group, N, N),
                                          lambda gg, b_: (gg, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((H, N, N), jnp.float32))
        outs = pl.pallas_call(
            functools.partial(
                lambda *refs, **kw: _bwd_ablate_kernel(refs, **kw),
                group=group, head_dim=D, mode=mode, has_bias=has_bias,
            ),
            grid=(num_groups, B // bb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=10 * B * H * N * N * D,
                bytes_accessed=4 * B * N * 3 * C * 2,
                transcendentals=B * H * N * N,
            ),
        )(*args)
        return outs[0]

    def chain(qkv, bias, lse, g):
        h = qkv
        for _ in range(LAYERS):
            d = call(h, bias, lse, g)
            h = d  # dqkv is [B, N, 3C] — feeds straight back in
        return h.astype(jnp.float32).mean()

    return jax.jit(chain)


def main():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, N, 3 * C), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N), jnp.float32)
    group = FA._head_group(D, H, N)
    num_groups = H // group
    lse = jnp.full((B, num_groups, N, group), 5.0, jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (B, N, C), jnp.bfloat16) * 0.01

    print(f"forward ladder (group={group}):", flush=True)
    for mode in ("full", "nolse", "nomax", "nosmax", "mmonly"):
        bench(make_fwd(mode), (qkv, bias), f"  fwd {mode}")
    bench(make_fwd("mmonly", has_bias=False), (qkv, bias), "  fwd mmonly-nobias")

    print("backward ladder:", flush=True)
    for mode in ("full", "nodbias", "novjp", "mmonly"):
        bench(make_bwd(mode), (qkv, bias, lse, g), f"  bwd {mode}")
    bench(make_bwd("mmonly", has_bias=False), (qkv, bias, lse, g),
          "  bwd mmonly-nobias")


if __name__ == "__main__":
    main()
