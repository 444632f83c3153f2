"""Pallas attention-kernel coverage on CPU via interpreter mode.

The CPU suite can't run Mosaic-compiled kernels, so these tests flip the
module's INTERPRET switch and validate the kernel *code path* (BlockSpec
slicing, head grouping, bias add, softmax, backward formulas, dbias
accumulation) against the naive reference. TPU-compiled parity is exercised
separately by the verify drives / graft entry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import uncertainty_vit_tpu.ops.flash_attention as FA
from uncertainty_vit_tpu.ops.attention import naive_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    FA.INTERPRET = True
    yield
    FA.INTERPRET = False


B, N, H, D = 2, 13, 4, 32  # head group = 4 (4·32 = 128 lanes)
C = H * D
SCALE = D**-0.5


def unpack(qkv):
    r = qkv.reshape(B, N, 3, H, D)
    return [jnp.moveaxis(r[:, :, i], 1, 2) for i in range(3)]


def naive_flat(qkv, bias):
    q, k, v = unpack(qkv)
    out = naive_attention(q, k, v, SCALE, bias)
    return jnp.moveaxis(out, 1, 2).reshape(B, N, C)


@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_forward_matches_naive(with_bias):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = (
        jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1 if with_bias else None
    )
    seed = jnp.zeros((1,), jnp.int32)
    out = FA.fused_qkv_attention(qkv, bias, seed, SCALE, H, 0.0)
    ref = naive_flat(qkv, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_backward_matches_naive():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    seed = jnp.zeros((1,), jnp.int32)

    g_f = jax.grad(
        lambda q, b: jnp.sum(FA.fused_qkv_attention(q, b, seed, SCALE, H, 0.0) ** 2),
        argnums=(0, 1),
    )(qkv, bias)
    g_r = jax.grad(
        lambda q, b: jnp.sum(naive_flat(q, b) ** 2), argnums=(0, 1)
    )(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_r[0]), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_r[1]), rtol=1e-3, atol=1e-4)


def test_head_group_selection():
    assert FA._head_group(64, 12, 197) == 12
    assert FA._head_group(64, 16, 197) == 16
    assert FA._head_group(64, 12, 577) == 2
    assert FA._head_group(64, 16, 1025) == 0  # VMEM-infeasible → naive path
    assert FA.kernel_supported(12, 64, 197)
    assert not FA.kernel_supported(16, 64, 1025)
    # odd head_dim that can't tile 128 lanes
    assert not FA.kernel_supported(3, 100, 197)


def test_compat_wrapper_layout():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, N, D))
    out = FA.flash_attention(q, k, v, None, SCALE)
    ref = naive_attention(q, k, v, SCALE, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
