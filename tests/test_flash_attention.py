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
    out = FA.fused_qkv_attention(qkv, bias, None, seed, SCALE, H, 0.0)
    ref = naive_flat(qkv, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_backward_matches_naive():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    seed = jnp.zeros((1,), jnp.int32)

    g_f = jax.grad(
        lambda q, b: jnp.sum(FA.fused_qkv_attention(q, b, None, seed, SCALE, H, 0.0) ** 2),
        argnums=(0, 1),
    )(qkv, bias)
    g_r = jax.grad(
        lambda q, b: jnp.sum(naive_flat(q, b) ** 2), argnums=(0, 1)
    )(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_r[0]), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_r[1]), rtol=1e-3, atol=1e-4)


def test_in_kernel_qv_bias_matches_outside_add():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    q_b = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.3
    v_b = jax.random.normal(jax.random.PRNGKey(3), (C,)) * 0.3
    qvb = jnp.stack([q_b, jnp.zeros_like(q_b), v_b], axis=0)
    seed = jnp.zeros((1,), jnp.int32)

    def with_kernel_bias(q, b, qb):
        return jnp.sum(FA.fused_qkv_attention(q, b, qb, seed, SCALE, H, 0.0) ** 2)

    def with_outside_add(q, b, qb):
        return jnp.sum(
            FA.fused_qkv_attention(q + qb.reshape(-1), b, None, seed, SCALE, H, 0.0)
            ** 2
        )

    out_k = FA.fused_qkv_attention(qkv, bias, qvb, seed, SCALE, H, 0.0)
    out_o = FA.fused_qkv_attention(qkv + qvb.reshape(-1), bias, None, seed, SCALE, H, 0.0)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_o), rtol=2e-4, atol=2e-5)

    g_k = jax.grad(with_kernel_bias, argnums=(0, 1, 2))(qkv, bias, qvb)
    g_o = jax.grad(with_outside_add, argnums=(0, 1, 2))(qkv, bias, qvb)
    for a, b_ in zip(g_k, g_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_seed has no CPU interpreter lowering",
)
def test_dropout_backward_replays_forward_mask():
    """With dropout active the backward regenerates the forward's prng mask
    stream (same seed mapping, same per-head order, same batch-block). For
    fixed q/k the output is exactly linear in v through the dropped
    probability matrix P_d, so f = Σ out² satisfies the Euler identity
    ⟨∂f/∂v, v⟩ = 2f — but only when the backward's regenerated P_d equals the
    forward's (a mask mismatch breaks it at the percent level). Avoids finite
    differences, which the MXU's bf16 input quantization corrupts. TPU-only
    (the suite's CPU interpreter can't lower the Pallas prng)."""
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    seed = jnp.ones((1,), jnp.int32) * 7
    rate = 0.3

    def f(q):
        return jnp.sum(FA.fused_qkv_attention(q, None, None, seed, SCALE, H, rate) ** 2)

    fval = float(f(qkv))
    g = jax.grad(f)(qkv)
    v_inner = float(jnp.vdot(g[:, :, 2 * C:], qkv[:, :, 2 * C:]))
    # measured on chip: rel 1.7e-4 with the replayed mask, 3.3e-3 with a
    # deliberately mismatched seed — 1e-3 separates them
    np.testing.assert_allclose(v_inner, 2.0 * fval, rtol=1e-3)


def test_head_group_selection():
    assert FA._head_group(64, 12, 197) == 12
    assert FA._head_group(64, 16, 197) == 16
    assert FA._head_group(64, 12, 577) == 2
    # VMEM-infeasible for the fused kernel → routed to the q-tiled
    # streaming kernel (ViT-L/512)
    assert FA._head_group(64, 16, 1025) == 0
    assert FA._route(16, 64, 1025) == "stream"
    assert FA.kernel_supported(12, 64, 197)
    assert FA.kernel_supported(16, 64, 1025)
    # streaming q-tile: 8-aligned ceil grid at 1025, full-N when small
    g, tq = FA._stream_plan(64, 16, 1025)
    assert tq % 8 == 0 and -(-1025 // tq) * tq >= 1025
    # odd head_dim that can't tile 128 lanes
    assert not FA.kernel_supported(3, 100, 197)


def test_fused_backward_with_multiple_head_groups(monkeypatch):
    """num_groups > 1 (the ViT-B/L 384 regime, N=577 → group < num_heads)
    exercises the 4-D [B, G, N, group] lse residual layout — a [B, N, H]
    layout has a partial non-128 last dim that Mosaic rejects on TPU, a
    break the single-group tests above can never see."""
    import uncertainty_vit_tpu.ops.flash_attention as FA_mod

    monkeypatch.setattr(FA_mod, "_head_group", lambda hd, nh, n, raised=False: 2)
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    seed = jnp.zeros((1,), jnp.int32)

    g_f = jax.grad(
        lambda q, b: jnp.sum(FA.fused_qkv_attention(q, b, None, seed, SCALE, H, 0.0) ** 2),
        argnums=(0, 1),
    )(qkv, bias)
    g_r = jax.grad(
        lambda q, b: jnp.sum(naive_flat(q, b) ** 2), argnums=(0, 1)
    )(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_r[0]), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_r[1]), rtol=1e-3, atol=1e-4)


def test_qv_bias_k_row_gradient_is_zero():
    """The forward never adds a key bias (modeling_finetune.py:146-151), so
    the packed qv_bias's k row must receive a ZERO cotangent — a sum-of-dk
    row would silently train a parameter with no forward effect."""
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    qvb = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.3,
        jnp.zeros((C,)),
        jax.random.normal(jax.random.PRNGKey(3), (C,)) * 0.3,
    ])
    seed = jnp.zeros((1,), jnp.int32)
    g = jax.grad(
        lambda qb: jnp.sum(FA.fused_qkv_attention(qkv, None, qb, seed, SCALE, H, 0.0) ** 2)
    )(qvb)
    assert np.abs(np.asarray(g[1])).max() == 0.0
    assert np.abs(np.asarray(g[0])).max() > 0.0
    assert np.abs(np.asarray(g[2])).max() > 0.0


@pytest.fixture
def force_stream():
    FA._FORCE_STREAM = True
    caps = FA._STREAM_CAPS
    FA._STREAM_CAPS = (8,)  # multi-tile grids at interpreter-friendly N
    yield
    FA._FORCE_STREAM = False
    FA._STREAM_CAPS = caps


@pytest.mark.parametrize("with_bias", [False, True])
def test_stream_forward_matches_naive(force_stream, with_bias):
    # N=13 with tile 8 → ragged last tile (exercises the masked-OOB path)
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = (
        jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1 if with_bias else None
    )
    seed = jnp.zeros((1,), jnp.int32)
    assert FA._route(H, D, N) == "stream"
    out = FA.fused_qkv_attention(qkv, bias, None, seed, SCALE, H, 0.0)
    ref = naive_flat(qkv, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_stream_backward_matches_naive(force_stream):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    q_b = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.3
    v_b = jax.random.normal(jax.random.PRNGKey(3), (C,)) * 0.3
    qvb = jnp.stack([q_b, jnp.zeros_like(q_b), v_b], axis=0)
    seed = jnp.zeros((1,), jnp.int32)

    g_f = jax.grad(
        lambda q, b, qb: jnp.sum(
            FA.fused_qkv_attention(q, b, qb, seed, SCALE, H, 0.0) ** 2
        ),
        argnums=(0, 1, 2),
    )(qkv, bias, qvb)
    g_r = jax.grad(
        lambda q, b, qb: jnp.sum(naive_flat(q + qb.reshape(-1), b) ** 2),
        argnums=(0, 1, 2),
    )(qkv, bias, qvb)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
        )


@pytest.fixture
def micro_modes():
    """BOUNDED_SCORES + bf16 lse (the round-3 ablation's unharvested fwd
    headroom: max pass + lse store). Opt-in trace-time flags."""
    FA.BOUNDED_SCORES = True
    FA.LSE_DTYPE = jnp.bfloat16
    yield
    FA.BOUNDED_SCORES = False
    FA.LSE_DTYPE = jnp.float32


@pytest.mark.parametrize("stream", [False, True])
def test_bounded_scores_bf16_lse_forward(micro_modes, stream, request):
    if stream:
        request.getfixturevalue("force_stream")
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    seed = jnp.zeros((1,), jnp.int32)
    assert FA._route(H, D, N) == ("stream" if stream else "fused")
    # forward is EXACT in no-max mode (softmax is shift-invariant; nothing
    # overflows at these magnitudes) and does not read the lse at all
    out = FA.fused_qkv_attention(qkv, bias, None, seed, SCALE, H, 0.0)
    ref = naive_flat(qkv, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("stream", [False, True])
def test_bounded_scores_bf16_lse_backward(micro_modes, stream, request):
    if stream:
        request.getfixturevalue("force_stream")
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    seed = jnp.zeros((1,), jnp.int32)

    g_f = jax.grad(
        lambda q, b: jnp.sum(FA.fused_qkv_attention(q, b, None, seed, SCALE, H, 0.0) ** 2),
        argnums=(0, 1),
    )(qkv, bias)
    g_r = jax.grad(
        lambda q, b: jnp.sum(naive_flat(q, b) ** 2), argnums=(0, 1)
    )(qkv, bias)
    # bf16 lse quantization scales each probability row by exp(δ),
    # |δ| ≤ half a bf16 ULP of lse (~0.4% at lse≈3) — judge the error
    # against the gradient's scale, not elementwise (near-zero entries
    # carry the row-scale error of their large neighbours)
    for a, b_ in zip(g_f, g_r):
        a, b_ = np.asarray(a), np.asarray(b_)
        assert np.max(np.abs(a - b_)) / np.max(np.abs(b_)) < 0.02


def test_bf16_lse_residual_dtype(micro_modes):
    """The saved residual really is bf16 (the bandwidth the mode buys)."""
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    seed = jnp.zeros((1,), jnp.int32)
    _, lse = FA._fwd_impl(qkv, None, None, seed, SCALE, H, 0.0, want_lse=True)
    assert lse.dtype == jnp.bfloat16
    # and the stored value is log Σ exp(s) — same quantity as the max-pass
    # path (shift-consistent), just quantized
    FA.BOUNDED_SCORES = False
    FA.LSE_DTYPE = jnp.float32
    _, lse_ref = FA._fwd_impl(qkv, None, None, seed, SCALE, H, 0.0, want_lse=True)
    np.testing.assert_allclose(
        np.asarray(lse, np.float32), np.asarray(lse_ref), rtol=8e-3, atol=8e-3
    )


def test_compat_wrapper_layout():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, N, D))
    out = FA.flash_attention(q, k, v, None, SCALE)
    ref = naive_attention(q, k, v, SCALE, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# cross attention (separate q / packed kv) + sequence-parallel wrapper
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("with_bias", [False, True])
def test_cross_attention_matches_fused(with_bias):
    """cross_qkv_attention(q, kv) == fused attention of the packed tensor
    (the Nq == Nk degenerate case), including q/v bias."""
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = (
        jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
        if with_bias else None
    )
    out = FA.cross_qkv_attention(
        qkv[..., :C], qkv[..., C:], bias, None, SCALE, H, 0.0
    )
    ref = naive_flat(qkv, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_cross_attention_backward_matches_naive():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, N, N)) * 0.1
    q_b = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.3
    v_b = jax.random.normal(jax.random.PRNGKey(3), (C,)) * 0.3
    qvb = jnp.stack([q_b, jnp.zeros_like(q_b), v_b], axis=0)

    g_c = jax.grad(
        lambda q, kv, b, qb: jnp.sum(
            FA.cross_qkv_attention(q, kv, b, qb, SCALE, H, 0.0) ** 2
        ),
        argnums=(0, 1, 2, 3),
    )(qkv[..., :C], qkv[..., C:], bias, qvb)
    g_r = jax.grad(
        lambda q, b, qb: jnp.sum(naive_flat(q + qb.reshape(-1), b) ** 2),
        argnums=(0, 1, 2),
    )(qkv, bias, qvb)
    np.testing.assert_allclose(np.asarray(g_c[0]), np.asarray(g_r[0][..., :C]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_c[1]), np.asarray(g_r[0][..., C:]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_c[2]), np.asarray(g_r[1]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_c[3]), np.asarray(g_r[2]),
                               rtol=1e-3, atol=1e-4)


def _seq_mesh():
    from uncertainty_vit_tpu.parallel import mesh as pmesh

    return pmesh.create_mesh(8, model_parallel=2, seq_parallel=2)


@pytest.mark.parametrize("with_bias", [False, True])
def test_seq_sharded_attention_matches_unsharded(with_bias):
    """Token(seq)-sharded attention over a data x seq x model CPU mesh ==
    the unsharded fused kernel: the k/v all-gather + local cross kernel
    decomposition is exact."""
    n = 16  # divisible by the seq axis (2)
    mesh = _seq_mesh()
    qkv = jax.random.normal(jax.random.PRNGKey(0), (4, n, 3 * C))
    bias = (
        jax.random.normal(jax.random.PRNGKey(1), (H, n, n)) * 0.1
        if with_bias else None
    )
    out = FA.seq_sharded_qkv_attention(qkv, bias, None, SCALE, H, mesh)
    seed = jnp.zeros((1,), jnp.int32)
    ref = FA.fused_qkv_attention(qkv, bias, None, seed, SCALE, H, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_seq_sharded_attention_grads_match_unsharded():
    """Backward through shard_map: dkv rides the all-gather transpose
    (reduce-scatter); dbias sums across the data axis."""
    n = 16
    mesh = _seq_mesh()
    qkv = jax.random.normal(jax.random.PRNGKey(0), (4, n, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(1), (H, n, n)) * 0.1
    q_b = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.3
    v_b = jax.random.normal(jax.random.PRNGKey(3), (C,)) * 0.3
    qvb = jnp.stack([q_b, jnp.zeros_like(q_b), v_b], axis=0)
    seed = jnp.zeros((1,), jnp.int32)

    g_s = jax.grad(
        lambda q, b, qb: jnp.sum(
            FA.seq_sharded_qkv_attention(q, b, qb, SCALE, H, mesh) ** 2
        ),
        argnums=(0, 1, 2),
    )(qkv, bias, qvb)
    g_r = jax.grad(
        lambda q, b, qb: jnp.sum(
            FA.fused_qkv_attention(q, b, qb, seed, SCALE, H, 0.0) ** 2
        ),
        argnums=(0, 1, 2),
    )(qkv, bias, qvb)
    for a, b_ in zip(g_s, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
        )


@pytest.mark.parametrize("with_bias", [False, True])
def test_seq_sharded_attention_odd_n_no_dense_mask(with_bias):
    """Odd N (pad-to-multiple path): the wrapper pads QUERY rows only and
    slices the gathered kv back to the real keys — exactness without ever
    materializing a dense [H, n_pad, n_pad] mask bias (round-3 ADVICE:
    ~67MB at N=1025). Forward and grads vs the unsharded kernel."""
    n = 13  # odd, not divisible by the seq axis (2)
    mesh = _seq_mesh()
    qkv = jax.random.normal(jax.random.PRNGKey(0), (4, n, 3 * C))
    bias = (
        jax.random.normal(jax.random.PRNGKey(1), (H, n, n)) * 0.1
        if with_bias else None
    )
    seed = jnp.zeros((1,), jnp.int32)
    out = FA.seq_sharded_qkv_attention(qkv, bias, None, SCALE, H, mesh)
    ref = FA.fused_qkv_attention(qkv, bias, None, seed, SCALE, H, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    if with_bias:
        g_s = jax.grad(
            lambda q, b: jnp.sum(
                FA.seq_sharded_qkv_attention(q, b, None, SCALE, H, mesh) ** 2
            ),
            argnums=(0, 1),
        )(qkv, bias)
        g_r = jax.grad(
            lambda q, b: jnp.sum(
                FA.fused_qkv_attention(q, b, None, seed, SCALE, H, 0.0) ** 2
            ),
            argnums=(0, 1),
        )(qkv, bias)
        for a, b_ in zip(g_s, g_r):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
            )


def test_vmem_budget_env_controls_batch_block(monkeypatch):
    """UVIT_ATTN_VMEM_BUDGET_MB raises the batch-block cap in lockstep with
    --xla_tpu_scoped_vmem_limit_kib (tools/bench_vmem_blocks.py). At
    ViT-B/224 shapes the default budget (14.5MB ≈ Mosaic's default scoped
    limit) must keep the measured round-2 choices (fwd 4 / bwd 2 — bb=4
    backward fails to compile at the default limit); budget 30 (32MiB limit)
    unlocks fwd 8 / bwd 4, budget 56 (64MiB) fwd 16 / bwd 8."""
    n, group, hd = 197, 12, 64
    lanes = group * hd
    monkeypatch.delenv("UVIT_ATTN_VMEM_BUDGET_MB", raising=False)
    assert FA._fwd_bwd_blocks(160, n, lanes, group, 0.0) == (4, 2)
    monkeypatch.setenv("UVIT_ATTN_VMEM_BUDGET_MB", "30")
    assert FA._fwd_bwd_blocks(160, n, lanes, group, 0.0) == (8, 4)
    monkeypatch.setenv("UVIT_ATTN_VMEM_BUDGET_MB", "56")
    assert FA._fwd_bwd_blocks(160, n, lanes, group, 0.0) == (16, 8)
    # unparseable env falls back to the default budget
    monkeypatch.setenv("UVIT_ATTN_VMEM_BUDGET_MB", "not-a-number")
    assert FA._fwd_bwd_blocks(160, n, lanes, group, 0.0) == (4, 2)
    # with in-kernel dropout fwd/bwd must share a block (prng replay)
    monkeypatch.setenv("UVIT_ATTN_VMEM_BUDGET_MB", "30")
    assert FA._fwd_bwd_blocks(160, n, lanes, group, 0.1) == (4, 4)


def test_fused_kernel_correct_at_batch_block_16():
    """bb=16 (the candidate the raised-VMEM configs unlock) must be a pure
    tiling change: fwd and bwd match naive on a 16-image block."""
    b = 16
    assert FA._fwd_bwd_blocks(b, N, 128, 4, 0.0)[0] == 16  # tiny shapes fit
    qkv = jax.random.normal(jax.random.PRNGKey(2), (b, N, 3 * C))
    bias = jax.random.normal(jax.random.PRNGKey(3), (H, N, N)) * 0.1
    seed = jnp.zeros((1,), jnp.int32)

    def naive_b(q3, bi):
        r = q3.reshape(b, N, 3, H, D)
        q, k, v = [jnp.moveaxis(r[:, :, i], 1, 2) for i in range(3)]
        out = naive_attention(q, k, v, SCALE, bi)
        return jnp.moveaxis(out, 1, 2).reshape(b, N, C)

    out = FA.fused_qkv_attention(qkv, bias, None, seed, SCALE, H, 0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive_b(qkv, bias)), rtol=1e-4, atol=1e-5
    )
    g_f = jax.grad(
        lambda q, bi: jnp.sum(
            FA.fused_qkv_attention(q, bi, None, seed, SCALE, H, 0.0) ** 2
        ),
        argnums=(0, 1),
    )(qkv, bias)
    g_r = jax.grad(
        lambda q, bi: jnp.sum(naive_b(q, bi) ** 2), argnums=(0, 1)
    )(qkv, bias)
    for a, r in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-3, atol=1e-4
        )


def test_vmem_budget_scales_head_group(monkeypatch):
    """The head-group budget scales with UVIT_ATTN_VMEM_BUDGET_MB (×6/14.5,
    so the default stays exactly the tuned 6MB): at N=577 the default pins
    group=2; budget 30 admits group=6 — the per-program amortization the
    224 shapes already get (group=12 beat group=2 by 1.5× at 224)."""
    monkeypatch.delenv("UVIT_ATTN_VMEM_BUDGET_MB", raising=False)
    assert FA._head_group(64, 12, 577) == 2
    assert FA._head_group(64, 12, 197) == 12
    monkeypatch.setenv("UVIT_ATTN_VMEM_BUDGET_MB", "30")
    assert FA._head_group(64, 12, 577) == 6
    # 224 shapes already max out the group; unchanged
    assert FA._head_group(64, 12, 197) == 12


def test_train_path_auto_raise(monkeypatch):
    """At shapes where the default budget pins the head group (N=577), the
    TRAIN path (want_lse fwd + bwd) automatically uses
    TRAIN_PINNED_BUDGET_MB (measured: B/384 fwd+bwd −5.7%, L/384 −2.3%,
    exact parity; eval fwd measured SLOWER raised, so eval keeps the
    default). Env override and the kill switch both disable the raise."""
    monkeypatch.delenv("UVIT_ATTN_VMEM_BUDGET_MB", raising=False)
    assert FA._train_raise(64, 12, 577) and FA._train_raise(64, 16, 577)
    assert not FA._train_raise(64, 12, 197)  # 224: group already maxed
    assert FA._head_group(64, 12, 577, raised=True) == 6
    assert FA._head_group(64, 16, 577, raised=True) == 4
    # explicit env override wins over the automatic raise (train AND eval)
    monkeypatch.setenv("UVIT_ATTN_VMEM_BUDGET_MB", "14.5")
    assert not FA._train_raise(64, 12, 577)
    monkeypatch.delenv("UVIT_ATTN_VMEM_BUDGET_MB", raising=False)
    monkeypatch.setattr(FA, "TRAIN_PINNED_BUDGET_MB", 0.0)
    assert not FA._train_raise(64, 12, 577)
