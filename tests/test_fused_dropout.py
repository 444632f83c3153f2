"""Fused in-kernel-PRNG dropout (ops/dropout.py — VERDICT r4 item 10).

The kernel itself needs the TPU hardware PRNG (no CPU/interpreter
lowering), so value/statistics checks are TPU-gated like
test_flash_attention's in-kernel dropout test; the routing contract —
FUSED off by default, CPU always falls back to nn.Dropout, shape gate —
runs everywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops import dropout as DO


def test_fused_off_by_default():
    assert DO.FUSED is False


def test_supported_gate_cpu():
    # on the CPU suite the backend gate must refuse regardless of shape
    x = jnp.zeros((4, 128))
    assert DO.supported(x) == (jax.default_backend() == "tpu")
    assert not DO.supported(jnp.zeros((4, 100)))
    assert not DO.supported(jnp.zeros((128,)))


def test_mlp_falls_back_to_nn_dropout_when_fused_unsupported():
    """FUSED=True on CPU must still produce working (XLA) dropout through
    models.layers._dropout — the gate, not the caller, decides."""
    from uncertainty_vit_tpu.models.layers import Mlp

    mlp = Mlp(hidden_dim=64, out_dim=32, drop=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 32))
    params = mlp.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, deterministic=False,
    )["params"]
    try:
        DO.FUSED = True
        out = mlp.apply(
            {"params": params}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
    finally:
        DO.FUSED = False
    assert np.isfinite(np.asarray(out)).all()
    # ~half the outputs dropped exactly to zero by the fallback path
    zero_frac = float((np.asarray(out) == 0.0).mean())
    assert 0.3 < zero_frac < 0.7, zero_frac


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_random_bits has no CPU interpreter lowering",
)
def test_fused_dropout_statistics_tpu():
    """Keep fraction ≈ 1-rate, kept values scaled by 1/(1-rate), masks
    independent across grid blocks and rng keys, deterministic per key."""
    rate = 0.3
    x = jnp.ones((4096, 256), jnp.float32)
    rng = jax.random.PRNGKey(0)
    y = np.asarray(DO.fused_dropout(x, rate, rng))
    kept = y != 0.0
    assert abs(kept.mean() - (1 - rate)) < 0.02
    np.testing.assert_allclose(y[kept], 1.0 / (1 - rate), rtol=1e-6)
    # per-block keep rates all near 1-rate (blocks are reseeded, not copied)
    block_rates = kept.reshape(8, -1).mean(axis=1)
    assert np.all(np.abs(block_rates - (1 - rate)) < 0.05), block_rates
    # deterministic per key, different across keys
    y2 = np.asarray(DO.fused_dropout(x, rate, rng))
    np.testing.assert_array_equal(y, y2)
    y3 = np.asarray(DO.fused_dropout(x, rate, jax.random.PRNGKey(1)))
    assert (y != y3).any()


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_random_bits has no CPU interpreter lowering",
)
def test_mc_dropout_mean_agrees_fused_vs_xla_tpu():
    """Full-depth K-sample MC-dropout mean logits with the fused masks must
    agree with the stock lowering within MC sampling noise (different mask
    streams, same distribution)."""
    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.evals.mc_dropout import make_mc_dropout_mean_forward
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=256, depth=2,
                    num_heads=2, num_classes=5, drop_rate=0.1,
                    use_flash_attention=False)
    model = VisionTransformer(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    variables = {"params": model.init(jax.random.PRNGKey(0), x)["params"]}
    k = 64  # large K so the two mask streams' means converge
    rng = jax.random.PRNGKey(7)

    fwd = make_mc_dropout_mean_forward(model, k)
    base = np.asarray(fwd(variables, x, rng))
    try:
        DO.FUSED = True
        fused = np.asarray(
            make_mc_dropout_mean_forward(model, k)(variables, x, rng)
        )
    finally:
        DO.FUSED = False
    # logits agree to MC noise (~1/sqrt(K) of the dropout-induced spread)
    np.testing.assert_allclose(fused, base, atol=0.35, rtol=0.0)


def test_block_rows_respects_mosaic_tiling():
    """Regression (round-5 TPU ladder, stage 6): the row block must be a
    multiple of 8 sublanes or the whole array — 1MB/(768·2 B) = 682 rows
    failed Mosaic lowering at (201728, 768) bf16 (ViT-B/224 batch-1024
    MC-dropout shape)."""
    # the exact failing shape: bf16, c=768, m=1024*197
    b = DO._block_rows(201728, 768, 2)
    assert b % 8 == 0 and b * 768 * 2 <= DO._BLOCK_BYTES
    # full-array blocks are always legal, whatever the row count
    assert DO._block_rows(5, 768, 2) == 5
    assert DO._block_rows(682, 768, 2) == 682
    # f32 and the 3072 MLP widths stay sublane-aligned too
    for c, item in [(768, 4), (3072, 2), (3072, 4), (128, 2)]:
        blk = DO._block_rows(10**6, c, item)
        assert blk % 8 == 0 and blk >= 8
