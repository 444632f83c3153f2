"""Correctness tests for the int8 quantized-matmul training path
(ops/quant.py), run through the Pallas interpreter on the CPU suite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops import quant as Q

pytestmark = pytest.mark.usefixtures("quant_interpret")


@pytest.fixture()
def quant_interpret(monkeypatch):
    monkeypatch.setattr(Q, "INTERPRET", True)


def _emulated_fwd(x, w, bias):
    """NumPy reference of the kernel's exact quantized arithmetic."""
    xf = np.asarray(x, np.float32)
    wf = np.asarray(w, np.float32)
    wa = np.maximum(np.abs(wf).max(axis=0, keepdims=True), 1e-30)
    ws = wa / 127.0
    wq = np.round(wf / ws)
    xa = np.maximum(np.abs(xf).max(axis=1, keepdims=True), 1e-30)
    xq = np.round(xf * (127.0 / xa))
    y = (xq @ wq) * (xa / 127.0) * ws
    if bias is not None:
        y = y + np.asarray(bias, np.float32)
    return y


def test_int8_dense_forward_matches_emulation():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(64, 128), jnp.float32)
    w = jnp.asarray(rs.randn(128, 256) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(256) * 0.1, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    y = np.asarray(Q.int8_dense(x, w, b, seed), np.float32)
    ref = _emulated_fwd(x, w, b)
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)

    # and the quantized result approximates the exact matmul (~1% of scale)
    exact = np.asarray(x, np.float32) @ np.asarray(w, np.float32) + np.asarray(b)
    err = np.abs(y - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 0.02, err


def test_int8_dense_forward_3d_and_no_bias():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 32, 128), jnp.float32)
    w = jnp.asarray(rs.randn(128, 128) * 0.05, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    y = Q.int8_dense(x, w, None, seed)
    assert y.shape == (2, 32, 128)
    ref = _emulated_fwd(np.asarray(x).reshape(-1, 128), w, None).reshape(2, 32, 128)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_int8_dense_gradients_approximate_exact():
    """dx/dw/db vs the exact f32 linear layer: quantization noise only
    (a few % relative); db is exact (computed in f32)."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(64, 128), jnp.float32)
    w = jnp.asarray(rs.randn(128, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    t = jnp.asarray(rs.randn(64, 128), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)

    def loss_q(x, w, b):
        return ((Q.int8_dense(x, w, b, seed) - t) ** 2).mean()

    def loss_f(x, w, b):
        return (((x @ w + b) - t) ** 2).mean()

    gq = jax.grad(loss_q, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, b)

    for q, f, tol, name in ((gq[0], gf[0], 0.12, "dx"), (gq[1], gf[1], 0.12, "dw"),
                            (gq[2], gf[2], 0.12, "db")):
        rel = float(jnp.linalg.norm(q - f) / (jnp.linalg.norm(f) + 1e-9))
        assert rel < tol, (name, rel)
    # db is the EXACT f32 row-sum of the quantized path's own upstream
    # gradient 2·(y_q − t)/numel (it differs from the f32 path's db only
    # through the forward quantization noise in y_q)
    y_q = Q.int8_dense(x, w, b, seed)
    g_up = 2.0 * (y_q - t) / t.size
    np.testing.assert_allclose(
        np.asarray(gq[2]), np.asarray(g_up.sum(axis=0)), rtol=1e-4, atol=1e-7
    )


def test_wgrad_stochastic_rounding_is_unbiased():
    """Averaging int8 wgrad over many SR seeds must converge to the
    (column-quantized-x) reference — plain round-to-nearest would leave a
    systematic bias for small gradient entries."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(32, 128), jnp.float32)
    # gradients much smaller than their column amax → heavy rounding regime
    g = jnp.asarray(rs.randn(32, 128) * 0.01, jnp.float32)
    g = g.at[0, 0].set(1.0)  # sets a large column amax for column 0

    dws = []
    for s in range(200):
        dws.append(np.asarray(Q._wgrad(x, g, jnp.asarray([s], jnp.int32))))
    mean_dw = np.mean(dws, axis=0)

    xf = np.asarray(x, np.float32)
    sxa = np.maximum(np.abs(xf).max(axis=0, keepdims=True), 1e-30) / 127.0
    xq = np.round(xf / sxa)
    ref = (xq * sxa).T @ np.asarray(g, np.float32)
    rel = np.linalg.norm(mean_dw - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_int8_xla_mode_matches_emulation(monkeypatch):
    """The XLA-native implementation (quantize passes + int8 dot_general)
    computes the same forward arithmetic as the Pallas kernel, and its
    backward approximates the exact grads."""
    monkeypatch.setattr(Q, "FWD", "xla")
    monkeypatch.setattr(Q, "DGRAD", "xla")
    monkeypatch.setattr(Q, "WGRAD", "xla")
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(64, 128), jnp.float32)
    w = jnp.asarray(rs.randn(128, 256) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(256) * 0.1, jnp.float32)
    seed = jnp.asarray([3], jnp.int32)

    y = np.asarray(Q.int8_dense(x, w, b, seed), np.float32)
    np.testing.assert_allclose(y, _emulated_fwd(x, w, b), rtol=2e-5, atol=2e-5)

    t = jnp.asarray(rs.randn(64, 256), jnp.float32)

    def loss_q(x, w, b):
        return ((Q.int8_dense(x, w, b, seed) - t) ** 2).mean()

    def loss_f(x, w, b):
        return (((x @ w + b) - t) ** 2).mean()

    gq = jax.grad(loss_q, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, b)
    for q, f, name in ((gq[0], gf[0], "dx"), (gq[1], gf[1], "dw"),
                       (gq[2], gf[2], "db")):
        rel = float(jnp.linalg.norm(q - f) / (jnp.linalg.norm(f) + 1e-9))
        assert rel < 0.12, (name, rel)


def test_model_quant_flag_end_to_end():
    """A tiny quant='int8' ViT trains: loss decreases and params update
    (interpret-mode kernels; lane-aligned dims required)."""
    import optax

    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, init_finetune_state, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_classes=5, use_flash_attention=False, quant="int8",
        mlp_ratio=2.0,
    )
    model = VisionTransformer(cfg=cfg)
    hp = FinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0,
                         num_patches=cfg.num_patches)
    lr = schedules.constant_schedule(1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), images)["params"], lr,
        weight_decay=0.0,
    )
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    step = make_finetune_train_step(model, tx, hp, lr)
    losses = []
    for _ in range(10):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.1, losses
