"""Tests for the stochastic (dist) mean+covariance transformer and engines."""

import numpy as np

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.dist_vit import DistCyclicalViT, DistVisionTransformer
from uncertainty_vit_tpu.train import schedules
from uncertainty_vit_tpu.train.engine_cyclical import (
    CyclicalHParams, CyclicalState, make_cyclical_train_step,
)
from uncertainty_vit_tpu.train.engine_finetune_dist import (
    DistFinetuneHParams, init_dist_finetune_state, make_dist_finetune_train_step,
)
from uncertainty_vit_tpu.train.optim import make_optimizer

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
    num_classes=5, init_values=0.1, use_shared_rel_pos_bias=True,
    use_flash_attention=False,
)


def test_dist_finetune_forward():
    model = DistVisionTransformer(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    mean, cov, logits = model.apply(params, x)
    assert mean.shape == (2, 16) and cov.shape == (2, 16) and logits.shape == (2, 5)
    for t in (mean, cov, logits):
        assert np.isfinite(np.asarray(t)).all()
    # dual streams: separate patch embeds and cls tokens exist
    p = params["params"]["backbone"]
    assert "cov_patch_embed" in p and "cov_cls_token" in p
    # shared qkv weights between streams, separate cov biases
    attn = p["blocks_0"]["attn"]
    assert "qkv_kernel" in attn and "cov_q_bias" in attn and "cov_proj" in attn


def test_dist_attention_cov_nonneg_path():
    """The cov value stream is ELU+1 rectified (≥0) and attends with attn²;
    with nonnegative cov inputs the attended cov stays nonnegative before the
    projection."""
    model = DistCyclicalViT(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    mask = jnp.zeros((2, TINY.num_patches)).at[:, 0].set(1.0)
    params = model.init(jax.random.PRNGKey(0), x, mask)
    mean_out, cov_out = model.apply(params, x, mask)
    assert mean_out.shape == (2, TINY.num_patches, 16)
    assert cov_out.shape == (2, TINY.num_patches, 16)


def test_dist_cyclical_modes():
    model = DistCyclicalViT(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    mask = jnp.zeros((2, TINY.num_patches)).at[:, 1].set(1.0)
    params = model.init(jax.random.PRNGKey(0), x, mask)
    mean_z, cov_z = model.apply(params, x, None, layer_results="end")
    assert len(mean_z) == TINY.depth and len(cov_z) == TINY.depth
    assert mean_z[0].shape == (2, TINY.num_patches, 16)


def test_stochastic_cyclical_train_step():
    model = DistCyclicalViT(cfg=TINY)
    hp = CyclicalHParams(target_layers=(0, 1), stochastic=True, ema_start_at=5)
    lr = schedules.constant_schedule(1e-3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    mask = jnp.zeros((4, TINY.num_patches)).at[:, :2].set(1.0)

    params = model.init(jax.random.PRNGKey(0), x, mask)["params"]
    tx = make_optimizer(params, lr, weight_decay=0.05, clip_grad=3.0)
    state = CyclicalState(
        params=params, opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros([], jnp.int32),
    )
    step = make_cyclical_train_step(model, tx, hp, lr, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, x, mask, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_dist_finetune_train_step():
    model = DistVisionTransformer(cfg=TINY)
    hp = DistFinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0)
    lr = schedules.constant_schedule(1e-3)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    pos = img + 0.01
    neg = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    labels = jnp.arange(4) % 5

    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), img)["params"], lr, weight_decay=0.05
    )
    state = init_dist_finetune_state(model, tx, jax.random.PRNGKey(0), img)
    step = make_dist_finetune_train_step(model, tx, hp, lr)
    losses = []
    for _ in range(8):
        state, m = step(state, img, pos, neg, labels, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    assert float(m["wasserstein_loss"]) >= 0.0
