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


def test_dist_fused_hooks_must_pair():
    import pytest

    model = DistVisionTransformer(cfg=TINY)
    hp = DistFinetuneHParams(num_classes=5)
    lr = schedules.constant_schedule(1e-3)
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), sample)["params"], lr, weight_decay=0.0
    )
    with pytest.raises(ValueError, match="together"):
        make_dist_finetune_train_step(model, tx, hp, lr, aug_fn=lambda k, x: x)


def test_dist_finetune_step_fused_triplet_prep():
    """Round-4 triplet loop fusion: the step takes RAW uint8 triplets; the
    anchor aug + pos/neg eval transforms run in-graph and must reproduce
    the split-dispatch step exactly (same draws, same math)."""
    model = DistVisionTransformer(cfg=TINY)
    hp = DistFinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0)
    lr = schedules.constant_schedule(1e-3)
    rs = np.random.RandomState(0)
    img_u8 = jnp.asarray(rs.randint(0, 256, (4, 32, 32, 3), np.uint8))
    pos_u8 = jnp.asarray(rs.randint(0, 256, (4, 32, 32, 3), np.uint8))
    neg_u8 = jnp.asarray(rs.randint(0, 256, (4, 32, 32, 3), np.uint8))
    labels = jnp.arange(4) % 5

    from uncertainty_vit_tpu.ops.augment import (
        IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD, normalize, to_float,
    )

    prep = lambda u8: normalize(
        to_float(u8), IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD)

    def aug(k, u8):  # deterministic "augmentation" for exact parity
        return prep(u8)

    sample = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3))
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), sample)["params"], lr, weight_decay=0.05
    )
    s0 = init_dist_finetune_state(model, tx, jax.random.PRNGKey(0), sample)

    fused = make_dist_finetune_train_step(
        model, tx, hp, lr, aug_fn=aug, prep_fn=prep)
    split = make_dist_finetune_train_step(model, tx, hp, lr)

    s_f, m_f = fused(s0, img_u8, pos_u8, neg_u8, labels, jax.random.PRNGKey(3))
    s0b = init_dist_finetune_state(model, tx, jax.random.PRNGKey(0), sample)
    s_s, m_s = split(
        s0b, prep(img_u8), prep(pos_u8), prep(neg_u8), labels,
        jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_s["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.params),
                    jax.tree_util.tree_leaves(s_s.params)):
        # in-graph prep lets XLA fuse differently → f32 summation-order
        # noise at the 1e-6 level; the draws/math are identical
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
