"""Tests for BEiT MIM / joint models, the dVAE tokenizer, and their engines."""

import numpy as np

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.dvae import DiscreteVAE
from uncertainty_vit_tpu.models.mim import JointViT, MIMViT
from uncertainty_vit_tpu.train import schedules
from uncertainty_vit_tpu.train.engine_cyclical import CyclicalState
from uncertainty_vit_tpu.train.engine_mim import (
    JointHParams, MIMState, make_joint_train_step, make_mim_train_step,
)
from uncertainty_vit_tpu.train.optim import make_optimizer

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
    use_flash_attention=False,
)
VOCAB = 64


def small_dvae():
    # 32×32 images, 2 layers → 8×8 = 64 tokens? (32/4=8); use num_layers=2
    return DiscreteVAE(image_size=32, num_tokens=VOCAB, codebook_dim=16,
                       num_layers=2, hidden_dim=8)


def test_dvae_tokenize_and_decode():
    dvae = small_dvae()
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = dvae.init(jax.random.PRNGKey(0), imgs)
    codes = dvae.apply(variables, imgs, method=dvae.get_codebook_indices)
    assert codes.shape == (2, 64)  # 8×8 grid
    assert codes.dtype == jnp.int32
    assert 0 <= int(codes.min()) and int(codes.max()) < VOCAB

    recon = dvae.apply(variables, codes.reshape(2, 8, 8), method=dvae.decode_codes)
    assert recon.shape == (2, 32, 32, 3)

    recon2, logits = dvae.apply(variables, imgs, rngs={"gumbel": jax.random.PRNGKey(2)})
    assert recon2.shape == (2, 32, 32, 3) and logits.shape == (2, 8, 8, VOCAB)


def test_mim_forward_and_train_step():
    model = MIMViT(cfg=TINY, vocab_size=VOCAB)
    dvae = small_dvae()
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    vae_imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 3))
    # note: tiny config has 4 patches but the dvae grid is 64 tokens; use a
    # mask over the dvae token grid size for the CE (shapes must agree) — in
    # the real recipe both are 14×14. Here fake it with 4 tokens:
    mask = jnp.asarray([[1.0, 0.0, 1.0, 0.0]] * 4)

    params = model.init(jax.random.PRNGKey(0), imgs, mask)["params"]
    logits = model.apply({"params": params}, imgs, mask)
    assert logits.shape == (4, TINY.num_patches, VOCAB)

    # engine with a dvae producing 4-token grids: patch the ids by slicing
    dvae_vars = dvae.init(jax.random.PRNGKey(0), vae_imgs)

    class SliceDVAE:
        def apply(self, variables, images, method=None):
            ids = dvae.apply(variables, images, method=dvae.get_codebook_indices)
            return ids[:, : TINY.num_patches]

        get_codebook_indices = "get_codebook_indices"

    lr = schedules.constant_schedule(1e-3)
    tx = make_optimizer(params, lr, weight_decay=0.05)
    state = MIMState(params=params, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32))
    step = make_mim_train_step(model, SliceDVAE(), dvae_vars, tx, lr)
    losses = []
    for _ in range(8):
        state, m = step(state, imgs, vae_imgs, mask, jax.random.PRNGKey(5))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(m["mlm_acc"]) <= 1.0


def test_joint_forward_and_train_step():
    model = JointViT(cfg=TINY, vocab_size=VOCAB)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    vae_imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 3))
    mask = jnp.asarray([[1.0, 0.0, 1.0, 0.0]] * 4)

    params = model.init(jax.random.PRNGKey(0), imgs, mask)["params"]
    lm_out, beit_out = model.apply({"params": params}, imgs, mask)
    assert lm_out.shape == (4, TINY.num_patches, 16)
    assert beit_out.shape == (4, TINY.num_patches, VOCAB)
    zs = model.apply({"params": params}, imgs, None, layer_results="end")
    assert len(zs) == TINY.depth

    dvae = small_dvae()
    dvae_vars = dvae.init(jax.random.PRNGKey(0), vae_imgs)

    class SliceDVAE:
        def apply(self, variables, images, method=None):
            ids = dvae.apply(variables, images, method=dvae.get_codebook_indices)
            return ids[:, : TINY.num_patches]

        get_codebook_indices = "get_codebook_indices"

    hp = JointHParams(target_layers=(0, 1), vae_loss_weight_anneal_epochs=10.0)
    lr = schedules.constant_schedule(1e-3)
    tx = make_optimizer(params, lr, weight_decay=0.05)
    state = CyclicalState(
        params=params, opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros([], jnp.int32),
    )
    step = make_joint_train_step(model, SliceDVAE(), dvae_vars, tx, hp, lr)
    state, m0 = step(state, imgs, vae_imgs, mask, jnp.float32(0.0), jax.random.PRNGKey(5))
    # epoch 0 → beit weight 1.0; epoch 20 (> anneal) → 0.0
    np.testing.assert_allclose(float(m0["beit_weight"]), 1.0)
    state, m20 = step(state, imgs, vae_imgs, mask, jnp.float32(20.0), jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m20["beit_weight"]), 0.0)
    assert np.isfinite(float(m20["loss"]))
