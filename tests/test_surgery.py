"""Finetune surgery features: block truncation, final-norm removal,
linear-probe freezing."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.cli import finetune as FT
from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.train.optim import freeze_all_except, make_optimizer
from uncertainty_vit_tpu.train import schedules

TINY = ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=4, num_heads=2,
                 num_classes=5, use_flash_attention=False)


def test_remove_final_norm():
    cfg = TINY.replace(remove_final_norm=True)
    model = VisionTransformer(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert "fc_norm" not in params and "norm" not in params
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 5)


def test_target_layer_truncation_via_import():
    """Import a depth-4 checkpoint into a depth-2 (truncated) model: the
    surviving blocks load, the extra block keys are reported unused."""
    from uncertainty_vit_tpu.utils import checkpoint as C

    full = VisionTransformer(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    sd = C.export_torch_state_dict(full.init(jax.random.PRNGKey(0), x)["params"])

    trunc = VisionTransformer(cfg=TINY.replace(depth=2))
    template = trunc.init(jax.random.PRNGKey(2), x)["params"]
    imported, missing, unused = C.import_torch_params(sd, template)
    assert any(k.startswith("blocks.2") for k in unused)
    assert any(k.startswith("blocks.3") for k in unused)
    np.testing.assert_array_equal(
        np.asarray(imported["backbone"]["blocks_1"]["attn"]["qkv_kernel"]),
        sd["blocks.1.attn.qkv.weight"].T,
    )


def test_freeze_all_except():
    model = VisionTransformer(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(params, schedules.constant_schedule(1e-2))
    tx = freeze_all_except(tx, params, ["head"])
    state = tx.init(params)

    import optax

    def loss_fn(p):
        logits = model.apply({"params": p}, x)
        return jnp.mean(logits**2)

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)

    # head moved, backbone untouched
    assert not np.allclose(np.asarray(new_params["head"]["kernel"]),
                           np.asarray(params["head"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["blocks_0"]["attn"]["qkv_kernel"]),
        np.asarray(params["backbone"]["blocks_0"]["attn"]["qkv_kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["fc_norm"]["scale"]),
        np.asarray(params["fc_norm"]["scale"]),
    )
