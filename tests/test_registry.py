"""Model registry + embeddings utility tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.models.registry import MODEL_NAMES, create_model, sngp_reset_cov
from uncertainty_vit_tpu.utils.embeddings import pca_2d, visualize_embedding


def test_registry_names_resolve():
    for name in MODEL_NAMES:
        model, cfg = create_model(name)
        assert cfg.patch_size == 16
    _, cfg_l = create_model("beit_large_patch16_384")
    assert cfg_l.embed_dim == 1024 and cfg_l.img_size == 384
    _, cfg_h = create_model("beit_huge_patch16_224")
    assert cfg_h.depth == 32


def test_registry_families():
    from uncertainty_vit_tpu.models.cyclical import CyclicalViT
    from uncertainty_vit_tpu.models.dist_vit import DistCyclicalViT, DistVisionTransformer
    from uncertainty_vit_tpu.models.mim import JointViT, MIMViT
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    assert isinstance(create_model("beit_base_patch16_224")[0], VisionTransformer)
    assert isinstance(create_model("beit_base_patch16_224_8k_vocab")[0], MIMViT)
    assert isinstance(create_model("beit_base_joint_patch16_224")[0], JointViT)
    assert isinstance(create_model("dist_beit_base_patch16_224")[0], DistVisionTransformer)
    assert isinstance(
        create_model("beit_base_patch16_224", family="cyclical")[0], CyclicalViT
    )
    assert isinstance(
        create_model("dist_beit_base_patch16_224", family="cyclical")[0], DistCyclicalViT
    )


def test_sngp_reset_cov():
    state = {"head": {"precision_matrix": jnp.full((4, 4), 7.0)},
             "other": jnp.ones((3,))}
    out = sngp_reset_cov(state, ridge_penalty=0.5)
    np.testing.assert_allclose(np.asarray(out["head"]["precision_matrix"]),
                               0.5 * np.eye(4))
    np.testing.assert_allclose(np.asarray(out["other"]), 1.0)


def test_visualize_embedding(tmp_path):
    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2,
                    num_heads=2, num_classes=5, use_flash_attention=False)
    model = VisionTransformer(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    batches = [(np.asarray(x[:4]), np.arange(4)), (np.asarray(x[4:]), np.arange(4))]
    out_dir = visualize_embedding(model, variables, batches, str(tmp_path), max_items=6)
    feats = np.loadtxt(os.path.join(out_dir, "embeddings.tsv"))
    labels = np.loadtxt(os.path.join(out_dir, "embeddings_labels.tsv"))
    assert feats.shape == (6, 16) and labels.shape == (6,)
    xy = pca_2d(feats)
    assert xy.shape == (6, 2)
