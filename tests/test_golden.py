"""Frozen golden-value regression tests.

tests/golden/model_outputs_v1.npz holds CPU f32 outputs of the three model
families at fixed seeds. Any future refactor that changes initialization
order, layer math, or rng plumbing will trip these — update the goldens only
with a deliberate, explained regeneration (see the generation snippet in the
git history of this file's commit).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.cyclical import CyclicalViT
from uncertainty_vit_tpu.models.dist_vit import DistVisionTransformer
from uncertainty_vit_tpu.models.vit import VisionTransformer

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "model_outputs_v1.npz"))

CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
                num_classes=5, use_shared_rel_pos_bias=True, init_values=0.1,
                use_flash_attention=False)
X = jax.random.normal(jax.random.PRNGKey(42), (2, 32, 32, 3))


def test_finetune_golden():
    m = VisionTransformer(cfg=CFG)
    p = m.init(jax.random.PRNGKey(7), X)
    np.testing.assert_allclose(
        np.asarray(m.apply(p, X)), GOLDEN["finetune_logits"], rtol=1e-5, atol=1e-6
    )


def test_cyclical_golden():
    m = CyclicalViT(cfg=CFG.replace(head_type="none"))
    mask = jnp.zeros((2, 4)).at[:, :2].set(1.0)
    p = m.init(jax.random.PRNGKey(7), X, mask)
    np.testing.assert_allclose(
        np.asarray(m.apply(p, X, mask)), GOLDEN["cyclical_student"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m.apply(p, X, None, layer_results="end")[-1]),
        GOLDEN["cyclical_teacher_last"], rtol=1e-5, atol=1e-6,
    )


def test_dist_golden():
    m = DistVisionTransformer(cfg=CFG)
    p = m.init(jax.random.PRNGKey(7), X)
    mean, cov, logits = m.apply(p, X)
    np.testing.assert_allclose(np.asarray(mean), GOLDEN["dist_mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), GOLDEN["dist_cov"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits), GOLDEN["dist_logits"], rtol=1e-5, atol=1e-6)
