"""Engine-level sequence-parallel coverage (SURVEY §5.7).

Runs the MODEL (not just the kernel) with a data × seq × model mesh on the
virtual 8-device CPU suite: token activations carry a
with_sharding_constraint over ('data', 'seq'), and the attention kernel path
(interpreter mode) partitions through its shard_map wrapper with the k/v
all-gather. Equivalence vs the unsharded model is exact up to float
reassociation. The tiny config's N = 5 tokens is odd, so the wrapper's
pad-to-multiple path (zero queries, −1e9-masked keys) is exercised too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import uncertainty_vit_tpu.ops.flash_attention as FA
from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.parallel import mesh as pmesh


@pytest.fixture(autouse=True)
def interpret_mode():
    FA.INTERPRET = True
    yield
    FA.INTERPRET = False


CFG = ViTConfig(
    img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
    num_classes=5, mlp_ratio=2.0, drop_path_rate=0.0, drop_rate=0.0,
    attn_drop_rate=0.0, use_flash_attention=True,
)


def _mesh():
    return pmesh.create_mesh(8, model_parallel=2, seq_parallel=2)


def test_seq_sharded_model_forward_matches_unsharded():
    mesh = _mesh()
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    plain = VisionTransformer(cfg=CFG)
    params = plain.init(jax.random.PRNGKey(0), images)["params"]
    ref = plain.apply({"params": params}, images)

    sharded = VisionTransformer(cfg=CFG, seq_mesh=mesh)
    images_s = pmesh.shard_batch(images, mesh)
    out = jax.jit(
        lambda p, im: sharded.apply({"params": p}, im)
    )(params, images_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_seq_sharded_train_step_matches_unsharded():
    """One finetune train step with the seq-sharded model reproduces the
    unsharded loss and parameter update (droppath off so rngs are
    layout-independent)."""
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, init_finetune_state, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    mesh = _mesh()
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5
    hp = FinetuneHParams(num_classes=5, mixup_active=False,
                         label_smoothing=0.0, num_patches=CFG.num_patches)
    lr = schedules.constant_schedule(1e-3)

    results = []
    for seq_mesh, ims in ((None, images), (mesh, pmesh.shard_batch(images, mesh))):
        model = VisionTransformer(cfg=CFG, seq_mesh=seq_mesh)
        tx = make_optimizer(
            model.init(jax.random.PRNGKey(0), images)["params"], lr,
            weight_decay=0.0,
        )
        state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
        step = make_finetune_train_step(model, tx, hp, lr)
        state, metrics = step(state, ims, labels, jax.random.PRNGKey(3))
        results.append((float(metrics["loss"]), state.params))

    (loss_ref, p_ref), (loss_s, p_s) = results
    assert abs(loss_ref - loss_s) < 1e-5, (loss_ref, loss_s)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
