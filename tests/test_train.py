"""Training-stack tests: schedules vs reference arrays, layer decay, engines
learning on tiny problems, EMA semantics, multi-device pjit step."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.cyclical import CyclicalViT
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.parallel import mesh as pmesh
from uncertainty_vit_tpu.train import schedules
from uncertainty_vit_tpu.train.ema import cyclical_ema_step
from uncertainty_vit_tpu.train.engine_cyclical import (
    CyclicalHParams, init_cyclical_state, make_cyclical_train_step,
)
from uncertainty_vit_tpu.train.engine_finetune import (
    FinetuneHParams, init_finetune_state, make_finetune_train_step,
)
from uncertainty_vit_tpu.train.optim import (
    layer_decay_scales, make_optimizer, vit_layer_id, weight_decay_mask,
)

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
    num_classes=5, use_flash_attention=False,
)


def ref_cosine_schedule(base, final, epochs, niter, warmup_epochs=0, start=0, warmup_steps=-1):
    """Reference utils.py:408-425 recomputed inline in numpy."""
    import math
    warmup_iters = warmup_epochs * niter
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    warm = np.linspace(start, base, warmup_iters) if warmup_epochs > 0 else np.array([])
    iters = np.arange(epochs * niter - warmup_iters)
    sched = np.array([
        final + 0.5 * (base - final) * (1 + math.cos(math.pi * i / len(iters))) for i in iters
    ])
    return np.concatenate((warm, sched))


def test_cosine_schedule_matches_reference():
    base, final, epochs, niter, wu = 2e-3, 1e-5, 10, 7, 2
    ref = ref_cosine_schedule(base, final, epochs, niter, warmup_epochs=wu)
    ours = schedules.cosine_schedule(base, final, epochs * niter, warmup_steps=wu * niter)
    got = np.array([float(ours(s)) for s in range(epochs * niter)])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-9)


def test_tri_phase_schedule_matches_reference():
    base, final, total = 1e-3, 1e-6, 100
    warm, dec = int(0.05 * total), int(0.15 * total)
    ref = np.concatenate([
        np.linspace(0, base, warm),
        np.full(total - warm - dec, base),
        np.linspace(base, final, dec),
    ])
    ours = schedules.tri_phase_schedule(base, final, total, 0.05, 0.15)
    got = np.array([float(ours(s)) for s in range(total)])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-9)


def test_layer_ids_and_decay_scales():
    model = VisionTransformer(cfg=TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    depth = TINY.depth
    nml = depth + 2
    # spot checks of get_num_layer_for_vit semantics (optim_factory.py:33-44)
    assert vit_layer_id(("backbone", "cls_token"), nml) == 0
    assert vit_layer_id(("backbone", "patch_embed", "proj", "kernel"), nml) == 0
    assert vit_layer_id(("backbone", "blocks_0", "attn", "qkv_kernel"), nml) == 1
    assert vit_layer_id(("backbone", "blocks_1", "mlp", "fc2", "kernel"), nml) == 2
    assert vit_layer_id(("head", "kernel"), nml) == nml - 1
    assert vit_layer_id(("backbone", "rel_pos_bias", "relative_position_bias_table"), nml) == nml - 1

    scales = layer_decay_scales(params, 0.65, depth)
    flat = {
        "/".join(str(k.key) for k in path): v
        for path, v in jax.tree_util.tree_leaves_with_path(scales)
    }
    # values[i] = decay^(depth+1-i) (run_class_finetuning.py:570-571):
    # head (layer depth+1) → decay^0 == 1.0, cls (layer 0) → decay^(depth+1).
    assert flat["backbone/cls_token"] == 0.65 ** (depth + 1)
    assert flat["head/kernel"] == 1.0
    assert flat["backbone/blocks_0/attn/qkv_kernel"] == 0.65**depth


def test_weight_decay_mask():
    model = VisionTransformer(cfg=TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    mask = weight_decay_mask(params)
    flat = {
        "/".join(str(k.key) for k in path): v
        for path, v in jax.tree_util.tree_leaves_with_path(mask)
    }
    assert flat["backbone/pos_embed"] is False
    assert flat["backbone/cls_token"] is False
    assert flat["backbone/blocks_0/norm1/scale"] is False  # 1-D
    assert flat["backbone/blocks_0/attn/q_bias"] is False
    assert flat["backbone/blocks_0/attn/qkv_kernel"] is True
    assert flat["head/kernel"] is True


def test_cyclical_train_step_learns_and_ema_moves():
    model = CyclicalViT(cfg=TINY)
    hp = CyclicalHParams(target_layers=(0, 1), ema_decay=0.9, ema_decay_init=0.5, ema_start_at=5)
    lr = schedules.cosine_schedule(1e-3, 1e-5, 50, warmup_steps=5)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    mask = jnp.zeros((4, TINY.num_patches)).at[:, :2].set(1.0)

    params_rng = jax.random.PRNGKey(0)
    tx = make_optimizer(
        model.init(params_rng, images, mask)["params"], lr,
        weight_decay=0.05, clip_grad=3.0, layer_decay=None, depth=TINY.depth,
    )
    state = init_cyclical_state(model, tx, params_rng, images, mask)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    step = make_cyclical_train_step(model, tx, hp, lr, donate=False)

    losses = []
    for i in range(10):
        state, metrics = step(state, images, mask, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 10
    # EMA moved away from init but not equal to params
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    p = jax.tree_util.tree_leaves(state.params)[0]
    i0 = jax.tree_util.tree_leaves(p0)[0]
    assert not np.allclose(np.asarray(e), np.asarray(i0))
    assert not np.allclose(np.asarray(e), np.asarray(p))


def test_ema_freeze_after_lr_decay_start():
    p = {"w": jnp.ones((3,))}
    e = {"w": jnp.zeros((3,))}
    # step beyond start_lr_decay_at_step → frozen teacher
    out = cyclical_ema_step(e, p, jnp.asarray(100), 0.99, 0.9, 10, start_lr_decay_at_step=50)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    # normal update before the freeze point
    out2 = cyclical_ema_step(e, p, jnp.asarray(20), 0.99, 0.9, 10, start_lr_decay_at_step=50)
    np.testing.assert_allclose(np.asarray(out2["w"]), 0.01, rtol=1e-5)


def test_finetune_train_step_learns():
    model = VisionTransformer(cfg=TINY)
    hp = FinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0,
                         num_patches=TINY.num_patches)
    lr = schedules.constant_schedule(1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5

    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), images)["params"], lr,
        weight_decay=0.05, clip_grad=None, layer_decay=0.65, depth=TINY.depth,
    )
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    step = make_finetune_train_step(model, tx, hp, lr)

    losses = []
    for i in range(15):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.1, losses


def test_ema_and_lr_accounting_under_update_freq():
    """With update_freq=2 the reference updates EMA only on accumulation
    boundaries (engine_for_finetuning.py:110-127) and indexes the schedule in
    update units (:66). Per-mini-step EMA decay would compound to
    decay^update_freq; the logged LR would run ahead of the real one."""
    model = VisionTransformer(cfg=TINY)
    decay = 0.9
    hp = FinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0,
                         num_patches=TINY.num_patches, update_freq=2,
                         model_ema_decay=decay)
    lr = schedules.cosine_schedule(1e-3, 1e-5, 10, warmup_steps=0)  # decaying
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5

    params0 = model.init(jax.random.PRNGKey(0), images)["params"]
    tx = make_optimizer(params0, lr, weight_decay=0.0, accum_steps=2)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images,
                                use_model_ema=True)
    step = make_finetune_train_step(model, tx, hp, lr)
    ema0 = jax.tree_util.tree_map(np.asarray, state.model_ema)

    # mini-step 1: params are frozen by MultiSteps → EMA must not move
    state, m1 = step(state, images, labels, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree_util.tree_leaves(state.model_ema),
                    jax.tree_util.tree_leaves(ema0)):
        np.testing.assert_array_equal(np.asarray(a), b)
    assert float(m1["lr"]) == pytest.approx(float(lr(0)))

    # mini-step 2 (boundary): exactly ONE decay toward the updated params
    state, m2 = step(state, images, labels, jax.random.PRNGKey(3))
    assert float(m2["lr"]) == pytest.approx(float(lr(0)))
    for e, e0, p in zip(jax.tree_util.tree_leaves(state.model_ema),
                        jax.tree_util.tree_leaves(ema0),
                        jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(
            np.asarray(e), decay * e0 + (1 - decay) * np.asarray(p),
            rtol=1e-5, atol=1e-7,
        )

    # mini-steps 3-4 report the SECOND schedule value, which differs
    state, m3 = step(state, images, labels, jax.random.PRNGKey(3))
    assert float(m3["lr"]) == pytest.approx(float(lr(1)))
    assert float(lr(1)) != pytest.approx(float(lr(0)))


def test_cyclical_ema_teacher_gated_by_update_freq():
    """The EMA teacher must also hold during accumulation mini-steps and index
    its decay warmup in update units."""
    model = CyclicalViT(cfg=TINY)
    hp = CyclicalHParams(target_layers=(0, 1), ema_decay=0.9, update_freq=2)
    lr = schedules.constant_schedule(1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    mask = jnp.zeros((4, TINY.num_patches)).at[:, :2].set(1.0)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), images, mask)["params"], lr,
        weight_decay=0.0, accum_steps=2,
    )
    state = init_cyclical_state(model, tx, jax.random.PRNGKey(0), images, mask)
    step = make_cyclical_train_step(model, tx, hp, lr, donate=False)
    e0 = jax.tree_util.tree_map(np.asarray, state.ema_params)

    state, _ = step(state, images, mask, jax.random.PRNGKey(7))
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(e0)):
        np.testing.assert_array_equal(np.asarray(a), b)

    state, _ = step(state, images, mask, jax.random.PRNGKey(7))
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(e0))
    )
    assert moved


def test_finetune_step_with_mixup_runs():
    model = VisionTransformer(cfg=TINY)
    hp = FinetuneHParams(num_classes=5, mixup_active=True, num_patches=TINY.num_patches)
    lr = schedules.constant_schedule(1e-4)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5
    tx = make_optimizer(model.init(jax.random.PRNGKey(0), images)["params"], lr)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    step = make_finetune_train_step(model, tx, hp, lr)
    state, metrics = step(state, images, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_finetune_step_fused_aug():
    """aug_fn hook: the step takes the raw uint8 host batch (+optional
    valid_hw) and runs augmentation in-graph — one dispatch per step. The
    fused step must train (finite, decreasing loss) and draw different aug
    randomness on different steps."""
    from uncertainty_vit_tpu.ops.augment import finetune_train_augment_batch

    model = VisionTransformer(cfg=TINY)
    hp = FinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0,
                         num_patches=TINY.num_patches)
    lr = schedules.constant_schedule(1e-3)

    def aug(k, imgs, vhw):
        return finetune_train_augment_batch(
            k, imgs, 32, 0.4, 0.25, True, valid_hw=vhw
        )

    rs = np.random.RandomState(0)
    images_u8 = rs.randint(0, 256, (8, 40, 40, 3), np.uint8)
    labels = jnp.arange(8) % 5
    sample = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))

    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), sample)["params"], lr,
        weight_decay=0.05, clip_grad=None, layer_decay=0.65, depth=TINY.depth,
    )
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), sample)
    step = make_finetune_train_step(model, tx, hp, lr, aug_fn=aug)

    losses = []
    for _ in range(15):
        state, metrics = step(state, jnp.asarray(images_u8), labels,
                              jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # noise images under fresh per-step augmentation learn slowly; the
    # deterministic rng makes this a fixed, reproducible margin
    assert losses[-1] < losses[0] - 0.01, losses
    # same inputs, different state.step → different aug draw → loss differs
    assert len({round(l, 8) for l in losses[:3]}) > 1

    # letterboxed variant: per-sample valid extents thread through
    vhw = jnp.asarray(rs.randint(20, 41, (8, 2)), jnp.int32)
    state, metrics = step(state, jnp.asarray(images_u8), labels,
                          jax.random.PRNGKey(3), vhw)
    assert np.isfinite(float(metrics["loss"]))


def test_cyclical_step_fused_prep():
    """prep_fn hook: uint8 batch → in-graph augment + blockwise mask →
    teacher/student/update, one dispatch. Must run finite and vary the
    mask/aug draw across steps."""
    from uncertainty_vit_tpu.ops.augment import pretrain_augment_batch
    from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask

    model = CyclicalViT(cfg=TINY)
    hp = CyclicalHParams(target_layers=(0, 1))
    lr = schedules.constant_schedule(1e-3)
    grid = TINY.grid_size

    def prep(k, imgs_u8, vhw):
        ka, km = jax.random.split(k)
        images = pretrain_augment_batch(
            ka, imgs_u8, out_size=32, aug_level=-1, valid_hw=vhw
        )
        masks = batched_blockwise_mask(km, images.shape[0], grid, 4, 1, 4)
        return images, masks

    rs = np.random.RandomState(0)
    images_u8 = rs.randint(0, 256, (4, 40, 40, 3), np.uint8)
    sample = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    sample_mask = jnp.zeros((4, TINY.num_patches)).at[:, :2].set(1.0)

    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), sample, sample_mask)["params"], lr
    )
    state = init_cyclical_state(model, tx, jax.random.PRNGKey(0), sample, sample_mask)
    step = make_cyclical_train_step(model, tx, hp, lr, donate=False, prep_fn=prep)

    counts = []
    for _ in range(3):
        state, metrics = step(state, jnp.asarray(images_u8), jax.random.PRNGKey(5))
        assert np.isfinite(float(metrics["loss"]))
        counts.append(float(metrics["mask_count"]))
    # on a tiny 2×2 grid the blockwise sampler can stop short of the target
    # within its attempt budget; non-empty is the meaningful invariant here
    assert all(1 <= c <= 4 for c in counts), counts

    # letterboxed path
    vhw = jnp.asarray(rs.randint(20, 41, (4, 2)), jnp.int32)
    state, metrics = step(state, jnp.asarray(images_u8), jax.random.PRNGKey(5), vhw)
    assert np.isfinite(float(metrics["loss"]))


def test_multidevice_data_parallel_step():
    """pjit train step over the 8-device CPU mesh with data-sharded batch."""
    assert len(jax.devices()) == 8
    mesh = pmesh.create_mesh()
    model = CyclicalViT(cfg=TINY)
    hp = CyclicalHParams(target_layers=(0, 1))
    lr = schedules.constant_schedule(1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    mask = jnp.zeros((16, TINY.num_patches)).at[:, 1].set(1.0)

    tx = make_optimizer(model.init(jax.random.PRNGKey(0), images, mask)["params"], lr)
    state = init_cyclical_state(model, tx, jax.random.PRNGKey(0), images, mask)
    state = jax.device_put(state, pmesh.replicated(mesh))
    sharded_images = pmesh.shard_batch(images, mesh)
    sharded_mask = pmesh.shard_batch(mask, mesh)

    step = make_cyclical_train_step(model, tx, hp, lr, donate=False)
    new_state, metrics = step(state, sharded_images, sharded_mask, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))

    # sharded result must match the single-device result
    state1 = init_cyclical_state(model, tx, jax.random.PRNGKey(0), images, mask)
    _, metrics1 = step(state1, images, mask, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-4)


def test_tensor_parallel_sharding_parity():
    """TP-sharded params (Megatron PartitionSpecs over the 'model' axis) must
    produce the same train-step loss as the replicated layout."""
    mesh = pmesh.create_mesh(8, model_parallel=4)
    model = CyclicalViT(cfg=TINY)
    hp = CyclicalHParams(target_layers=(0, 1))
    lr = schedules.constant_schedule(1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    mask = jnp.zeros((8, TINY.num_patches)).at[:, 1].set(1.0)

    tx = make_optimizer(model.init(jax.random.PRNGKey(0), images, mask)["params"], lr)
    state = init_cyclical_state(model, tx, jax.random.PRNGKey(0), images, mask)
    step = make_cyclical_train_step(model, tx, hp, lr, donate=False)
    _, ref_metrics = step(state, images, mask, jax.random.PRNGKey(5))

    shardings = pmesh.param_shardings(state.params, mesh, tensor_parallel=True)
    # heads(2)·head_dim(8)=16 channels over model axis 4 → 4 per shard: valid
    tp_state = state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, shardings),
        ema_params=jax.tree_util.tree_map(jax.device_put, state.ema_params, shardings),
    )
    tp_images = pmesh.shard_batch(images, mesh)
    tp_mask = pmesh.shard_batch(mask, mesh)
    _, tp_metrics = step(tp_state, tp_images, tp_mask, jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )


def test_grad_accumulation_matches_full_batch():
    """update_freq=2 over two half-batches must match one full-batch step
    (optax.MultiSteps semantics vs the reference's update_freq,
    engine_for_finetuning.py:66, 120-127)."""
    model = VisionTransformer(cfg=TINY)
    hp = FinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0,
                         num_patches=TINY.num_patches)
    lr = schedules.constant_schedule(1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5
    params = model.init(jax.random.PRNGKey(0), images)["params"]

    import dataclasses as _dc

    # full batch, no accumulation
    tx_full = make_optimizer(params, lr, weight_decay=0.0)
    state_f = init_finetune_state(model, tx_full, jax.random.PRNGKey(0), images)
    step_f = make_finetune_train_step(model, tx_full, hp, lr)
    state_f, _ = step_f(state_f, images, labels, jax.random.PRNGKey(9))

    # two half batches with accum_steps=2
    tx_acc = make_optimizer(params, lr, weight_decay=0.0, accum_steps=2)
    state_a = init_finetune_state(model, tx_acc, jax.random.PRNGKey(0), images)
    step_a = make_finetune_train_step(model, tx_acc, hp, lr)
    # identical per-microbatch rngs don't matter here (deterministic path:
    # no dropout/droppath in TINY)
    state_a, _ = step_a(state_a, images[:4], labels[:4], jax.random.PRNGKey(9))
    state_a, _ = step_a(state_a, images[4:], labels[4:], jax.random.PRNGKey(9))

    pf = jax.tree_util.tree_leaves(state_f.params)
    pa = jax.tree_util.tree_leaves(state_a.params)
    for a, b in zip(pf, pa):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6)


def test_schedule_horizon_with_update_freq():
    """With --update_freq 2, the LR schedule must be built over OPTIMIZER
    updates (epochs*steps_per_epoch // 2), not mini-batches: MultiSteps only
    advances the inner scale_by_schedule counter once per update_freq
    mini-steps, so a mini-batch horizon would traverse only half the decay
    (reference indexes schedules per update, run_class_finetuning.py:556-562)."""
    import argparse

    from uncertainty_vit_tpu.cli.builders import build_lr_schedules

    args = argparse.Namespace(
        epochs=4, warmup_epochs=0, warmup_steps=-1, lr=1e-3, min_lr=1e-5,
        warmup_lr=0.0, tri_phase_schedule=None, weight_decay=0.05,
        weight_decay_end=None, update_freq=2,
    )
    steps_per_epoch = 10
    lr, _, total = build_lr_schedules(args, steps_per_epoch)
    assert total == 4 * 10 // 2
    # the last optimizer update must sit at (or past) min_lr
    assert float(lr(total - 1)) < 1e-3 * 0.05
    np.testing.assert_allclose(float(lr(total)), 1e-5, rtol=1e-6)

    # end-to-end: a decaying schedule under accum_steps=2 must match the
    # no-accum optimizer stepping through the same schedule values
    model = VisionTransformer(cfg=TINY)
    hp = FinetuneHParams(num_classes=5, mixup_active=False, label_smoothing=0.0,
                         num_patches=TINY.num_patches)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 5
    params = model.init(jax.random.PRNGKey(0), images)["params"]

    tx_full = make_optimizer(params, lr, weight_decay=0.0)
    state_f = init_finetune_state(model, tx_full, jax.random.PRNGKey(0), images)
    step_f = make_finetune_train_step(model, tx_full, hp, lr)
    for _ in range(2):
        state_f, _ = step_f(state_f, images, labels, jax.random.PRNGKey(9))

    tx_acc = make_optimizer(params, lr, weight_decay=0.0, accum_steps=2)
    state_a = init_finetune_state(model, tx_acc, jax.random.PRNGKey(0), images)
    step_a = make_finetune_train_step(model, tx_acc, hp, lr)
    for _ in range(2):
        state_a, _ = step_a(state_a, images[:4], labels[:4], jax.random.PRNGKey(9))
        state_a, _ = step_a(state_a, images[4:], labels[4:], jax.random.PRNGKey(9))

    pf = jax.tree_util.tree_leaves(state_f.params)
    pa = jax.tree_util.tree_leaves(state_a.params)
    for a, b in zip(pf, pa):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6)


@pytest.mark.parametrize("opt", [
    "nadam", "radam", "adadelta", "novograd", "rmsproptf", "lamb", "lars",
    "momentum", "fusedadamw", "lookahead_adamw", "adamp", "sgdp",
])
def test_optimizer_tail_minimizes_quadratic(opt):
    """The reference's create_optimizer tail (optim_factory.py:100-182):
    every supported name builds a transformation that actually descends;
    apex 'fused*' aliases map to the plain variants (XLA fuses on TPU)."""
    import optax

    params = {"w": jnp.asarray([2.0, -3.0]), "b": jnp.asarray([1.0])}
    tx = make_optimizer(params, lambda s: 0.1, weight_decay=0.0, opt_name=opt)
    state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)

    l0 = float(loss(params))
    for _ in range(60):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    if opt == "adadelta":
        # adadelta's unit-fixing denominator makes its effective step tiny
        # at the start (the torch variant behaves identically) — require
        # strict descent rather than fast convergence
        assert float(loss(params)) < l0 - 1e-2, (opt, float(loss(params)))
    else:
        assert float(loss(params)) < 0.25 * l0, (opt, float(loss(params)))


def test_unknown_optimizer_errors_explicitly():
    # adahessian is implemented as of round 4 (tests/test_adahessian.py);
    # a genuinely unknown name must still fail loudly
    params = {"w": jnp.ones(2)}
    with pytest.raises(ValueError, match="not supported"):
        make_optimizer(params, lambda s: 0.1, opt_name="frobnicator")


def test_lookahead_sync_pulls_toward_slow_weights():
    """Every sync_period steps the params land on slow + α(fast − slow)."""
    import optax
    from uncertainty_vit_tpu.train.optim import lookahead_wrapper

    inner = optax.sgd(0.5)
    tx = lookahead_wrapper(inner, sync_period=2, alpha=0.5)
    params = {"w": jnp.asarray([4.0])}
    state = tx.init(params)
    grads = {"w": jnp.asarray([1.0])}

    # step 1 (no sync): plain sgd
    u, state = tx.update(grads, state, params)
    p1 = optax.apply_updates(params, u)
    np.testing.assert_allclose(np.asarray(p1["w"]), [3.5])
    # step 2 (sync): fast would be 3.0; slow was 4.0 → 4 + 0.5·(3−4) = 3.5
    u, state = tx.update(grads, state, p1)
    p2 = optax.apply_updates(p1, u)
    np.testing.assert_allclose(np.asarray(p2["w"]), [3.5])
    np.testing.assert_allclose(np.asarray(state.slow["w"]), [3.5])


def test_seq_axis_sharded_attention_matches_unsharded():
    """Context-parallel readiness (SURVEY §5.7): attention computed with
    q/k/v token-sharded over the 'seq' mesh axis equals the unsharded
    result — XLA inserts the k/v all-gathers from the shardings alone, so
    scaling 384/512 inputs over chips is a sharding change, not a rewrite."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from uncertainty_vit_tpu.ops.attention import naive_attention

    mesh = pmesh.create_mesh(8, model_parallel=2, seq_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}

    b, h, n, d = 4, 4, 24, 8
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (b, h, n, d)) for i in range(3)
    )
    ref = np.asarray(naive_attention(q, k, v, d**-0.5, None))

    spec = NamedSharding(mesh, P("data", "model", "seq", None))
    fn = jax.jit(
        lambda q, k, v: naive_attention(q, k, v, d**-0.5, None),
        in_shardings=(spec, spec, spec),
    )
    out = np.asarray(fn(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)
