"""One-step TPU smoke sweep over every model family and engine.

The CPU suite forces the cpu platform (tests/conftest.py), so Mosaic
lowering and TPU layout constraints are only exercised on the real chip —
round 2 found a layout break (N=577 training) that every CPU test passed
over. This sweep compiles and runs ONE step of each family on the TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/tpu_smoke.py

Prints one line per case; exits nonzero if any case fails.
"""

import sys
import traceback

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import get_preset

B, SIZE = 16, 224
FAILURES = []


def case(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"OK   {name}", flush=True)
            except Exception:
                FAILURES.append(name)
                print(f"FAIL {name}", flush=True)
                traceback.print_exc()
        return run
    return deco


def images(key=1, b=B, s=SIZE):
    return jax.random.normal(jax.random.PRNGKey(key), (b, s, s, 3))


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf.astype(jnp.float32).reshape(-1)[:1]))


@case("finetune train step (linear head)")
def smoke_finetune():
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, FinetuneState, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     drop_path_rate=0.1, init_values=0.1)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    labels = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, cfg.num_classes)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 1000, warmup_steps=10)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(params, lr, weight_decay=0.05, layer_decay=0.65)
    state = FinetuneState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros([], jnp.int32))
    step = make_finetune_train_step(model, tx, FinetuneHParams(
        num_classes=cfg.num_classes, num_patches=cfg.num_patches), lr)
    state, m = step(state, x, labels, jax.random.PRNGKey(3))
    sync(m["loss"])


@case("quant int8 train step (Pallas kernels)")
def smoke_quant():
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, FinetuneState, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     drop_path_rate=0.1, init_values=0.1, quant="int8")
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    labels = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, cfg.num_classes)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 1000, warmup_steps=10)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(params, lr, weight_decay=0.05, layer_decay=0.65)
    state = FinetuneState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros([], jnp.int32))
    step = make_finetune_train_step(model, tx, FinetuneHParams(
        num_classes=cfg.num_classes, num_patches=cfg.num_patches), lr)
    state, m = step(state, x, labels, jax.random.PRNGKey(3))
    sync(m["loss"])


@case("sngp head train + eval (cov inverse)")
def smoke_sngp():
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, FinetuneState, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     head_type="sngp", sngp_fc_norm=True)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    labels = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, cfg.num_classes)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 1000, warmup_steps=10)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer(variables["params"], lr)
    state = FinetuneState(
        params=variables["params"], opt_state=tx.init(variables["params"]),
        step=jnp.zeros([], jnp.int32),
        sngp_state=variables.get("sngp_state"),
        spectral_stats=variables.get("spectral_stats"),
        sngp_frozen=variables.get("sngp_frozen"),
    )
    step = make_finetune_train_step(model, tx, FinetuneHParams(
        num_classes=cfg.num_classes, num_patches=cfg.num_patches,
        head_type="sngp"), lr)
    state, m = step(state, x, labels, jax.random.PRNGKey(3))
    sync(m["loss"])
    variables = {"params": state.params, "sngp_state": state.sngp_state,
                 "sngp_frozen": state.sngp_frozen}
    if state.spectral_stats is not None:
        variables["spectral_stats"] = state.spectral_stats
    logits, cov = jax.jit(
        lambda v, x: model.apply(v, x, deterministic=True, return_gp_cov=True)
    )(variables, x)
    sync(cov)


@case("het (MCSoftmaxDenseFA) head forward")
def smoke_het():
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     head_type="het")
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mc": jax.random.PRNGKey(9)}, x
    )
    out = jax.jit(
        lambda v, x: model.apply(v, x, rngs={"mc": jax.random.PRNGKey(4)})
    )(variables, x)
    sync(out)


@case("gumbel-softmax attention variant")
def smoke_gumbel():
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     attn_variant="gumbel")
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x
    )
    out = jax.jit(
        lambda v, x: model.apply(v, x, rngs={"gumbel": jax.random.PRNGKey(2)})
    )(variables, x)
    sync(out)


@case("sinkformer attention variant")
def smoke_sinkformer():
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     attn_variant="sinkformer")
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    sync(out)


@case("dual-sto (h_sto_trans) attention variant")
def smoke_dual_sto():
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", attn_variant="dual_sto")
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x
    )
    out = jax.jit(
        lambda v, x: model.apply(v, x, rngs={"gumbel": jax.random.PRNGKey(2)})
    )(variables, x)
    sync(out)


@case("dist (mean+cov) finetune train step")
def smoke_dist():
    from uncertainty_vit_tpu.models.dist_vit import DistVisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune_dist import (
        DistFinetuneHParams, DistFinetuneState, make_dist_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     init_values=0.1)
    model = DistVisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x, pos, neg = images(1), images(2), images(3)
    labels = jax.random.randint(jax.random.PRNGKey(4), (B,), 0, cfg.num_classes)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 1000, warmup_steps=10)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(params, lr)
    state = DistFinetuneState(params=params, opt_state=tx.init(params),
                              step=jnp.zeros([], jnp.int32))
    step = make_dist_finetune_train_step(model, tx, DistFinetuneHParams(
        num_classes=cfg.num_classes), lr)
    state, m = step(state, x, pos, neg, labels, jax.random.PRNGKey(5))
    sync(m["loss"])


@case("cyclical pretrain step")
def smoke_cyclical():
    from uncertainty_vit_tpu.models.cyclical import CyclicalViT
    from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_cyclical import (
        CyclicalHParams, CyclicalState, make_cyclical_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", num_classes=0,
                     attn_drop_rate=0.05, drop_path_rate=0.25,
                     init_values=1e-4).replace(head_type="none", has_masking=True)
    model = CyclicalViT(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    mask = batched_blockwise_mask(jax.random.PRNGKey(2), B, (14, 14), 120, 16, 196)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, mask)["params"]
    lr = schedules.cosine_schedule(2e-3, 1e-6, 1000, warmup_steps=10)
    tx = make_optimizer(params, lr, clip_grad=3.0)
    state = CyclicalState(
        params=params, ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params), step=jnp.zeros([], jnp.int32),
    )
    step = make_cyclical_train_step(model, tx, CyclicalHParams(
        target_layers=(6, 7, 8, 9, 10, 11), layer_results="end",
        post_target_layer_norm=True), lr)
    state, m = step(state, x, mask, jax.random.PRNGKey(3))
    sync(m["loss"])


@case("MIM (BEiT) pretrain step with dVAE tokenizer")
def smoke_mim():
    from uncertainty_vit_tpu.models.dvae import DiscreteVAE
    from uncertainty_vit_tpu.models.mim import MIMViT
    from uncertainty_vit_tpu.ops.masking import batched_blockwise_mask
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_mim import MIMState, make_mim_train_step
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", num_classes=0,
                     use_shared_rel_pos_bias=True).replace(
        head_type="none", has_masking=True)
    model = MIMViT(cfg=cfg, vocab_size=8192, dtype=jnp.bfloat16)
    dvae = DiscreteVAE(image_size=112, num_tokens=8192)
    x = images()
    second = jax.random.uniform(jax.random.PRNGKey(7), (B, 112, 112, 3))
    mask = batched_blockwise_mask(jax.random.PRNGKey(2), B, (14, 14), 75, 16, 196)
    dvae_vars = dvae.init(jax.random.PRNGKey(1), second)
    params = model.init(jax.random.PRNGKey(0), x, mask)["params"]
    lr = schedules.cosine_schedule(1.5e-3, 1e-6, 1000, warmup_steps=10)
    tx = make_optimizer(params, lr)
    state = MIMState(params=params, opt_state=tx.init(params),
                     step=jnp.zeros([], jnp.int32))
    step = make_mim_train_step(model, dvae, dvae_vars, tx, lr)
    state, m = step(state, x, second, mask, jax.random.PRNGKey(3))
    sync(m["loss"])


@case("MC-dropout split-trunk forward")
def smoke_mc():
    from uncertainty_vit_tpu.evals.mc_dropout import make_mc_dropout_forward
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     drop_rate=0.1, dropout_from_block=9)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = make_mc_dropout_forward(model, 4, split_at=9)
    sync(fwd(variables, x, jax.random.PRNGKey(5)))


@case("ensemble eval forward (vmapped members)")
def smoke_ensemble():
    from uncertainty_vit_tpu.evals.ensembles import (
        ensemble_mean_logits, make_ensemble_forward, stack_params,
    )
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images(b=8)
    members = [
        model.init(jax.random.PRNGKey(i), x) for i in range(2)
    ]
    stacked = stack_params(members)
    fwd = make_ensemble_forward(model)
    sync(ensemble_mean_logits(fwd(stacked, x)))


@case("attention micro-modes train step (bounded scores + bf16 lse)")
def smoke_micromodes():
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.ops import flash_attention as FA
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, FinetuneState, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    FA.BOUNDED_SCORES, FA.LSE_DTYPE = True, jnp.bfloat16
    try:
        cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                         drop_path_rate=0.1, init_values=0.1)
        model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
        x = images()
        labels = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, cfg.num_classes)
        lr = schedules.cosine_schedule(4e-3, 1e-6, 1000, warmup_steps=10)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
        tx = make_optimizer(params, lr, weight_decay=0.05, layer_decay=0.65)
        state = FinetuneState(params=params, opt_state=tx.init(params),
                              step=jnp.zeros([], jnp.int32))
        step = make_finetune_train_step(model, tx, FinetuneHParams(
            num_classes=cfg.num_classes, num_patches=cfg.num_patches), lr)
        state, m = step(state, x, labels, jax.random.PRNGKey(3))
        sync(m["loss"])
    finally:
        FA.BOUNDED_SCORES, FA.LSE_DTYPE = False, jnp.float32


@case("adahessian train step (Hutchinson jvp-of-grad on chip)")
def smoke_adahessian():
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train import schedules
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, FinetuneState, make_finetune_train_step,
    )
    from uncertainty_vit_tpu.train.optim import make_optimizer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     drop_path_rate=0.1, init_values=0.1)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images()
    labels = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, cfg.num_classes)
    lr = schedules.cosine_schedule(4e-3, 1e-6, 1000, warmup_steps=10)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(params, lr, weight_decay=0.05, opt_name="adahessian")
    state = FinetuneState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros([], jnp.int32))
    step = make_finetune_train_step(model, tx, FinetuneHParams(
        num_classes=cfg.num_classes, num_patches=cfg.num_patches), lr,
        use_hessian=True)
    state, m = step(state, x, labels, jax.random.PRNGKey(3))
    sync(m["loss"])


@case("laplace last-layer fit + predictive")
def smoke_laplace():
    from uncertainty_vit_tpu.evals import laplace as L
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    x = images(b=8)
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, cfg.num_classes)
    variables = {"params": jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]}
    ffwd = L.make_feature_forward(model, variables)
    la = L.fit_last_layer_laplace(
        ffwd, variables["params"]["head"], [(x, labels)]
    )
    la = L.optimize_prior_precision(la)
    out = L.evaluate_laplace(la, ffwd, [(x, labels)])
    import numpy as np
    assert all(np.isfinite(v) for v in out.values())


if __name__ == "__main__":
    # optional substring filters: `python tools/tpu_smoke.py cyclical dist`
    only = [a.lower() for a in sys.argv[1:]]
    for name, fn in sorted(globals().items()):
        if not name.startswith("smoke_"):
            continue
        if only and not any(o in name.lower() for o in only):
            continue
        fn()
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}", flush=True)
        sys.exit(1)
    print("\nall selected smoke cases passed", flush=True)
