"""AdaHessian torch-parity and Hutchinson-estimator tests
(train/optim.py scale_by_adahessian / hutchinson_hessian_diag).

The reference dispatches `--opt adahessian` to timm's Adahessian
(optim_factory.py:14,149), a vendored davda54/ada-hessian: per step it draws
Rademacher z, gets Hz from a second backward with grad_outputs=z, and steps
with m = EMA(grad), v = EMA((z*Hz)^2), denom = (v/bc2)^(k/2)+eps, decoupled
weight decay p *= (1 - lr*wd). The oracle below re-derives that step in
torch verbatim (defaults: betas (0.9,0.999), eps 1e-8, hessian_power 1,
n_samples 1, update_each 1, avg_conv_kernel False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from uncertainty_vit_tpu.train.optim import (
    hessian_aware_update,
    hutchinson_hessian_diag,
    make_optimizer,
    needs_hessian,
    scale_by_adahessian,
)


def test_needs_hessian_name_parsing():
    assert needs_hessian("adahessian")
    assert needs_hessian("fusedadahessian")
    assert needs_hessian("lookahead_adahessian")
    assert not needs_hessian("adamw")
    assert not needs_hessian("lookahead_adamw")
    assert not needs_hessian("")


def test_hutchinson_exact_on_diagonal_quadratic():
    """loss = 0.5 Σ a_i x_i² has H = diag(a), so z ⊙ Hz = a ⊙ z² = a exactly
    for EVERY Rademacher draw — the estimator must return diag(H) with zero
    variance here."""
    a = {"w": jnp.asarray([0.5, 2.0, -1.5]), "b": jnp.asarray([[3.0, 0.25]])}
    params = {"w": jnp.asarray([1.0, -2.0, 0.3]), "b": jnp.asarray([[0.1, 4.0]])}

    def loss(p):
        return 0.5 * sum(
            jnp.sum(ai * pi**2) for ai, pi in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(p)
            )
        )

    grad_fn = jax.grad(loss)
    for seed in (0, 1, 2):
        d = hutchinson_hessian_diag(grad_fn, params, jax.random.PRNGKey(seed))
        np.testing.assert_allclose(np.asarray(d["w"]), np.asarray(a["w"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d["b"]), np.asarray(a["b"]), rtol=1e-6)


def test_hutchinson_matches_torch_autograd_hvp():
    """On a 2-layer MLP the jvp-of-grad Hz must equal torch's
    autograd.grad(g, p, grad_outputs=z) for the SAME z — replicating the
    estimator's internal Rademacher derivation (flatten order, split,
    rademacher per leaf) so both frameworks see identical draws."""
    rng = np.random.RandomState(0)
    w1 = rng.randn(6, 4).astype(np.float32)
    w2 = rng.randn(4, 3).astype(np.float32)
    x = rng.randn(5, 6).astype(np.float32)
    y = rng.randn(5, 3).astype(np.float32)

    params = {"w1": jnp.asarray(w1), "w2": jnp.asarray(w2)}

    def loss(p):
        h = jnp.tanh(x @ p["w1"])
        return jnp.mean((h @ p["w2"] - y) ** 2)

    key = jax.random.PRNGKey(42)
    d_ours = hutchinson_hessian_diag(jax.grad(loss), params, key)

    # replicate the estimator's z derivation exactly
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    z_leaves = [
        np.asarray(jax.random.rademacher(k, l.shape, l.dtype))
        for k, l in zip(keys, leaves)
    ]
    z_tree = jax.tree_util.tree_unflatten(treedef, z_leaves)

    tw1 = torch.tensor(w1, requires_grad=True)
    tw2 = torch.tensor(w2, requires_grad=True)
    tx_, ty = torch.tensor(x), torch.tensor(y)
    th = torch.tanh(tx_ @ tw1)
    tl = torch.mean((th @ tw2 - ty) ** 2)
    g1, g2 = torch.autograd.grad(tl, (tw1, tw2), create_graph=True)
    hz1, hz2 = torch.autograd.grad(
        (g1, g2), (tw1, tw2),
        grad_outputs=(torch.tensor(np.asarray(z_tree["w1"])),
                      torch.tensor(np.asarray(z_tree["w2"]))),
    )
    d_torch = {
        "w1": np.asarray(z_tree["w1"]) * hz1.numpy(),
        "w2": np.asarray(z_tree["w2"]) * hz2.numpy(),
    }
    np.testing.assert_allclose(np.asarray(d_ours["w1"]), d_torch["w1"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_ours["w2"]), d_torch["w2"],
                               rtol=1e-4, atol=1e-6)


def _torch_adahessian_steps(p0, grads, hess, lr, wd, b1=0.9, b2=0.999,
                            eps=1e-8, k=1.0):
    """timm adahessian.py step(), re-derived: decoupled wd then
    addcdiv(exp_avg, denom, -lr/bc1). grads/hess are per-step lists."""
    p = torch.tensor(p0, dtype=torch.float64).clone()
    exp_avg = torch.zeros_like(p)
    exp_hess_sq = torch.zeros_like(p)
    for step, (g, d) in enumerate(zip(grads, hess), start=1):
        g = torch.tensor(g, dtype=torch.float64)
        d = torch.tensor(d, dtype=torch.float64)
        p = p * (1.0 - lr * wd)
        exp_avg = b1 * exp_avg + (1 - b1) * g
        exp_hess_sq = b2 * exp_hess_sq + (1 - b2) * d * d
        bc1 = 1 - b1**step
        bc2 = 1 - b2**step
        denom = (exp_hess_sq / bc2) ** (k / 2) + eps
        p = p - (lr / bc1) * exp_avg / denom
    return p.numpy()


@pytest.mark.parametrize("wd", [0.0, 0.05])
def test_adahessian_trajectory_matches_timm_step(wd):
    """Feed identical grad/Hessian-diag sequences to the torch oracle and to
    make_optimizer('adahessian') (chain: scale_by_adahessian → generic wd →
    -lr); the parameter trajectories must coincide — this pins the bc1/bc2
    corrections, the k/2 power, eps placement, and the decoupled-wd
    composition (lr·(upd + wd·p) ≡ p.mul_(1−lr·wd))."""
    rng = np.random.RandomState(3)
    p0 = rng.randn(4, 3).astype(np.float32)  # 2-D → weight-decayed group
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(4)]
    hess = [rng.randn(4, 3).astype(np.float32) * 2.0 for _ in range(4)]
    lr = 0.05

    params = {"kernel": jnp.asarray(p0)}
    tx = make_optimizer(params, lambda s: lr, weight_decay=wd,
                        opt_name="adahessian")
    state = tx.init(params)
    for g, d in zip(grads, hess):
        updates, state = tx.update(
            {"kernel": jnp.asarray(g)}, state, params,
            hessian_diag={"kernel": jnp.asarray(d)},
        )
        params = optax.apply_updates(params, updates)

    want = _torch_adahessian_steps(p0, grads, hess, lr, wd)
    # oracle runs f64, ours f32 — tolerance covers the accumulation gap
    np.testing.assert_allclose(np.asarray(params["kernel"]), want,
                               rtol=1e-4, atol=1e-5)


def test_adahessian_requires_hessian_diag():
    params = {"w": jnp.ones(3)}
    tx = make_optimizer(params, lambda s: 0.1, weight_decay=0.0,
                        opt_name="adahessian")
    state = tx.init(params)
    with pytest.raises(ValueError, match="hessian_diag"):
        tx.update({"w": jnp.ones(3)}, state, params)


@pytest.mark.parametrize("opt", ["adahessian", "lookahead_adahessian"])
def test_adahessian_minimizes_quadratic(opt):
    """End-to-end through hessian_aware_update (the engines' path): the
    second-order step must descend; lookahead composition forwards the
    extra arg through the wrapper."""
    params = {"w": jnp.asarray([2.0, -3.0]), "b": jnp.asarray([1.0])}
    tx = make_optimizer(params, lambda s: 0.3, weight_decay=0.0, opt_name=opt)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2), ()

    l0 = float(loss_fn(params)[0])
    key = jax.random.PRNGKey(0)
    for i in range(40):
        grads = jax.grad(lambda p: loss_fn(p)[0])(params)
        updates, state = hessian_aware_update(
            tx, grads, state, params, loss_fn=loss_fn,
            rng=jax.random.fold_in(key, i), use_hessian=True,
        )
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)[0]) < 0.05 * l0


def test_adahessian_with_grad_accumulation():
    """update_freq > 1 wraps the chain in optax.MultiSteps — it must forward
    the hessian_diag extra arg to the inner transform (pins the optax
    extra-args contract the engines rely on)."""
    params = {"w": jnp.asarray([2.0, -3.0])}
    tx = make_optimizer(params, lambda s: 0.3, weight_decay=0.0,
                        opt_name="adahessian", accum_steps=2)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2), ()

    l0 = float(loss_fn(params)[0])
    for i in range(40):  # 20 boundary updates
        grads = jax.grad(lambda p: loss_fn(p)[0])(params)
        updates, state = hessian_aware_update(
            tx, grads, state, params, loss_fn=loss_fn,
            rng=jax.random.PRNGKey(i), use_hessian=True,
        )
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)[0]) < 0.1 * l0


def test_adahessian_accumulation_pairs_averaged_grads_and_hessian():
    """update_freq=2 must (a) emit zero updates on the non-boundary
    micro-step and (b) apply, at the boundary, exactly the single-step
    adahessian update computed from the MEAN grads paired with the MEAN
    Hutchinson estimates — timm's double-backward through the accumulated
    p.grad differentiates the mean microbatch loss, so its Hessian is the
    mean of the per-microbatch Hessians, not the last one."""
    rng = np.random.RandomState(11)
    p0 = {"kernel": jnp.asarray(rng.randn(3, 2).astype(np.float32))}
    g1, g2 = (rng.randn(3, 2).astype(np.float32) for _ in range(2))
    h1, h2 = (rng.randn(3, 2).astype(np.float32) * 1.5 for _ in range(2))
    lr, wd = 0.05, 0.05

    tx_acc = make_optimizer(p0, lambda s: lr, weight_decay=wd,
                            opt_name="adahessian", accum_steps=2)
    st = tx_acc.init(p0)
    u1, st = tx_acc.update({"kernel": jnp.asarray(g1)}, st, p0,
                           hessian_diag={"kernel": jnp.asarray(h1)})
    np.testing.assert_array_equal(np.asarray(u1["kernel"]), 0.0)
    u2, st = tx_acc.update({"kernel": jnp.asarray(g2)}, st, p0,
                           hessian_diag={"kernel": jnp.asarray(h2)})
    got = optax.apply_updates(p0, u2)

    tx_ref = make_optimizer(p0, lambda s: lr, weight_decay=wd,
                            opt_name="adahessian")
    st_ref = tx_ref.init(p0)
    u_ref, _ = tx_ref.update({"kernel": jnp.asarray((g1 + g2) / 2)}, st_ref,
                             p0, hessian_diag={"kernel": jnp.asarray((h1 + h2) / 2)})
    want = optax.apply_updates(p0, u_ref)
    # incremental mean (a + (g-a)/(c+1)) vs (g1+g2)/2 differ by f32 rounding
    np.testing.assert_allclose(np.asarray(got["kernel"]),
                               np.asarray(want["kernel"]), rtol=3e-5, atol=1e-7)
    # accumulators reset after the boundary
    np.testing.assert_array_equal(np.asarray(st.acc_grads["kernel"]), 0.0)
    np.testing.assert_array_equal(np.asarray(st.acc_hessian["kernel"]), 0.0)


def test_adahessian_accumulation_through_jitted_engine():
    """update_freq=2 through the REAL jitted finetune step: params frozen on
    the mini-step, moved at the boundary — multi_steps_with_hessian's
    lax.cond must trace inside the engine jit with the Hutchinson pass."""
    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, init_finetune_state, make_finetune_train_step,
    )

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2,
                    num_heads=2, num_classes=5, use_flash_attention=False)
    model = VisionTransformer(cfg=cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]
    tx = make_optimizer(params, lambda s: 1e-2, weight_decay=0.05,
                        opt_name="adahessian", accum_steps=2)
    hp = FinetuneHParams(num_classes=5, mixup_active=False,
                         label_smoothing=0.0, num_patches=cfg.num_patches,
                         update_freq=2)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    state = state.replace(params=params, opt_state=tx.init(params))
    p0 = jax.tree_util.tree_map(np.asarray, params)
    step = make_finetune_train_step(model, tx, hp, use_hessian=True)

    state, _ = step(state, images, labels, jax.random.PRNGKey(7))
    frozen = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))), p0, state.params
    )
    assert max(jax.tree_util.tree_leaves(frozen)) == 0.0  # mini-step: frozen

    state, _ = step(state, images, labels, jax.random.PRNGKey(7))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))), p0, state.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0  # boundary: applied


def test_adahessian_through_finetune_engine():
    """make_finetune_train_step(use_hessian=True) traces, runs, and updates:
    the full jvp-of-grad pass through the tiny ViT + adahessian chain
    (reference path: run_class_finetuning.py --opt adahessian →
    optim_factory.py:149 → engine_for_finetuning.py train loop)."""
    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, init_finetune_state, make_finetune_train_step,
    )

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2,
                    num_heads=2, num_classes=5, use_flash_attention=False)
    model = VisionTransformer(cfg=cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]
    tx = make_optimizer(params, lambda s: 1e-2, weight_decay=0.05,
                        opt_name="adahessian")
    hp = FinetuneHParams(num_classes=5, mixup_active=False,
                         label_smoothing=0.0, num_patches=cfg.num_patches)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
    state = state.replace(params=params, opt_state=tx.init(params))
    # the step donates its state argument — snapshot the initial params to
    # host memory before the donated buffers are invalidated
    p0 = jax.tree_util.tree_map(np.asarray, params)
    step = make_finetune_train_step(model, tx, hp, use_hessian=True)

    l_prev = None
    for i in range(3):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(7))
        l = float(metrics["loss"])
        assert np.isfinite(l)
        l_prev = l
    assert l_prev is not None
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))), p0, state.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_adahessian_with_pallas_attention_enabled():
    """Regression: the Hutchinson jvp-of-grad must trace even when the model
    uses the Pallas fused-attention kernel (use_flash_attention=True, the
    production TPU configuration). Pallas calls have no JVP rule, so
    hutchinson_hessian_diag stages its jvp under
    ops.flash_attention.forward_ad_safe(), routing the Hessian sub-graph
    through the XLA attention while the step's own gradient keeps the
    kernel. Before that context existed, this test died at trace time with
    an AssertionError from _pallas_call_jvp_rule (round-5 TPU smoke,
    reference frame: timm adahessian create_graph=True double-backward)."""
    import uncertainty_vit_tpu.ops.flash_attention as FA
    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.train.engine_finetune import (
        FinetuneHParams, init_finetune_state, make_finetune_train_step,
    )

    # embed 128 / 4 heads → head_dim 32, group 4·32 = 128 lanes: kernel route
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=128, depth=2,
                    num_heads=4, num_classes=5, use_flash_attention=True)
    model = VisionTransformer(cfg=cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    FA.INTERPRET = True
    try:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]
        tx = make_optimizer(params, lambda s: 1e-2, weight_decay=0.05,
                            opt_name="adahessian")
        hp = FinetuneHParams(num_classes=5, mixup_active=False,
                             label_smoothing=0.0, num_patches=cfg.num_patches)
        state = init_finetune_state(model, tx, jax.random.PRNGKey(0), images)
        state = state.replace(params=params, opt_state=tx.init(params))
        p0 = jax.tree_util.tree_map(np.asarray, params)
        step = make_finetune_train_step(model, tx, hp, use_hessian=True)
        state, metrics = step(state, images, labels, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        FA.INTERPRET = False
    assert not FA.FORWARD_AD_ONLY  # context restored after tracing
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))), p0, state.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
