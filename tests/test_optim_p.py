"""AdamP / SGDP torch-parity (train/optim.py scale_by_adamp/scale_by_sgdp).

The reference dispatches `--opt adamp` / `--opt sgdp` to timm's projection
optimizers (optim_factory.py:139-142: AdamP(wd_ratio=0.01, nesterov=True),
SGDP(momentum, nesterov=True)). The oracle below RE-DERIVES the clovaai
adamp package step (the code timm vendors) in torch, verbatim semantics:
channel-view-first projection gate, cosine eps clamps, the 1/(1−momentum)
weight-decay rescale in SGDP, multiplicative decoupled decay. Our optax
transforms must reproduce the parameter trajectory bit-for-bit-ish over
multiple steps in both the projection-ON (grad ⊥ weight, the
scale-invariant case) and projection-OFF regimes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as F

from uncertainty_vit_tpu.train.optim import (
    make_optimizer,
    scale_by_adamp,
    scale_by_sgdp,
)

DELTA, EPS = 0.1, 1e-8


# --- torch oracle: clovaai/adamp projection + steps, re-derived ----------

def _channel_view(x):
    return x.view(x.size(0), -1)


def _layer_view(x):
    return x.view(1, -1)


def _cosine_similarity(x, y, eps, view_func):
    x, y = view_func(x), view_func(y)
    return F.cosine_similarity(x, y, dim=1, eps=eps).abs_()


def _projection(p, grad, perturb, delta, wd_ratio, eps):
    wd = 1.0
    expand_size = [-1] + [1] * (len(p.shape) - 1)
    for view_func in (_channel_view, _layer_view):
        cosine_sim = _cosine_similarity(grad, p, eps, view_func)
        if cosine_sim.max() < delta / math.sqrt(view_func(p).size(1)):
            p_n = p / view_func(p).norm(dim=1).view(expand_size).add_(eps)
            perturb -= p_n * view_func(p_n * perturb).sum(dim=1).view(expand_size)
            wd = wd_ratio
            return perturb, wd
    return perturb, wd


def torch_adamp_steps(p0, grads, lr, wd, betas=(0.9, 0.999), wd_ratio=0.01,
                      nesterov=True):
    p = torch.tensor(p0, dtype=torch.float64)
    m = torch.zeros_like(p)
    v = torch.zeros_like(p)
    b1, b2 = betas
    traj = []
    for step, g_np in enumerate(grads, start=1):
        g = torch.tensor(g_np, dtype=torch.float64)
        bc1 = 1 - b1**step
        bc2 = 1 - b2**step
        m = m.mul(b1).add(g, alpha=1 - b1)
        v = v.mul(b2).addcmul(g, g, value=1 - b2)
        denom = (v / bc2).sqrt().add(EPS)
        step_size = lr / bc1
        perturb = (b1 * m + (1 - b1) * g) / denom if nesterov else m / denom
        wd_r = 1.0
        if len(p.shape) > 1:
            perturb, wd_r = _projection(p, g, perturb, DELTA, wd_ratio, EPS)
        if wd > 0:
            p = p.mul(1 - lr * wd * wd_r)
        p = p.add(perturb, alpha=-step_size)
        traj.append(p.numpy().copy())
    return traj


def torch_sgdp_steps(p0, grads, lr, wd, momentum=0.9, wd_ratio=0.1,
                     nesterov=True, dampening=0.0):
    p = torch.tensor(p0, dtype=torch.float64)
    buf = torch.zeros_like(p)
    traj = []
    for g_np in grads:
        g = torch.tensor(g_np, dtype=torch.float64)
        buf = buf.mul(momentum).add(g, alpha=1 - dampening)
        d_p = g + momentum * buf if nesterov else buf
        wd_r = 1.0
        if len(p.shape) > 1:
            d_p, wd_r = _projection(p, g, d_p, DELTA, wd_ratio, EPS)
        if wd > 0:
            p = p.mul(1 - lr * wd * wd_r / (1 - momentum))
        p = p.add(d_p, alpha=-lr)
        traj.append(p.numpy().copy())
    return traj


# --- fixtures: projection-ON and projection-OFF gradient streams ---------

def _grad_stream(p0, orthogonal, steps=4, seed=0):
    """orthogonal=True: grads ⊥ each row of p (channel cosine ≈ 0 → the
    projection fires); False: grads aligned with p (cosine ≈ 1 → no-op)."""
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(steps):
        if orthogonal:
            g = rs.randn(*p0.shape)
            # remove the radial component per channel row
            p_flat = p0.reshape(p0.shape[0], -1)
            g_flat = g.reshape(p0.shape[0], -1)
            coef = (g_flat * p_flat).sum(1) / (p_flat * p_flat).sum(1)
            g = (g_flat - coef[:, None] * p_flat).reshape(p0.shape)
        else:
            g = p0 + 0.05 * rs.randn(*p0.shape)
        out.append(g.astype(np.float64))
    return out


def _run_ours(tx, p0, grads, lr):
    chain = optax.chain(tx, optax.scale(-lr))
    params = {"w": jnp.asarray(p0, jnp.float32)}
    state = chain.init(params)
    traj = []
    for g in grads:
        upd, state = chain.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        params = optax.apply_updates(params, upd)
        traj.append(np.asarray(params["w"], np.float64))
    return traj


@pytest.mark.parametrize("orthogonal", [True, False])
def test_adamp_matches_torch(orthogonal):
    rs = np.random.RandomState(1)
    p0 = rs.randn(4, 6) * 0.5
    grads = _grad_stream(p0, orthogonal)
    wd = 0.05
    ours = _run_ours(
        scale_by_adamp(
            wd_schedule=lambda s: jnp.float32(wd),
            wd_mask={"w": True},
        ),
        p0, grads, lr=0.1,
    )
    ref = torch_adamp_steps(p0, grads, lr=0.1, wd=wd)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("orthogonal", [True, False])
def test_sgdp_matches_torch(orthogonal):
    rs = np.random.RandomState(2)
    p0 = rs.randn(3, 5) * 0.5
    grads = _grad_stream(p0, orthogonal, seed=3)
    wd = 0.02
    ours = _run_ours(
        scale_by_sgdp(
            wd_schedule=lambda s: jnp.float32(wd),
            wd_mask={"w": True},
        ),
        p0, grads, lr=0.05,
    )
    ref = torch_sgdp_steps(p0, grads, lr=0.05, wd=wd)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_projection_actually_fires_in_orthogonal_regime():
    """Sanity on the fixture: the orthogonal stream must take the projected
    branch (wd shrinks to wd_ratio), the aligned stream must not."""
    rs = np.random.RandomState(4)
    p0 = rs.randn(4, 6) * 0.5
    g_on = _grad_stream(p0, True)[0]
    g_off = _grad_stream(p0, False)[0]
    pt = torch.tensor(p0)
    _, wd_on = _projection(pt.clone(), torch.tensor(g_on),
                           torch.tensor(g_on).clone(), DELTA, 0.01, EPS)
    _, wd_off = _projection(pt.clone(), torch.tensor(g_off),
                            torch.tensor(g_off).clone(), DELTA, 0.01, EPS)
    assert wd_on == 0.01 and wd_off == 1.0


def test_adamp_1d_param_no_projection():
    """1-D params (biases/norm scales) skip the projection entirely."""
    p0 = np.array([0.5, -1.0, 2.0])
    grads = [np.array([0.1, -0.2, 0.3])] * 3
    ours = _run_ours(
        scale_by_adamp(wd_schedule=lambda s: jnp.float32(0.05),
                       wd_mask={"w": False}),
        p0, grads, lr=0.1,
    )
    ref = torch_adamp_steps(p0, grads, lr=0.1, wd=0.0)  # mask False → no wd
    np.testing.assert_allclose(ours[-1], ref[-1], rtol=1e-4, atol=1e-5)


def test_make_optimizer_wires_adamp_sgdp():
    """--opt adamp / sgdp build through the factory (wd handled inside the
    transform; the generic scheduled-wd transform is skipped)."""
    params = {"w": jnp.ones((2, 3)), "b": jnp.ones((3,))}
    for name in ("adamp", "sgdp"):
        tx = make_optimizer(params, lambda s: 0.1, weight_decay=0.05,
                            opt_name=name)
        state = tx.init(params)
        g = {"w": jnp.full((2, 3), 0.1), "b": jnp.full((3,), 0.1)}
        upd, _ = tx.update(g, state, params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(upd))


def test_make_optimizer_default_wd_actually_decays():
    """Regression: the factory's fallback wd schedule captured the local
    `weight_decay` AFTER it was rebound to 0.0 (late-binding closure) — wd
    silently became zero on the default CLI path (no --weight_decay_end).
    Zero grads isolate the decay term: update must be ≈ wd·p, not 0."""
    params = {"w": jnp.full((2, 3), 2.0)}
    zeros = {"w": jnp.zeros((2, 3))}
    for name in ("adamp", "sgdp"):
        tx = make_optimizer(params, lambda s: 0.1, weight_decay=0.05,
                            opt_name=name)
        state = tx.init(params)
        upd, _ = tx.update(zeros, state, params)
        # chain ends with -lr scaling: update = -lr·wd·(ratio)·p ≠ 0
        mag = float(jnp.abs(upd["w"]).max())
        assert mag > 1e-5, (name, mag)


def test_make_optimizer_forwards_eps_to_sgdp():
    """Regression (advisor r4): --opt_eps must reach SGDP's projection
    cosine clamp, not silently keep the 1e-8 default. In the orthogonal
    regime (p ⟂ g) the projection fires iff cos < delta/sqrt(dim)·(~eps
    slack); a HUGE eps inflates the cosine-similarity denominator's
    view-max clamp, flipping the projection decision — the two
    temperatures must produce different updates. adamp already forwarded
    eps; pin both."""
    rs = np.random.RandomState(5)
    p = {"w": jnp.asarray(rs.randn(8, 8).astype(np.float32))}
    # gradient orthogonal-ish to p so the scale-invariant branch is live
    g = {"w": jnp.asarray(rs.randn(8, 8).astype(np.float32))}
    for name in ("sgdp", "adamp"):
        upds = []
        for eps in (1e-8, 1e3):  # absurd eps makes the difference visible
            tx = make_optimizer(p, lambda s: 0.1, weight_decay=0.05,
                                opt_name=name, eps=eps)
            upd, _ = tx.update(g, tx.init(p), p)
            upds.append(np.asarray(upd["w"]))
        assert not np.allclose(upds[0], upds[1]), name
