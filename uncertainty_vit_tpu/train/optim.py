"""Optimizer factory: AdamW with layer-wise LR decay and scheduled decoupled
weight decay (optim_factory.py + engine per-step group assignment).

The reference mutates optimizer param_group lr/wd every step on the host
(engine_for_cyclical.py:48-53). Here both schedules live inside the compiled
step via optax transforms, and the per-group lr_scale / no-decay structure
(optim_factory.py:58-97) becomes per-parameter trees computed once from the
param paths.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Layer-id assignment (optim_factory.py:33-55)
# ---------------------------------------------------------------------------

def vit_layer_id(path: Tuple[str, ...], num_max_layer: int) -> int:
    """get_num_layer_for_vit semantics on our param tree paths.

    num_max_layer = depth + 2 (LayerDecayValueAssigner gets depth+2 values,
    run_class_finetuning.py:570-571).
    """
    names = [str(p) for p in path]
    flat = ".".join(names)
    leafname = names[-1] if names else ""
    if leafname in ("cls_token", "mask_token", "pos_embed"):
        return 0
    if "patch_embed" in names:
        return 0
    if "rel_pos_bias" in names:
        return num_max_layer - 1
    for n in names:
        if n.startswith("blocks_"):
            return int(n.split("_")[1]) + 1
    del flat
    return num_max_layer - 1


def layer_decay_scales(params: Any, layer_decay: float, depth: int) -> Any:
    """Per-parameter lr multiplier tree: decay^(depth+1-layer_id)
    (run_class_finetuning.py:570-576)."""
    num_max_layer = depth + 2
    values = [layer_decay ** (num_max_layer - 1 - i) for i in range(num_max_layer)]

    def scale(path, leaf):
        return values[vit_layer_id(tuple(p.key for p in path), num_max_layer)]

    return jax.tree_util.tree_map_with_path(scale, params)


def weight_decay_mask(params: Any, skip_names: Sequence[str] = ("pos_embed", "cls_token")) -> Any:
    """True where decoupled weight decay applies (optim_factory.py:66-70):
    excludes 1-D params, biases, and the skip list."""

    def decayed(path, leaf):
        names = [str(p.key) for p in path]
        if leaf.ndim <= 1:
            return False
        if names and names[-1] in skip_names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(decayed, params)


# ---------------------------------------------------------------------------
# optax transforms
# ---------------------------------------------------------------------------

def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by a fixed per-parameter scalar (lr_scale)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


class ScheduledWDState(NamedTuple):
    count: jnp.ndarray


def add_scheduled_decayed_weights(
    wd_schedule: Callable, mask: Any
) -> optax.GradientTransformation:
    """Decoupled weight decay whose coefficient follows a per-step schedule
    (the reference's separate WD cosine array, run_cyclical.py:550-557)."""

    def init(params):
        del params
        return ScheduledWDState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params):
        wd = wd_schedule(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask
        )
        return updates, ScheduledWDState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def _adamp_projection(p, grad, perturb, delta: float, wd_ratio: float, eps: float):
    """timm.optim.adamp/sgdp `_projection`: for ≥2-D params whose gradient is
    (nearly) orthogonal to the weight — the scale-invariant case created by a
    following normalization layer — remove the radial component of the
    update and shrink the effective weight decay to wd_ratio. The torch code
    tries the channel view first and only falls through to the layer view
    (Heo et al., AdamP; clovaai/adamp). Data-dependent branch → jnp.where
    over both candidate projections."""
    if p.ndim <= 1:
        return perturb, jnp.asarray(1.0, jnp.float32)

    def cond_and_proj(channel: bool):
        shape = (p.shape[0], -1) if channel else (1, -1)
        pv = p.reshape(shape)
        gv = grad.reshape(shape)
        pn = jnp.linalg.norm(pv, axis=1)
        gn = jnp.linalg.norm(gv, axis=1)
        # F.cosine_similarity(x, y, dim=1, eps).abs(): eps clamps the norms
        cos = jnp.abs((pv * gv).sum(axis=1)) / (
            jnp.maximum(pn, eps) * jnp.maximum(gn, eps)
        )
        cond = cos.max() < delta / (pv.shape[1] ** 0.5)
        expand = ((-1,) if channel else (1,)) + (1,) * (p.ndim - 1)
        p_n = p / (pn.reshape(expand) + eps)
        dot = (p_n * perturb).reshape(shape).sum(axis=1).reshape(expand)
        return cond, perturb - p_n * dot

    c_cond, c_proj = cond_and_proj(True)
    l_cond, l_proj = cond_and_proj(False)
    out = jnp.where(c_cond, c_proj, jnp.where(l_cond, l_proj, perturb))
    wd = jnp.where(c_cond | l_cond, wd_ratio, 1.0)
    return out, wd


class AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adamp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    delta: float = 0.1,
    wd_ratio: float = 0.01,
    nesterov: bool = True,
    wd_schedule: Optional[Callable] = None,
    wd_mask: Any = None,
) -> optax.GradientTransformation:
    """timm AdamP (optim_factory.py:139-140: wd_ratio=0.01, nesterov=True).

    Emits perturb/bias_correction1 + wd·wd_ratio·p so the chain's final −lr
    scaling reproduces torch's `p.mul_(1 − lr·wd·ratio); p.add_(perturb,
    alpha=−lr/bc1)` exactly. Weight decay lives INSIDE the transform because
    its effective coefficient is data-dependent (shrunk to wd_ratio whenever
    the projection fires)."""

    def init(params):
        z = lambda t: jnp.zeros_like(t, jnp.float32)
        return AdamPState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(updates, state, params):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        wd = wd_schedule(state.count) if wd_schedule is not None else None

        def one(g, m, v, p, decayed):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            denom = jnp.sqrt(v / bc2) + eps
            perturb = ((b1 * m + (1.0 - b1) * g) if nesterov else m) / denom
            perturb, ratio = _adamp_projection(p32, g, perturb, delta, wd_ratio, eps)
            out = perturb / bc1
            if wd is not None and decayed:
                out = out + wd * ratio * p32
            return out, m, v

        mask = wd_mask if wd_mask is not None else jax.tree_util.tree_map(
            lambda _: False, updates
        )
        trip = jax.tree_util.tree_map(
            one, updates, state.mu, state.nu, params, mask,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        outs = jax.tree_util.tree_map(lambda t: t[0], trip, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], trip, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], trip, is_leaf=lambda x: isinstance(x, tuple))
        return outs, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    count: jnp.ndarray
    buf: Any


def scale_by_sgdp(
    momentum: float = 0.9,
    dampening: float = 0.0,
    nesterov: bool = True,
    eps: float = 1e-8,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    wd_schedule: Optional[Callable] = None,
    wd_mask: Any = None,
) -> optax.GradientTransformation:
    """timm SGDP (optim_factory.py:141-142: momentum=args.momentum,
    nesterov=True; package defaults wd_ratio=0.1, delta=0.1). Torch applies
    `p.mul_(1 − lr·wd·ratio/(1−momentum))` — note the 1/(1−momentum)
    rescale — then `p.add_(d_p, alpha=−lr)`."""

    def init(params):
        return SGDPState(
            count=jnp.zeros([], jnp.int32),
            buf=jax.tree_util.tree_map(
                lambda t: jnp.zeros_like(t, jnp.float32), params
            ),
        )

    def update(updates, state, params):
        wd = wd_schedule(state.count) if wd_schedule is not None else None

        def one(g, buf, p, decayed):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            buf = momentum * buf + (1.0 - dampening) * g
            d_p = (g + momentum * buf) if nesterov else buf
            d_p, ratio = _adamp_projection(p32, g, d_p, delta, wd_ratio, eps)
            out = d_p
            if wd is not None and decayed:
                out = out + wd * ratio * p32 / (1.0 - momentum)
            return out, buf

        mask = wd_mask if wd_mask is not None else jax.tree_util.tree_map(
            lambda _: False, updates
        )
        trip = jax.tree_util.tree_map(
            one, updates, state.buf, params, mask,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        outs = jax.tree_util.tree_map(lambda t: t[0], trip, is_leaf=lambda x: isinstance(x, tuple))
        buf = jax.tree_util.tree_map(lambda t: t[1], trip, is_leaf=lambda x: isinstance(x, tuple))
        return outs, SGDPState(count=state.count + 1, buf=buf)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdaHessian (optim_factory.py:149: timm Adahessian / davda54 ada-hessian)
# ---------------------------------------------------------------------------

def needs_hessian(opt_name: str) -> bool:
    """True when the optimizer's update consumes a Hessian-diagonal estimate
    and the engine must run the Hutchinson pass (reference
    optim_factory.py:149 dispatches --opt adahessian to timm Adahessian)."""
    name = (opt_name or "adamw").replace("fused", "")
    if name.startswith("lookahead_"):
        name = name[len("lookahead_"):]
    return name == "adahessian"


def hutchinson_hessian_diag(grad_fn, params: Any, rng, n_samples: int = 1):
    """Hutchinson estimator of the Hessian diagonal: D = E_z[z ⊙ Hz] with
    Rademacher z (timm adahessian.py set_hessian; n_samples default 1 as in
    the reference's unconfigured construction). torch gets Hz from a second
    backward with grad_outputs=z; here it is forward-over-reverse
    jax.jvp(grad_fn, params, z), which XLA fuses into the step program.
    grad_fn must recompute the SAME differentiable program the step's
    gradients came from (same dropout/droppath draws).

    The jvp is staged under ops.flash_attention.forward_ad_safe(): Pallas
    kernels have no JVP rule, so the Hessian sub-graph routes attention (and
    the other kernel-backed ops) through the XLA path. Same math, same
    make_rng draws for hidden-dropout/droppath; the one divergence is
    in-kernel attention-dropout masks (attn_drop > 0), where the Hessian is
    estimated under an independent dropout draw — an approximation to timm's
    create_graph=True double-backward through the identical graph."""
    from uncertainty_vit_tpu.ops.flash_attention import forward_ad_safe

    leaves, treedef = jax.tree_util.tree_flatten(params)

    def one_sample(key):
        keys = jax.random.split(key, len(leaves))
        z = jax.tree_util.tree_unflatten(
            treedef,
            [jax.random.rademacher(k, l.shape, l.dtype)
             for k, l in zip(keys, leaves)],
        )
        with forward_ad_safe():
            _, hz = jax.jvp(grad_fn, (params,), (z,))
        return jax.tree_util.tree_map(jnp.multiply, z, hz)

    if n_samples == 1:
        return one_sample(rng)
    samples = [one_sample(k) for k in jax.random.split(rng, n_samples)]
    return jax.tree_util.tree_map(
        lambda *xs: sum(xs) / float(n_samples), *samples
    )


class ScaleByAdahessianState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_hess_sq: Any


def scale_by_adahessian(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    hessian_power: float = 1.0,
) -> optax.GradientTransformationExtraArgs:
    """timm Adahessian.step() (optim_factory.py:149): m = EMA(grad),
    v = EMA(D²) with D the Hutchinson Hessian-diagonal estimate;
    update = (m / bc1) / ((v / bc2)^(k/2) + eps).

    D arrives per step through the `hessian_diag` extra argument — a
    gradient transformation cannot re-differentiate the loss, so the
    second-order pass lives in the engine (hutchinson_hessian_diag).
    Decoupled weight decay composes with make_optimizer's generic wd
    transform: lr·(update + wd·p) ≡ timm's p.mul_(1 − lr·wd) pre-step."""

    def init(params):
        return ScaleByAdahessianState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree_util.tree_map(jnp.zeros_like, params),
            exp_hess_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None, *, hessian_diag=None, **extra):
        del params, extra
        if hessian_diag is None:
            raise ValueError(
                "adahessian needs hessian_diag=... passed through tx.update;"
                " build the train step with use_hessian=True (engines do"
                " this when needs_hessian(args.opt)) or supply"
                " hutchinson_hessian_diag() yourself"
            )
        count = state.count + 1
        m = jax.tree_util.tree_map(
            lambda mu, g: b1 * mu + (1.0 - b1) * g, state.exp_avg, updates
        )
        v = jax.tree_util.tree_map(
            lambda nu, d: b2 * nu + (1.0 - b2) * jnp.square(d),
            state.exp_hess_sq, hessian_diag,
        )
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        k = hessian_power
        out = jax.tree_util.tree_map(
            lambda mu, nu: (mu / bc1) / ((nu / bc2) ** (k * 0.5) + eps), m, v
        )
        return out, ScaleByAdahessianState(count=count, exp_avg=m, exp_hess_sq=v)

    return optax.GradientTransformationExtraArgs(init, update)


class MultiStepsHessianState(NamedTuple):
    mini_step: jnp.ndarray
    inner_opt_state: Any
    acc_grads: Any
    acc_hessian: Any


def multi_steps_with_hessian(
    tx: optax.GradientTransformationExtraArgs, every_k: int
) -> optax.GradientTransformationExtraArgs:
    """optax.MultiSteps for the adahessian chain: accumulates the running
    MEAN of both the grads AND the per-micro-step Hutchinson estimates, and
    applies the inner update only at the accumulation boundary with the two
    averages paired. This matches timm Adahessian under update_freq>1, where
    the double backward at step() differentiates the ACCUMULATED p.grad —
    the Hessian of the mean microbatch loss (sum of per-microbatch HVPs) —
    rather than the last microbatch's Hessian. Each micro-step's Hutchinson
    pass is therefore consumed, not discarded (fresh Rademacher z per
    micro-step keeps the averaged estimator unbiased for the same
    diagonal)."""

    def zeros_like_f32(tree):
        return jax.tree_util.tree_map(
            lambda t: jnp.zeros(jnp.shape(t), jnp.float32), tree
        )

    def init(params):
        return MultiStepsHessianState(
            mini_step=jnp.zeros([], jnp.int32),
            inner_opt_state=tx.init(params),
            acc_grads=zeros_like_f32(params),
            acc_hessian=zeros_like_f32(params),
        )

    def update(updates, state, params=None, *, hessian_diag=None, **extra):
        del extra
        if hessian_diag is None:
            raise ValueError(
                "adahessian needs hessian_diag=... on every micro-step; see"
                " hessian_aware_update / use_hessian=True"
            )
        c = state.mini_step.astype(jnp.float32)
        acc_g = jax.tree_util.tree_map(
            lambda a, g: a + (g.astype(jnp.float32) - a) / (c + 1.0),
            state.acc_grads, updates,
        )
        acc_h = jax.tree_util.tree_map(
            lambda a, d: a + (d.astype(jnp.float32) - a) / (c + 1.0),
            state.acc_hessian, hessian_diag,
        )
        boundary = state.mini_step == every_k - 1

        def do_update(_):
            new_updates, new_inner = tx.update(
                acc_g, state.inner_opt_state, params, hessian_diag=acc_h
            )
            return new_updates, new_inner, zeros_like_f32(acc_g), zeros_like_f32(acc_h)

        def skip_update(_):
            return (
                jax.tree_util.tree_map(jnp.zeros_like, acc_g),
                state.inner_opt_state,
                acc_g,
                acc_h,
            )

        out, inner, next_g, next_h = jax.lax.cond(
            boundary, do_update, skip_update, None
        )
        return out, MultiStepsHessianState(
            mini_step=(state.mini_step + 1) % every_k,
            inner_opt_state=inner,
            acc_grads=next_g,
            acc_hessian=next_h,
        )

    return optax.GradientTransformationExtraArgs(init, update)


def hessian_aware_update(
    tx: optax.GradientTransformation,
    grads: Any,
    opt_state: Any,
    params: Any,
    *,
    loss_fn: Optional[Callable] = None,
    rng=None,
    use_hessian: bool = False,
):
    """tx.update, plus the AdaHessian Hutchinson pass when the optimizer
    requires one. loss_fn must be the exact (loss, aux)-returning closure
    the step's gradients came from, so the HVP differentiates the identical
    program — timm's equivalent reuses the create_graph=True backward."""
    if not use_hessian:
        return tx.update(grads, opt_state, params)

    def grad_fn(p):
        return jax.grad(loss_fn, has_aux=True)(p)[0]

    hd = hutchinson_hessian_diag(grad_fn, params, rng)
    return tx.update(grads, opt_state, params, hessian_diag=hd)


def make_optimizer(
    params: Any,
    lr_schedule: Callable,
    *,
    weight_decay: float = 0.05,
    wd_schedule: Optional[Callable] = None,
    clip_grad: Optional[float] = None,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    layer_decay: Optional[float] = None,
    depth: int = 12,
    opt_name: str = "adamw",
    momentum: float = 0.9,
    skip_names: Sequence[str] = ("pos_embed", "cls_token"),
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW (default) matching the reference group semantics: per-step
    lr(step)·lr_scale applied to adam_update + wd(step)·param for decayed
    params (optim_factory.py:100-182; engine_for_cyclical.py:48-53). Gradient
    accumulation uses optax.MultiSteps (update_freq,
    engine_for_finetuning.py:66)."""
    chain = []
    if clip_grad is not None and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))

    # The reference's create_optimizer tail (optim_factory.py:100-182). The
    # apex fused variants are CUDA kernels — on TPU every optimizer below is
    # XLA-fused automatically, so `fused*` names map to their plain
    # counterparts. sgdp/adamp/adahessian are custom transforms above
    # (torch-parity tested); adahessian additionally needs the engine to
    # run the Hutchinson pass (hessian_aware_update / use_hessian=True).
    opt_name = opt_name.replace("fused", "") or "adamw"
    lookahead = opt_name.startswith("lookahead_")
    if lookahead:
        opt_name = opt_name[len("lookahead_"):]
    # transforms that must see the update INCLUDING the decayed weights
    # (LAMB/LARS normalize the full update per layer; momentum-style buffers
    # accumulate after the rms scaling) — appended after the wd transform
    post_wd: list = []
    if opt_name in ("adamw", "adam"):
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif opt_name == "nadam":
        chain.append(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, nesterov=True)
        )
    elif opt_name == "radam":
        chain.append(optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps))
    elif opt_name == "adadelta":
        chain.append(optax.scale_by_adadelta(eps=eps))
    elif opt_name == "novograd":
        chain.append(optax.scale_by_novograd(b1=betas[0], b2=betas[1], eps=eps))
    elif opt_name in ("rmsprop", "rmsproptf"):
        # timm's rmsprop_tf: decay 0.9, eps inside the sqrt, heavy-ball
        # momentum after the rms scaling (optim_factory.py:151-154 always
        # passes momentum=args.momentum)
        chain.append(optax.scale_by_rms(decay=0.9, eps=eps, eps_in_sqrt=True))
        if momentum:
            post_wd.append(optax.trace(decay=momentum, nesterov=False))
    elif opt_name == "sgd":
        chain.append(optax.trace(decay=momentum, nesterov=True))
    elif opt_name == "momentum":
        chain.append(optax.trace(decay=momentum, nesterov=False))
    elif opt_name == "lamb":
        # trust ratio normalizes adam_update + wd·param (optax.lamb layout)
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        post_wd.append(optax.scale_by_trust_ratio())
    elif opt_name == "lars":
        # optax.lars layout: wd → per-layer trust ratio → momentum
        post_wd.append(optax.scale_by_trust_ratio())
        post_wd.append(optax.trace(decay=momentum, nesterov=False))
    elif opt_name == "adafactor":
        chain.append(optax.scale_by_factored_rms())
    elif opt_name in ("adamp", "sgdp"):
        # projection optimizers (optim_factory.py:139-142): weight decay is
        # handled INSIDE the transform — its coefficient is data-dependent
        # (shrunk by wd_ratio when the scale-invariant projection fires)
        wd_mask = weight_decay_mask(params, skip_names) if weight_decay else None
        # bind weight_decay NOW (default arg): the local is rebound to 0.0
        # below, and a late-binding closure would silently zero the decay
        sched = (
            (wd_schedule
             or (lambda s, _wd=weight_decay: jnp.full((), _wd, jnp.float32)))
            if weight_decay else None
        )
        if opt_name == "adamp":
            chain.append(scale_by_adamp(
                b1=betas[0], b2=betas[1], eps=eps, wd_ratio=0.01,
                nesterov=True, wd_schedule=sched, wd_mask=wd_mask,
            ))
        else:
            # eps feeds the projection's cosine clamp; the reference passes
            # opt_args (incl. args.opt_eps) into SGDP (optim_factory.py:141)
            chain.append(scale_by_sgdp(
                momentum=momentum, nesterov=True, eps=eps, wd_schedule=sched,
                wd_mask=wd_mask,
            ))
        weight_decay = 0.0  # consumed above; skip the generic wd transform
    elif opt_name == "adahessian":
        # second-order path (optim_factory.py:149): the Hessian diagonal
        # arrives per step via the hessian_diag extra arg; optax.chain /
        # MultiSteps forward extra args to the transform that declares them
        chain.append(scale_by_adahessian(b1=betas[0], b2=betas[1], eps=eps))
    else:
        raise ValueError(
            f"optimizer '{opt_name}' is not supported on the TPU build "
            "(no optax equivalent; reference optim_factory.py:100-182)"
        )

    if weight_decay:
        mask = weight_decay_mask(params, skip_names)
        sched = wd_schedule or (lambda step: jnp.full((), weight_decay, jnp.float32))
        chain.append(add_scheduled_decayed_weights(sched, mask))
    chain.extend(post_wd)

    if layer_decay is not None and layer_decay < 1.0:
        scales = layer_decay_scales(params, layer_decay, depth)
        chain.append(scale_by_tree(scales))

    chain.append(optax.scale_by_schedule(lambda step: -lr_schedule(step)))

    tx = optax.chain(*chain)
    if lookahead:
        tx = lookahead_wrapper(tx)
    if accum_steps > 1:
        if opt_name == "adahessian":
            # pair the boundary update with the MEAN of the per-micro-step
            # Hutchinson estimates (timm double-backprops the accumulated
            # p.grad = Hessian of the mean microbatch loss); plain MultiSteps
            # would pair averaged grads with the LAST micro-step's Hessian
            tx = multi_steps_with_hessian(tx, accum_steps)
        else:
            tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead_wrapper(
    tx: optax.GradientTransformation, sync_period: int = 6, alpha: float = 0.5
) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a plain GradientTransformation — the
    reference wraps via timm's Lookahead (optim_factory.py:174-176). Unlike
    optax.lookahead this keeps the param pytree unsplit (slow weights live
    in the optimizer state), so the engines need no changes: every
    sync_period updates, the emitted update retargets the params onto
    slow + alpha·(fast − slow)."""
    inner_tx = optax.with_extra_args_support(tx)

    def init(params):
        return LookaheadState(
            inner=tx.init(params),
            slow=jax.tree_util.tree_map(jnp.copy, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params=None, **extra):
        updates, inner = inner_tx.update(updates, state.inner, params, **extra)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def step(u, p, s):
            fast = p + u
            slow_new = s + alpha * (fast - s)
            u2 = jnp.where(sync, slow_new - p, u)
            s2 = jnp.where(sync, slow_new, s)
            return u2, s2

        pairs = jax.tree_util.tree_map(step, updates, params, state.slow)
        new_updates = jax.tree_util.tree_map(
            lambda pr: pr[0], pairs, is_leaf=lambda t: isinstance(t, tuple)
        )
        new_slow = jax.tree_util.tree_map(
            lambda pr: pr[1], pairs, is_leaf=lambda t: isinstance(t, tuple)
        )
        return new_updates, LookaheadState(inner=inner, slow=new_slow, count=count)

    return optax.GradientTransformationExtraArgs(init, update)


def freeze_all_except(
    tx: optax.GradientTransformation, params: Any, trainable_paths: Sequence[str]
) -> optax.GradientTransformation:
    """Linear-probe freezing (run_class_finetuning.py:529-538): zero updates
    for every parameter except those whose '/'-joined path contains one of
    `trainable_paths` (typically the head that was dropped on import)."""

    def mask(path, leaf):
        flat = "/".join(str(p.key) for p in path)
        return any(t in flat for t in trainable_paths)

    trainable = jax.tree_util.tree_map_with_path(mask, params)
    inner_tx = optax.with_extra_args_support(tx)

    def init(params_):
        return tx.init(params_)

    def update(updates, state, params_=None, **extra):
        updates, state = inner_tx.update(updates, state, params_, **extra)
        # zero the FINAL update (after lr/wd) — equivalent to the reference's
        # requires_grad_(False) exclusion incl. no weight decay on frozen
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, trainable
        )
        return updates, state

    return optax.GradientTransformationExtraArgs(init, update)


def global_norm(tree: Any) -> jnp.ndarray:
    """Reference get_grad_norm_ (utils.py:392-405): global L2 norm."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
