"""Last-layer KFAC Laplace (evals/laplace.py).

The reference's --laplace intent (run_class_finetuning.py:651-656, dead
there) is laplace-torch's last-layer KFAC with marglik prior tuning. These
tests pin our native math against DENSE linear-algebra ground truth — the
kron-eigenbasis tricks (posterior precision eigvals, per-sample functional
variance, evidence logdet) must match explicit kron matrix computations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncertainty_vit_tpu.evals import laplace as L

C, D, N = 4, 7, 64


@pytest.fixture(scope="module")
def fitted():
    """Fit on a synthetic linear problem; return (la, feats, logits, W, b)."""
    rng = np.random.RandomState(0)
    feats = rng.randn(N, D).astype(np.float32)
    w = (rng.randn(D, C) * 0.3).astype(np.float32)
    b = (rng.randn(C) * 0.1).astype(np.float32)
    logits = feats @ w + b
    labels = rng.randint(0, C, (N,))

    def feature_forward(images):
        # "images" are the features themselves in this synthetic setup
        return jnp.asarray(images) @ w + b, jnp.asarray(images)

    batches = [(feats[i : i + 16], labels[i : i + 16]) for i in range(0, N, 16)]
    la = L.fit_last_layer_laplace(
        feature_forward, {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
        batches,
    )
    return la, feats, logits, w, b, labels


def _dense_factors(feats, logits):
    """Explicit A = Σ φ̃φ̃ᵀ and G = Σ (diag p − p pᵀ)."""
    phi = np.concatenate([feats, np.ones((len(feats), 1), np.float32)], axis=1)
    a = phi.T @ phi
    p = np.asarray(jax.nn.softmax(jnp.asarray(logits)), np.float64)
    g = np.zeros((p.shape[1], p.shape[1]))
    for pn in p:
        g += np.diag(pn) - np.outer(pn, pn)
    return phi, a.astype(np.float64), g


def test_kfac_factors_match_dense(fitted):
    la, feats, logits, w, b, labels = fitted
    phi, a, g = _dense_factors(feats, logits)
    # reconstruct A and G from the stored eigendecompositions
    a_rec = np.asarray(la.q_a) @ np.diag(np.asarray(la.a)) @ np.asarray(la.q_a).T
    g_rec = np.asarray(la.q_g) @ np.diag(np.asarray(la.g)) @ np.asarray(la.q_g).T
    np.testing.assert_allclose(a_rec, a, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(g_rec, g, rtol=1e-4, atol=1e-4)
    assert la.n == N
    # loglik at the MAP
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
    np.testing.assert_allclose(
        la.loglik, lp[np.arange(N), labels].sum(), rtol=1e-5
    )
    np.testing.assert_allclose(
        la.theta_sqnorm, (w**2).sum() + (b**2).sum(), rtol=1e-5
    )


def test_functional_variance_matches_dense_inverse(fitted):
    """Σ_f = J P⁻¹ Jᵀ with P = kron(G, A)/N + τI, J = I_C ⊗ φ̃ᵀ — the
    kron-eigenbasis shortcut must equal the explicit dense computation."""
    la, feats, logits, *_ = fitted
    tau = 0.37
    la = la.replace(prior_precision=tau)
    phi, a, g = _dense_factors(feats, logits)
    p_dense = np.kron(g, a) / N + tau * np.eye(C * (D + 1))
    cov = np.linalg.inv(p_dense)

    s = np.asarray(L._functional_variance(la, jnp.asarray(feats)))
    q_g = np.asarray(la.q_g)
    for i in [0, 3, 17]:
        jac = np.kron(np.eye(C), phi[i][None, :])  # [C, C*(D+1)]
        sigma_f = jac @ cov @ jac.T
        sigma_rec = q_g @ np.diag(s[i]) @ q_g.T
        np.testing.assert_allclose(sigma_rec, sigma_f, rtol=2e-3, atol=1e-5)


def test_marglik_matches_dense_logdet(fitted):
    la, feats, logits, w, b, _ = fitted
    tau = 2.5
    phi, a, g = _dense_factors(feats, logits)
    p_dense = np.kron(g, a) / N + tau * np.eye(C * (D + 1))
    sign, logdet = np.linalg.slogdet(p_dense)
    assert sign > 0
    p_num = C * (D + 1)
    expected = (
        la.loglik
        - 0.5 * tau * la.theta_sqnorm
        + 0.5 * p_num * np.log(tau)
        - 0.5 * logdet
    )
    got = float(L.log_marginal_likelihood(la, tau))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_optimize_prior_precision_picks_grid_argmax(fitted):
    la, *_ = fitted
    grid = np.logspace(-2, 2, 9)
    tuned = L.optimize_prior_precision(la, grid=grid)
    scores = [float(L.log_marginal_likelihood(la, t)) for t in grid]
    assert tuned.prior_precision == grid[int(np.argmax(scores))]


def test_probit_limit_recovers_softmax(fitted):
    """τ → ∞ ⇒ zero posterior variance ⇒ predictive == plain softmax."""
    la, feats, logits, *_ = fitted
    la_inf = la.replace(prior_precision=1e12)
    lp = L.predictive_log_probs(la_inf, jnp.asarray(logits), jnp.asarray(feats))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(jax.nn.log_softmax(jnp.asarray(logits))),
        rtol=1e-4, atol=1e-5,
    )
    # finite τ shrinks confidence toward uniform (probit κ < 1)
    la_fin = la.replace(prior_precision=1e-3)
    lp_f = np.asarray(L.predictive_log_probs(
        la_fin, jnp.asarray(logits), jnp.asarray(feats)))
    conf_inf = np.exp(np.asarray(lp)).max(axis=1)
    conf_fin = np.exp(lp_f).max(axis=1)
    assert (conf_fin <= conf_inf + 1e-6).all()
    assert conf_fin.mean() < conf_inf.mean()


def test_mc_link_agrees_with_probit_at_small_variance(fitted):
    la, feats, logits, *_ = fitted
    la = la.replace(prior_precision=1e6)
    lp_probit = L.predictive_log_probs(
        la, jnp.asarray(logits), jnp.asarray(feats), link="probit")
    lp_mc = L.predictive_log_probs(
        la, jnp.asarray(logits), jnp.asarray(feats), link="mc",
        mc_samples=64, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(lp_mc), np.asarray(lp_probit), atol=5e-3)


def test_end_to_end_on_vit():
    """Fit + evaluate through the real model surface (return_features)."""
    from uncertainty_vit_tpu.core.config import ViTConfig
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_classes=5, use_flash_attention=False,
    )
    model = VisionTransformer(cfg=cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    labels = np.array([0, 1, 2, 3, 4, 0, 1, 2])
    variables = {"params": jax.jit(model.init)(jax.random.PRNGKey(1), imgs)["params"]}

    ffwd = L.make_feature_forward(model, variables)
    logits, feats = ffwd(imgs)
    assert logits.shape == (8, 5) and feats.shape == (8, cfg.embed_dim)
    # features really are the head input: head(feat) == logits
    head = variables["params"]["head"]
    np.testing.assert_allclose(
        np.asarray(feats @ head["kernel"] + head["bias"]),
        np.asarray(logits), rtol=1e-4, atol=1e-5,
    )

    la = L.fit_last_layer_laplace(ffwd, head, [(imgs, labels)])
    la = L.optimize_prior_precision(la)
    out = L.evaluate_laplace(la, ffwd, [(imgs, labels)])
    for k in ("acc1", "nll", "ece", "prior_precision"):
        assert k in out and np.isfinite(out[k])


def test_laplace_improves_calibration_when_overconfident():
    """Efficacy: on an overconfident linear model (weights scaled 3×), the
    probit predictive must reduce NLL and ECE versus raw softmax while
    keeping accuracy ~unchanged (confidence shrink, not prediction flip)."""
    from uncertainty_vit_tpu.evals import metrics as MET

    rs = np.random.RandomState(7)
    n, d, c = 512, 8, 5
    feats = rs.randn(n, d).astype(np.float32)
    w_true = rs.randn(d, c).astype(np.float32) * 0.4
    z = feats @ w_true
    labels = np.asarray(
        jax.random.categorical(jax.random.PRNGKey(0), jnp.asarray(z), axis=-1))
    # the deployed model is 3× overconfident
    w, b = 3.0 * w_true, np.zeros(c, np.float32)
    logits = feats @ w + b

    def ffwd(x):
        return jnp.asarray(x) @ w + b, jnp.asarray(x)

    batches = [(feats[i:i + 128], labels[i:i + 128]) for i in range(0, n, 128)]
    la = L.fit_last_layer_laplace(
        ffwd, {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, batches)
    la = L.optimize_prior_precision(la)
    lp = L.predictive_log_probs(la, jnp.asarray(logits), jnp.asarray(feats))

    raw = MET.classification_metrics(jnp.asarray(logits), jnp.asarray(labels))
    cal = MET.classification_metrics(lp, jnp.asarray(labels))
    assert float(cal["nll"]) < float(raw["nll"])
    assert float(cal["ece"]) < float(raw["ece"])
    assert abs(float(cal["acc1"]) - float(raw["acc1"])) < 3.0


def test_cli_accepts_laplace_flag():
    """--laplace parses and is no longer an explicit error; incompatible
    combos still raise."""
    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args(["--eval", "--laplace"])
    assert args.laplace and args.laplace_link == "probit"
    args = FT.get_args_parser().parse_args(
        ["--eval", "--laplace", "--laplace_link", "mc"])
    assert args.laplace_link == "mc"
