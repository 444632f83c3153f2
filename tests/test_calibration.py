"""Temperature scaling (evals/calibration.py).

Ground truth: logits generated as T_true · z where labels are drawn from
softmax(z) — the NLL-optimal temperature recovers T_true (up to sampling
noise), overconfident logits get T > 1, and scaling must strictly reduce
NLL and ECE on the miscalibrated set.
"""

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.evals import calibration as CAL
from uncertainty_vit_tpu.evals import metrics as M


def _make(miscal, n=4096, c=10, seed=0):
    """Labels ~ softmax(z); observed logits = miscal · z."""
    rng = jax.random.PRNGKey(seed)
    rz, rl = jax.random.split(rng)
    z = jax.random.normal(rz, (n, c)) * 2.0
    labels = jax.random.categorical(rl, z, axis=-1)
    return miscal * z, labels


def test_recovers_true_temperature():
    for t_true in (0.5, 1.0, 3.0):
        logits, labels = _make(t_true)
        t_fit = CAL.fit_temperature(logits, labels)
        # NLL-optimal T on sampled labels ≈ the generating scale
        assert abs(t_fit - t_true) / t_true < 0.15, (t_true, t_fit)


def test_scaling_improves_nll_and_ece_when_overconfident():
    logits, labels = _make(3.0)  # 3× overconfident
    raw = M.classification_metrics(logits, labels)
    t = CAL.fit_temperature(logits, labels)
    scaled = M.classification_metrics(logits / t, labels)
    assert t > 2.0
    assert float(scaled["nll"]) < float(raw["nll"])
    assert float(scaled["ece"]) < float(raw["ece"])
    # argmax is temperature-invariant: accuracy identical
    np.testing.assert_allclose(float(scaled["acc1"]), float(raw["acc1"]))


def test_nll_at_fit_temperature_is_local_min():
    logits, labels = _make(2.0, n=1024)
    t = CAL.fit_temperature(logits, labels)
    f = lambda tt: float(CAL.nll_at_temperature(logits, labels, tt))
    assert f(t) <= f(t * 1.05) + 1e-6
    assert f(t) <= f(t / 1.05) + 1e-6


def test_evaluate_temperature_scaled_end_to_end():
    logits, labels = _make(3.0, n=512)
    feats = {"logits": np.asarray(logits), "labels": np.asarray(labels)}
    batches = [
        (feats["logits"][i : i + 128], feats["labels"][i : i + 128])
        for i in range(0, 512, 128)
    ]
    # default: fit on the eval split itself (no held-out calibration set)
    out = CAL.evaluate_temperature_scaled(lambda x: jnp.asarray(x), batches)
    assert out["temperature"] > 1.5
    for k in ("acc1", "nll", "ece", "loss"):
        assert np.isfinite(out[k])
    # explicit fit split: same distribution → nearly the same T
    out2 = CAL.evaluate_temperature_scaled(
        lambda x: jnp.asarray(x), batches[:2], fit_batches=batches[2:]
    )
    assert abs(out2["temperature"] - out["temperature"]) / out["temperature"] < 0.25


def test_cli_flag_parses_and_guards():
    import pytest

    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args(["--eval", "--temp_scaling"])
    assert args.temp_scaling
    # combination guard lives in run_eval_dispatch; parse-level both accept
    args = FT.get_args_parser().parse_args(
        ["--eval", "--temp_scaling", "--laplace"])
    assert args.temp_scaling and args.laplace


def test_heldout_split_properties():
    import pytest

    fit, rep = CAL.heldout_split(100, 0.1, seed=3)
    assert fit.shape[0] == 10 and rep.shape[0] == 90
    assert not set(fit) & set(rep)
    assert sorted(np.concatenate([fit, rep])) == list(range(100))
    # deterministic under the same seed, different under another
    fit2, _ = CAL.heldout_split(100, 0.1, seed=3)
    np.testing.assert_array_equal(fit, fit2)
    assert not np.array_equal(fit, CAL.heldout_split(100, 0.1, seed=4)[0])
    # both sides non-empty at the extremes
    fit, rep = CAL.heldout_split(2, 0.9, seed=0)
    assert fit.shape[0] == 1 and rep.shape[0] == 1
    with pytest.raises(ValueError):
        CAL.heldout_split(1, 0.1)
    with pytest.raises(ValueError):
        CAL.heldout_split(100, 0.0)
    with pytest.raises(ValueError):
        CAL.heldout_split(100, 1.0)


def test_evaluate_temperature_scaled_heldout():
    """--temp_scaling_split heldout (VERDICT r4 item 8): T* fits on the
    carve-out only, metrics are reported on the remainder — leak-free Guo
    et al. protocol. Same-distribution carve-out recovers nearly the same
    T as the full-split fit."""
    import pytest

    logits, labels = _make(3.0, n=2048)
    batches = [
        (np.asarray(logits)[i : i + 256], np.asarray(labels)[i : i + 256])
        for i in range(0, 2048, 256)
    ]
    full = CAL.evaluate_temperature_scaled(lambda x: jnp.asarray(x), batches)
    held = CAL.evaluate_temperature_scaled(
        lambda x: jnp.asarray(x), batches, heldout_frac=0.25, heldout_seed=7
    )
    assert held["heldout_fit_samples"] == 512.0
    assert abs(held["temperature"] - full["temperature"]) / full["temperature"] < 0.2
    assert float(held["nll"]) < float(
        M.classification_metrics(logits, labels)["nll"]
    )
    with pytest.raises(ValueError, match="not both"):
        CAL.evaluate_temperature_scaled(
            lambda x: jnp.asarray(x), batches, fit_batches=batches[:1],
            heldout_frac=0.1,
        )


def test_cli_heldout_flag_parses():
    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args(
        ["--eval", "--temp_scaling", "--temp_scaling_split", "heldout",
         "--temp_scaling_heldout_frac", "0.2"])
    assert args.temp_scaling_split == "heldout"
    assert args.temp_scaling_heldout_frac == 0.2
