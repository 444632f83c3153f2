"""Integration tests driving the CLI mains on a synthetic CIFAR fixture —
the analogue of the reference's run_class_finetuning_test.py manual test
(SURVEY.md §4), but automated and on the 8-device CPU mesh."""

import json
import os
import pickle

import numpy as np
import pytest

from uncertainty_vit_tpu.cli import finetune as FT
from uncertainty_vit_tpu.cli import pretrain_beit as PB
from uncertainty_vit_tpu.cli import pretrain_cyclical as PC
from uncertainty_vit_tpu.cli import pretrain_joint as PJ


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    base = root / "cifar-100-python"
    base.mkdir()
    rs = np.random.RandomState(0)
    for name, n in (("train", 128), ("test", 64)):
        data = rs.randint(0, 255, (n, 3072), dtype=np.uint8)
        labels = (np.arange(n) % 10).tolist()  # 10 classes present
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)
    return str(root)


def common_flags(cifar_root, out, extra=()):
    return [
        "--model", "beit_test_patch16_32", "--input_size", "32",
        "--data_set", "CIFAR100", "--data_path", cifar_root,
        "--batch_size", "16", "--epochs", "1", "--num_workers", "0",
        "--output_dir", out, "--save_ckpt_freq", "1",
        "--warmup_epochs", "0", "--dtype", "float32",
        *extra,
    ]


def test_cli_pretrain_cyclical(cifar_root, tmp_path):
    out = str(tmp_path / "cyc")
    args = PC.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--num_mask_patches", "2", "--min_mask_patches_per_block", "1",
        "--target_layers", "[0,1]", "--steps_per_epoch", "4",
    )))
    state = PC.main(args)
    assert int(state.step) == 4
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert log and np.isfinite(log[0]["train_loss"])


def test_cli_pretrain_cyclical_gp_layer(cifar_root, tmp_path):
    """--gp_layer: the student's lm_head is an SNGP module
    (modeling_cyclical.py:133) whose precision matrix streams during
    pretraining."""
    out = str(tmp_path / "cyc_gp")
    args = PC.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--num_mask_patches", "2", "--min_mask_patches_per_block", "1",
        "--target_layers", "[0,1]", "--steps_per_epoch", "2", "--gp_layer",
    )))
    state = PC.main(args)
    assert int(state.step) == 2
    assert state.sngp_state is not None and state.sngp_frozen is not None
    # lm_head params exist and the GP precision matrix moved off its
    # ridge-initialized value (update_cov streams every train step).
    assert "lm_head" in state.params
    prec = state.sngp_state["lm_head"]["precision_matrix"]
    ridge_init = 1e-3 * np.eye(prec.shape[0])
    assert not np.allclose(np.asarray(prec), ridge_init)
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert log and np.isfinite(log[0]["train_loss"])


def test_cli_finetune_train_and_best_ckpt(cifar_root, tmp_path):
    out = str(tmp_path / "ft")
    args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--steps_per_epoch", "4", "--mixup", "0.0", "--cutmix", "0.0",
        "--reprob", "0.0",
    )))
    state = FT.main(args)
    assert int(state.step) == 4
    assert os.path.isdir(os.path.join(out, "checkpoint-best"))
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert "test_acc1" in log[0] and "test_ece" in log[0]


def test_cli_finetune_eval_only(cifar_root, tmp_path):
    out = str(tmp_path / "ev")
    args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, ("--eval",)))
    results = FT.main(args)
    assert "eval" in results
    assert 0.0 <= results["eval"]["acc1"] <= 100.0
    assert np.isfinite(results["eval"]["nll"])


def test_cli_finetune_eval_mc_dropout(cifar_root, tmp_path):
    out = str(tmp_path / "mc")
    args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--eval", "--mc_dropout", "--mc_dropout_forwards", "3", "--drop", "0.1",
        "--drop_path", "0.0",
    )))
    results = FT.main(args)
    assert "mc_dropout" in results and np.isfinite(results["mc_dropout"]["nll"])


def test_cli_finetune_eval_laplace(cifar_root, tmp_path):
    """--laplace end-to-end: fit loader built from the train split, KFAC
    factors fit, prior tuned by marglik, probit predictive evaluated
    (the reference's intended-but-dead dispatch,
    run_class_finetuning.py:651-656)."""
    out = str(tmp_path / "la")
    args = FT.get_args_parser().parse_args(
        common_flags(cifar_root, out, ("--eval", "--laplace")))
    results = FT.main(args)
    assert "laplace" in results
    r = results["laplace"]
    assert 0.0 <= r["acc1"] <= 100.0 and np.isfinite(r["nll"])
    assert r["prior_precision"] > 0
    # combinations with another uncertainty dispatch error explicitly
    # rather than silently dropping a flag (-C is the composable exception,
    # tested in test_cli_eval_paths.test_cli_eval_corrupted_laplace)
    for combo in (("--perturbed_data",), ("--mc_dropout",)):
        args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, (
            "--eval", "--laplace", *combo,
        )))
        with pytest.raises(ValueError, match="laplace"):
            FT.main(args)


def test_cli_finetune_eval_temp_scaling(cifar_root, tmp_path):
    """--temp_scaling end-to-end: T fit on the train split, calibrated
    metrics on the eval split; combining with --laplace errors."""
    out = str(tmp_path / "ts")
    args = FT.get_args_parser().parse_args(
        common_flags(cifar_root, out, ("--eval", "--temp_scaling")))
    results = FT.main(args)
    r = results["temp_scaling"]
    assert r["temperature"] > 0 and np.isfinite(r["nll"])
    args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--eval", "--temp_scaling", "--laplace",
    )))
    with pytest.raises(ValueError, match="temp_scaling"):
        FT.main(args)


def test_cli_pretrain_beit(cifar_root, tmp_path):
    out = str(tmp_path / "beit")
    args = PB.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--num_mask_patches", "2", "--min_mask_patches_per_block", "1",
        "--vocab_size", "64", "--second_input_size", "8",
        "--dvae_num_layers", "2", "--dvae_hidden_dim", "8",
        "--steps_per_epoch", "2",
    )))
    state = PB.main(args)
    assert int(state.step) == 2


def test_cli_pretrain_joint(cifar_root, tmp_path):
    out = str(tmp_path / "joint")
    args = PJ.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--num_mask_patches", "2", "--min_mask_patches_per_block", "1",
        "--vocab_size", "64", "--second_input_size", "8",
        "--dvae_num_layers", "2", "--dvae_hidden_dim", "8",
        "--target_layers", "[0,1]", "--steps_per_epoch", "2",
    )))
    state = PJ.main(args)
    assert int(state.step) == 2


def test_cli_finetune_stochastic(cifar_root, tmp_path):
    out = str(tmp_path / "dist")
    args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--stochastic", "--steps_per_epoch", "2", "--mixup", "0.0",
        "--cutmix", "0.0", "--layer_scale_init_value", "0.1",
    )))
    state = FT.main(args)
    assert int(state.step) == 2
    # dist eval dispatch (run_class_finetuning.py:667-674 'stochastic'):
    # [2]-indexed logits from the (mean, cov, logits) triple
    args = FT.get_args_parser().parse_args(common_flags(cifar_root, out, (
        "--stochastic", "--eval", "--layer_scale_init_value", "0.1",
    )))
    results = FT.main(args)
    assert "dist_eval" in results
    assert 0.0 <= results["dist_eval"]["acc1"] <= 100.0
    assert np.isfinite(results["dist_eval"]["nll"])


def test_cli_train_dvae_produces_loadable_weights(cifar_root, tmp_path):
    """The dVAE trainer runs end-to-end and exports a weights checkpoint the
    BEiT pretrainer can restore via --discrete_vae_weight_path (the
    reference has no in-repo producer for its tokenizer weights —
    modeling_discrete_vae.py:203-225 loads OpenAI pickles)."""
    from uncertainty_vit_tpu.cli import train_dvae as TD

    out = str(tmp_path / "dvae")
    args = TD.get_args_parser().parse_args([
        "--data_set", "CIFAR100", "--data_path", cifar_root,
        "--batch_size", "8", "--epochs", "1", "--num_workers", "0",
        "--output_dir", out, "--save_ckpt_freq", "1",
        "--input_size", "8", "--vocab_size", "64",
        "--dvae_num_layers", "2", "--dvae_hidden_dim", "8",
        "--codebook_dim", "16", "--steps_per_epoch", "3",
        "--warmup_epochs", "0",
    ])
    variables = TD.main(args)
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert np.isfinite(log[0]["train_loss"])
    assert 0.0 < log[0]["train_codebook_used_frac"] <= 1.0
    weights_path = os.path.join(out, "checkpoint-dvae-weights")
    assert os.path.isdir(weights_path)

    # the exported weights restore into the BEiT pretrainer's dVAE template
    from uncertainty_vit_tpu.models.dvae import DiscreteVAE
    from uncertainty_vit_tpu.utils import checkpoint as C
    import jax
    import jax.numpy as jnp

    dvae = DiscreteVAE(image_size=8, num_tokens=64, codebook_dim=16,
                       num_layers=2, hidden_dim=8)
    template = dvae.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    restored = C.restore_checkpoint(weights_path, template)
    idx = dvae.apply(restored, jnp.zeros((2, 8, 8, 3)),
                     method=dvae.get_codebook_indices)
    assert idx.shape == (2, 4)  # 8/4 grid at 2 layers → 2x2 tokens
