"""CLI eval-dispatch coverage: SNGP/het heads, ensembles, corruption and
perturbation paths on synthetic fixtures."""

import json
import os
import pickle

import numpy as np
import pytest

from uncertainty_vit_tpu.cli import finetune as FT


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    base = root / "cifar-100-python"
    base.mkdir()
    rs = np.random.RandomState(0)
    for name, n in (("train", 64), ("test", 48)):
        with open(base / name, "wb") as f:
            pickle.dump({b"data": rs.randint(0, 255, (n, 3072), dtype=np.uint8),
                         b"fine_labels": (np.arange(n) % 10).tolist()}, f)
    # CIFAR-C style files
    croot = root / "cifar-100-c"
    croot.mkdir()
    np.save(croot / "labels.npy", rs.randint(0, 10, 40))
    for d in ("gaussian_noise", "fog"):
        np.save(croot / f"{d}.npy", rs.randint(0, 255, (40, 32, 32, 3), dtype=np.uint8))
    # CIFAR-P style videos
    proot = root / "cifar-100-p"
    proot.mkdir()
    for p in ("gaussian_noise", "rotate"):
        np.save(proot / f"{p}.npy", rs.randint(0, 255, (4, 3, 32, 32, 3), dtype=np.uint8))
    return str(root)


def flags(cifar_root, out, extra=()):
    return [
        "--model", "beit_test_patch16_32", "--input_size", "32",
        "--data_set", "CIFAR100", "--data_path", cifar_root,
        "--batch_size", "16", "--epochs", "1", "--num_workers", "0",
        "--output_dir", out, "--warmup_epochs", "0", "--dtype", "float32",
        *extra,
    ]


def test_cli_finetune_sngp_head(cifar_root, tmp_path):
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "sngp"), (
        "--sngp", "--gp_layer", "--steps_per_epoch", "2",
        "--mixup", "0.0", "--cutmix", "0.0",
    )))
    state = FT.main(args)
    assert int(state.step) == 2
    assert state.sngp_state is not None


def test_cli_finetune_het_head(cifar_root, tmp_path):
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "het"), (
        "--het_layer", "--steps_per_epoch", "2", "--mixup", "0.0", "--cutmix", "0.0",
    )))
    state = FT.main(args)
    assert int(state.step) == 2


def test_cli_eval_corrupted(cifar_root, tmp_path, monkeypatch):
    import uncertainty_vit_tpu.evals.robustness as R

    monkeypatch.setattr(R, "DISTORTIONS", ("gaussian_noise", "fog"))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "c"), (
        "--eval", "--corrupted_data",
        "--corruption_data_path", os.path.join(cifar_root, "cifar-100-c"),
    )))
    results = FT.main(args)
    c = results["corruption"]
    assert set(c["per_distortion"]) == {"gaussian_noise", "fog"}
    assert 0.0 <= c["mce_unnormalized"] <= 1.0


def test_cli_eval_perturbed(cifar_root, tmp_path, monkeypatch):
    import uncertainty_vit_tpu.evals.robustness as R

    monkeypatch.setattr(R, "PERTURBATIONS", ("gaussian_noise", "rotate"))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "p"), (
        "--eval", "--perturbed_data",
        "--perturbation_data_path", os.path.join(cifar_root, "cifar-100-p"),
    )))
    results = FT.main(args)
    p = results["perturbation"]
    assert set(p["per_perturbation"]) == {"gaussian_noise", "rotate"}
    assert 0.0 <= p["mean_flip_prob"] <= 1.0


def test_cli_eval_ensembles(cifar_root, tmp_path):
    # train briefly twice to get two member checkpoints
    members = []
    for i in range(2):
        out = str(tmp_path / f"m{i}")
        args = FT.get_args_parser().parse_args(flags(cifar_root, out, (
            "--steps_per_epoch", "1", "--mixup", "0.0", "--cutmix", "0.0",
            "--seed", str(i), "--save_ckpt_freq", "1",
        )))
        FT.main(args)
        members.append(os.path.join(out, "checkpoint-0"))

    # orbax stores the pytree; restore member params via the checkpoint dir
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "ens"), (
        "--eval", "--ensembles",
        "--ensemble_checkpoints", *members,
    )))
    results = FT.main(args)
    assert len(results["ensembles"]["members"]) == 2
    assert "ensemble" in results["ensembles"]


def test_distributed_helpers():
    from uncertainty_vit_tpu.parallel.distributed import (
        init_distributed_mode, is_main_process, save_on_master,
    )

    rank = init_distributed_mode(suppress_output=False)
    assert rank == 0 and is_main_process()
    assert save_on_master(lambda: 42) == 42
