"""Golden-weights harness (tools/golden_eval.py — VERDICT r4 item 9).

The published reference pickles are unfetchable offline, so the harness is
validated end-to-end against exporter-generated weights: a tiny model's
params exported to a torch .pth (the exact container layout the reference
ships, {'model': state_dict}) must flow through golden_eval's CLI path —
importer, dataset builder, eval loop — and reproduce the direct eval
numbers, with the --expect gate passing on the measured triple and failing
on a wrong one.
"""

import pickle
import sys

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, "/root/repo/tools")
import golden_eval as GE  # noqa: E402


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    base = root / "cifar-100-python"
    base.mkdir()
    rs = np.random.RandomState(0)
    for name, n in (("train", 64), ("test", 48)):
        data = rs.randint(0, 255, (n, 3072), dtype=np.uint8)
        labels = (np.arange(n) % 10).tolist()
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)
    return str(root)


@pytest.fixture(scope="module")
def tiny_pth(tmp_path_factory):
    """Exporter-generated .pth in the reference's {'model': sd} layout."""
    from uncertainty_vit_tpu.core.config import get_preset
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.utils import checkpoint as C

    model = VisionTransformer(
        cfg=get_preset("beit_test_patch16_32", num_classes=100))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    sd = C.export_torch_state_dict(params)
    path = tmp_path_factory.mktemp("w") / "tiny_golden.pth"
    torch.save({"model": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}},
               str(path))
    return str(path)


def _args(cifar_root, tiny_pth, expect=None):
    argv = ["--pth", tiny_pth, "--model", "beit_test_patch16_32",
            "--data_path", cifar_root, "--data_set", "CIFAR100",
            "--input_size", "32", "--batch_size", "16",
            "--num_workers", "0", "--dtype", "float32"]
    if expect:
        argv += ["--expect", expect]
    return argv


def test_golden_eval_matches_direct_cli_eval(cifar_root, tiny_pth):
    from uncertainty_vit_tpu.cli import finetune as FT

    a = GE.get_args_parser().parse_args(_args(cifar_root, tiny_pth))
    out = GE.run(a)
    assert out["line"].startswith("* Acc@1 ")
    assert 0.0 <= out["acc1"] <= 100.0 and np.isfinite(out["loss"])

    # same .pth through the CLI directly → identical numbers
    direct = FT.main(FT.get_args_parser().parse_args(GE.build_cli_argv(a)))
    assert out["acc1"] == pytest.approx(float(direct["eval"]["acc1"]))
    assert out["acc5"] == pytest.approx(float(direct["eval"]["acc5"]))
    assert out["loss"] == pytest.approx(float(direct["eval"]["nll"]))


def test_golden_eval_expect_gate(cifar_root, tiny_pth, capsys):
    a = GE.get_args_parser().parse_args(_args(cifar_root, tiny_pth))
    out = GE.run(a)
    measured = f"{out['acc1']:.3f},{out['acc5']:.3f},{out['loss']:.3f}"

    assert GE.main(_args(cifar_root, tiny_pth, expect=measured)) == 0
    assert "* Acc@1" in capsys.readouterr().out

    rc = GE.main(_args(cifar_root, tiny_pth, expect="99.9,99.9,0.001"))
    assert rc == 1
    assert "GOLDEN MISMATCH" in capsys.readouterr().err
