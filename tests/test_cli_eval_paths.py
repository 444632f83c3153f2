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


def test_cli_eval_corrupted_laplace(cifar_root, tmp_path, monkeypatch):
    """-C under the Laplace GLM predictive: the posterior fits on the train
    split, then evaluate_corruption runs argmax over calibrated log-probs
    (beyond-reference composition — the reference's laplace path is dead)."""
    import uncertainty_vit_tpu.evals.robustness as R

    monkeypatch.setattr(R, "DISTORTIONS", ("fog",))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "cla"), (
        "--eval", "--corrupted_data", "--laplace",
        "--corruption_data_path", os.path.join(cifar_root, "cifar-100-c"),
    )))
    results = FT.main(args)
    assert "fog" in results["corruption"]["per_distortion"]
    assert 0.0 <= results["corruption"]["mce_unnormalized"] <= 1.0


def test_cli_eval_corrupted_mc_dropout(cifar_root, tmp_path, monkeypatch):
    """mc_dropout_c_evaluate wiring (uncertainty_evaluations.py:479-534);
    the MC model must be rebuilt with drop_path_rate=0."""
    import uncertainty_vit_tpu.evals.robustness as R

    monkeypatch.setattr(R, "DISTORTIONS", ("fog",))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "cmc"), (
        "--eval", "--corrupted_data", "--mc_dropout", "--mc_dropout_forwards", "2",
        "--drop", "0.1", "--drop_path", "0.1",
        "--corruption_data_path", os.path.join(cifar_root, "cifar-100-c"),
    )))
    results = FT.main(args)
    assert "fog" in results["corruption"]["per_distortion"]


def test_cli_eval_corrupted_ensembles(cifar_root, tmp_path, monkeypatch):
    """ensembles_c_evaluate wiring (uncertainty_evaluations.py:393-476)."""
    import uncertainty_vit_tpu.evals.robustness as R

    members = []
    for i in range(2):
        out = str(tmp_path / f"cm{i}")
        args = FT.get_args_parser().parse_args(flags(cifar_root, out, (
            "--steps_per_epoch", "1", "--mixup", "0.0", "--cutmix", "0.0",
            "--seed", str(i), "--save_ckpt_freq", "1",
        )))
        FT.main(args)
        members.append(os.path.join(out, "checkpoint-0"))

    monkeypatch.setattr(R, "DISTORTIONS", ("fog",))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "cens"), (
        "--eval", "--corrupted_data", "--ensembles",
        "--ensemble_checkpoints", *members,
        "--corruption_data_path", os.path.join(cifar_root, "cifar-100-c"),
    )))
    results = FT.main(args)
    assert "fog" in results["corruption"]["per_distortion"]


def test_cli_eval_perturbed_mc_dropout(cifar_root, tmp_path, monkeypatch):
    """mc_dropout_p_evaluate wiring (uncertainty_evaluations.py:661-720)."""
    import uncertainty_vit_tpu.evals.robustness as R

    monkeypatch.setattr(R, "PERTURBATIONS", ("rotate",))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "pmc"), (
        "--eval", "--perturbed_data", "--mc_dropout", "--mc_dropout_forwards", "2",
        "--drop", "0.1",
        "--perturbation_data_path", os.path.join(cifar_root, "cifar-100-p"),
    )))
    results = FT.main(args)
    assert "rotate" in results["perturbation"]["per_perturbation"]


def test_cli_eval_perturbed_ensembles(cifar_root, tmp_path, monkeypatch):
    """ensembles_p_evaluate wiring (uncertainty_evaluations.py:724-737,
    dispatched at :635): member-mean logits per perturbation frame."""
    import uncertainty_vit_tpu.evals.robustness as R

    members = []
    for i in range(2):
        out = str(tmp_path / f"pm{i}")
        args = FT.get_args_parser().parse_args(flags(cifar_root, out, (
            "--steps_per_epoch", "1", "--mixup", "0.0", "--cutmix", "0.0",
            "--seed", str(i), "--save_ckpt_freq", "1",
        )))
        FT.main(args)
        members.append(os.path.join(out, "checkpoint-0"))

    monkeypatch.setattr(R, "PERTURBATIONS", ("rotate",))
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "pens"), (
        "--eval", "--perturbed_data", "--ensembles",
        "--ensemble_checkpoints", *members,
        "--perturbation_data_path", os.path.join(cifar_root, "cifar-100-p"),
    )))
    results = FT.main(args)
    p = results["perturbation"]
    assert "rotate" in p["per_perturbation"]
    assert 0.0 <= p["mean_flip_prob"] <= 1.0


def test_cli_sngp_exact_accumulation_resets_per_epoch(cifar_root, tmp_path, monkeypatch):
    """--sngp_cov_momentum <= 0: reset_cov fires at the start of every epoch
    (modeling_finetune.py:596-616) and exact accumulation sums phi^T phi."""
    import uncertainty_vit_tpu.models.registry as REG

    calls = []
    real_reset = REG.sngp_reset_cov
    monkeypatch.setattr(
        REG, "sngp_reset_cov",
        lambda st, ridge: (calls.append(ridge), real_reset(st, ridge))[1],
    )
    args = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "sx"), (
        "--sngp", "--gp_layer", "--sngp_cov_momentum", "-1",
        "--steps_per_epoch", "1", "--mixup", "0.0", "--cutmix", "0.0",
    )))
    args.epochs = 2
    state = FT.main(args)
    assert len(calls) == 2  # one reset per epoch

    import jax
    prec = np.asarray([
        l for l in jax.tree_util.tree_leaves(state.sngp_state)
        if getattr(l, "ndim", 0) == 2 and l.shape[0] == l.shape[1]
    ][0])
    # after the final reset + one exact phi^T phi step the diagonal exceeds
    # the ridge floor (phi columns have nonzero squared sums)
    assert float(np.min(np.diag(prec))) > 1e-3

    # momentum > 0 (default): no reset is issued
    calls.clear()
    args2 = FT.get_args_parser().parse_args(flags(cifar_root, str(tmp_path / "sm"), (
        "--sngp", "--gp_layer",
        "--steps_per_epoch", "1", "--mixup", "0.0", "--cutmix", "0.0",
    )))
    FT.main(args2)
    assert calls == []


def test_reference_flag_mapping_matches_create_model_semantics():
    """The reference recipes translate flag-for-flag: --rel_pos_bias is the
    SHARED table (run_class_finetuning.py:358-360 passes it as
    use_shared_rel_pos_bias with per-block use_rel_pos_bias hard-coded
    False) and --abs_pos_emb defaults False (run_cyclical.py:54-55)."""
    from uncertainty_vit_tpu.cli import builders as B
    from uncertainty_vit_tpu.cli import finetune as FT

    # reference defaults: rel_pos_bias=True, abs_pos_emb=False
    args = FT.get_args_parser().parse_args([])
    cfg = B.model_config_from_args(args, num_classes=10)
    assert cfg.use_shared_rel_pos_bias is True
    assert cfg.use_rel_pos_bias is False
    assert cfg.use_abs_pos_emb is False

    # --disable_rel_pos_bias equivalent + --abs_pos_emb (data2vec-style)
    args = FT.get_args_parser().parse_args(
        ["--rel_pos_bias", "False", "--abs_pos_emb", "True"]
    )
    cfg = B.model_config_from_args(args, num_classes=10)
    assert cfg.use_shared_rel_pos_bias is False
    assert cfg.use_abs_pos_emb is True

    # per-block tables are an extension under their own flag
    args = FT.get_args_parser().parse_args(["--per_block_rel_pos_bias", "True"])
    cfg = B.model_config_from_args(args, num_classes=10)
    assert cfg.use_rel_pos_bias is True


def test_cli_visualize_embedding(cifar_root, tmp_path):
    """--visualize_embedding dumps projector TSVs and exits before training
    (run_class_finetuning.py:242, 634-637)."""
    from uncertainty_vit_tpu.cli import finetune as FT

    out = str(tmp_path / "viz")
    args = FT.get_args_parser().parse_args([
        "--model", "beit_test_patch16_32", "--input_size", "32",
        "--data_set", "CIFAR100", "--data_path", cifar_root,
        "--batch_size", "16", "--num_workers", "0", "--dtype", "float32",
        "--output_dir", out, "--visualize_embedding",
    ])
    FT.main(args)
    feats = np.loadtxt(os.path.join(out, "embeddings.tsv"))
    labels = np.loadtxt(os.path.join(out, "embeddings_labels.tsv"))
    assert feats.ndim == 2 and feats.shape[0] == labels.shape[0] > 0


def test_new_reference_flags_wire_through(cifar_root, tmp_path):
    """Round-2 flag-parity additions: --use_cls, --init_scale, --remode/
    --recount, --disable_eval_during_finetuning, --no_save_ckpt, and the
    reference-compat no-ops all parse and drive a short training run."""
    from uncertainty_vit_tpu.cli import builders as B2
    from uncertainty_vit_tpu.cli import finetune as FT

    out = str(tmp_path / "flags")
    args = FT.get_args_parser().parse_args([
        "--model", "beit_test_patch16_32", "--input_size", "32",
        "--data_set", "CIFAR100", "--data_path", cifar_root,
        "--batch_size", "16", "--epochs", "1", "--num_workers", "0",
        "--output_dir", out, "--dtype", "float32", "--steps_per_epoch", "2",
        "--mixup", "0.0", "--cutmix", "0.0", "--warmup_epochs", "0",
        "--use_cls", "--init_scale", "0.01", "--remode", "const",
        "--recount", "2", "--disable_eval_during_finetuning",
        "--no_save_ckpt", "--train_interpolation", "bilinear",
        "--dist_url", "env://", "--world_size", "8", "--pin_mem",
        "--disable_weight_decay_on_rel_pos_bias",
    ])
    cfg = B2.model_config_from_args(args, num_classes=10)
    assert cfg.use_mean_pooling is False and cfg.init_scale == 0.01
    state = FT.main(args)
    assert int(state.step) == 2
    # --no_save_ckpt + --disable_eval_during_finetuning: no checkpoints, no
    # test metrics in the log
    import glob
    assert not glob.glob(os.path.join(out, "checkpoint-*"))
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert "test_acc1" not in log[0] and "train_loss" in log[0]


def test_unpadded_shards_forced_padded_under_cross_host_seq_parallel(
    cifar_root, monkeypatch
):
    """When the device mesh spans processes (--seq_parallel with multiple
    hosts), unpadded shards would desynchronize SPMD dispatch counts —
    build_loaders must force pad_shards=True (review finding)."""
    import jax as _jax

    from uncertainty_vit_tpu.cli import builders as B2
    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args([
        "--data_set", "CIFAR100", "--data_path", cifar_root,
        "--batch_size", "16", "--num_workers", "0", "--seq_parallel", "2",
    ])
    monkeypatch.setattr(B2.jax, "process_count", lambda: 2)
    loader, _ = B2.build_loaders(
        args, is_train=True, shuffle=False, drop_last=False, pad_shards=False
    )
    assert loader.pad_shards is True
    # single-host (or no cross-host sharding): the explicit request sticks
    monkeypatch.setattr(B2.jax, "process_count", lambda: 1)
    loader, _ = B2.build_loaders(
        args, is_train=True, shuffle=False, drop_last=False, pad_shards=False
    )
    assert loader.pad_shards is False


def test_attn_micro_mode_env_hooks(monkeypatch):
    """UVIT_ATTN_BOUNDED_SCORES / UVIT_ATTN_LSE_BF16 flip the trace-time
    kernel flags from the environment (cli/common.setup_jax)."""
    import jax.numpy as jnp

    from uncertainty_vit_tpu.cli import common
    from uncertainty_vit_tpu.ops import flash_attention as FA

    monkeypatch.setenv("UVIT_ATTN_BOUNDED_SCORES", "1")
    monkeypatch.setenv("UVIT_ATTN_LSE_BF16", "1")
    try:
        common.setup_jax()
        assert FA.BOUNDED_SCORES is True
        assert FA.LSE_DTYPE == jnp.bfloat16
    finally:
        FA.BOUNDED_SCORES = False
        FA.LSE_DTYPE = jnp.float32


def test_attn_bounded_scores_recipe_default(monkeypatch):
    """Round-5 decision: BOUNDED_SCORES defaults ON for the finetune recipe
    (setup_jax(bounded_scores_default=True)) and OFF elsewhere; the env var
    overrides in BOTH directions ("0" forces the exact max-subtracted path
    back even in a finetune driver)."""
    from uncertainty_vit_tpu.cli import common
    from uncertainty_vit_tpu.ops import flash_attention as FA

    monkeypatch.delenv("UVIT_ATTN_BOUNDED_SCORES", raising=False)
    monkeypatch.delenv("UVIT_ATTN_LSE_BF16", raising=False)
    try:
        common.setup_jax()  # pretraining drivers: exact path
        assert FA.BOUNDED_SCORES is False
        common.setup_jax(bounded_scores_default=True)  # finetune recipe
        assert FA.BOUNDED_SCORES is True
        FA.BOUNDED_SCORES = False
        monkeypatch.setenv("UVIT_ATTN_BOUNDED_SCORES", "0")  # explicit opt-out
        common.setup_jax(bounded_scores_default=True)
        assert FA.BOUNDED_SCORES is False
        monkeypatch.setenv("UVIT_ATTN_BOUNDED_SCORES", "1")  # opt-in anywhere
        common.setup_jax()
        assert FA.BOUNDED_SCORES is True
    finally:
        FA.BOUNDED_SCORES = False


def test_aug_knob_validation():
    """elem/pair and cutmix_minmax are now implemented (round-3 Missing #3);
    only genuinely unimplemented knobs / malformed values error."""
    from uncertainty_vit_tpu.cli import builders as B2
    from uncertainty_vit_tpu.cli import finetune as FT

    for ok in (["--mixup_mode", "elem"], ["--mixup_mode", "pair"],
               ["--cutmix_minmax", "0.2", "0.8"]):
        B2.validate_aug_args(FT.get_args_parser().parse_args(ok))
    args = FT.get_args_parser().parse_args(["--cutmix_minmax", "0.2"])
    with pytest.raises(ValueError, match="cutmix_minmax"):
        B2.validate_aug_args(args)
    # swapped / out-of-range bounds error loudly (timm's np.random.randint
    # raises for lo >= hi; a silent clamp would train a constant-size cut)
    for bad in (["0.8", "0.2"], ["-0.1", "0.5"], ["0.2", "1.5"]):
        args = FT.get_args_parser().parse_args(["--cutmix_minmax", *bad])
        with pytest.raises(ValueError, match="cutmix_minmax"):
            B2.validate_aug_args(args)
    # --resplit is a dead flag in the reference (parsed at
    # run_class_finetuning.py:134, never wired into build_transform);
    # parity behavior = accept it as a warned no-op, not an error
    args = FT.get_args_parser().parse_args(["--resplit"])
    with pytest.warns(UserWarning, match="resplit"):
        B2.validate_aug_args(args)


def test_aa_token_validation():
    """_aa_kwargs rejects unknown/unsupported tokens instead of silently
    dropping them (round-3 review: 'n3'/'p0.5' typos must error). The
    baked-in defaults (n2, inc1) and the supported knobs parse."""
    from uncertainty_vit_tpu.cli import finetune as FT

    def kwargs(aa):
        args = FT.get_args_parser().parse_args(["--aa", aa])
        return FT._aa_kwargs(args)

    assert kwargs("rand-m9-mstd0.5-inc1") == {
        "auto_augment": True, "aa_magnitude": 9.0, "aa_magnitude_std": 0.5}
    assert kwargs("rand-m7-mstd0.25-n2")["aa_magnitude"] == 7.0
    assert kwargs("none") == {}
    for bad in ("rand-m9-n3", "rand-p0.5", "rand-m9-inc0", "rand-w0",
                "original", "augmix-m3",
                # malformed numerics must give the diagnostic error too,
                # not a bare float() ValueError
                "rand-m9-mstd", "rand-m1.2.3", "rand-mstdx0.5"):
        with pytest.raises(ValueError, match="aa"):
            kwargs(bad)


def test_cutmix_minmax_alone_activates_mixing():
    """Regression: --mixup 0 --cutmix 0 --cutmix_minmax 0.2 0.8 must still
    activate mixing (timm forces cutmix_alpha=1.0 in minmax mode; reference
    gate run_class_finetuning.py:340 includes the minmax term). The CLI gate
    previously keyed on the alphas only, silently disabling the feature."""
    from uncertainty_vit_tpu.cli import builders as B2
    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args(
        ["--mixup", "0", "--cutmix", "0", "--cutmix_minmax", "0.2", "0.8"]
    )
    assert B2.mixup_active(args)
    args = FT.get_args_parser().parse_args(["--mixup", "0", "--cutmix", "0"])
    assert not B2.mixup_active(args)
    args = FT.get_args_parser().parse_args([])
    assert B2.mixup_active(args)  # defaults: mixup 0.8 / cutmix 1.0


def test_mc_mean_forward_redraws_masks_per_batch():
    """Regression (round-3 weak #3): the -C/-P MC-dropout dispatches used a
    fixed PRNGKey(0) for EVERY batch — identical dropout masks dataset-wide.
    The reference redraws masks every forward
    (uncertainty_evaluations.py:479-534); two calls on the same images must
    produce different mean logits."""
    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.cli import finetune as FT
    from uncertainty_vit_tpu.core.config import get_preset
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = get_preset("beit_test_patch16_32", num_classes=7, drop_rate=0.5)
    model = VisionTransformer(cfg=cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = {"params": model.init(jax.random.PRNGKey(0), imgs)["params"]}

    args = FT.get_args_parser().parse_args(
        ["--mc_dropout", "--mc_dropout_forwards", "2", "--seed", "0"]
    )
    fwd = FT._mc_mean_forward(args, model, variables)
    a, b = np.asarray(fwd(imgs)), np.asarray(fwd(imgs))
    assert not np.allclose(a, b), "dropout masks were reused across batches"
    # deterministic per counter position: a fresh forward stream restarts
    fwd2 = FT._mc_mean_forward(args, model, variables)
    np.testing.assert_allclose(np.asarray(fwd2(imgs)), a, rtol=1e-6)
