"""Supervised finetune / evaluation driver — replaces run_class_finetuning.py.

Recipe (README.md:33-39): 100 epochs, batch 8×128, lr 4e-3, layer_decay
0.65, mixup 0.8 / cutmix 1.0, weight decay 0.05.

Eval dispatch (run_class_finetuning.py:638-677): --eval runs plain
evaluation; add --mc_dropout / --ensembles / --corrupted_data /
--perturbed_data (combinable with --stochastic) for the uncertainty and
robustness benchmarks.
"""

from __future__ import annotations

import argparse
import collections
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.cli import builders as B
from uncertainty_vit_tpu.cli.common import setup_jax
from uncertainty_vit_tpu.data.pipeline import device_prefetch
from uncertainty_vit_tpu.data import datasets as D
from uncertainty_vit_tpu.evals import classification as E
from uncertainty_vit_tpu.evals import robustness as R
from uncertainty_vit_tpu.evals.ensembles import stack_params
from uncertainty_vit_tpu.models.dist_vit import DistVisionTransformer
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.ops.augment import eval_transform_batch, finetune_train_augment_batch
from uncertainty_vit_tpu.train.engine_finetune import (
    FinetuneHParams, init_finetune_state, make_finetune_train_step,
)
from uncertainty_vit_tpu.train.engine_finetune_dist import (
    DistFinetuneHParams, init_dist_finetune_state, make_dist_finetune_train_step,
)
from uncertainty_vit_tpu.train.optim import needs_hessian
from uncertainty_vit_tpu.utils import checkpoint as C
from uncertainty_vit_tpu.utils.logging import JsonlLogger, MetricLogger, TensorboardLogger


def get_args_parser():
    p = argparse.ArgumentParser("finetuning / evaluation", add_help=True)
    B.add_model_args(p)
    B.add_opt_args(p, lr=4e-3)
    B.add_data_args(p)
    B.add_io_args(p)
    g = p.add_argument_group("finetune")
    g.add_argument("--nb_classes", type=int, default=0, help="0 = infer from dataset")
    g.add_argument("--seq_parallel", type=int, default=1,
                   help="context-parallel factor: shard token activations "
                        "over a 'seq' mesh axis (384/512 scaling, SURVEY "
                        "§5.7); requires attn_drop=0 and devices divisible "
                        "by the factor")
    g.add_argument("--mixup", type=float, default=0.8)
    g.add_argument("--cutmix", type=float, default=1.0)
    g.add_argument("--mixup_prob", type=float, default=1.0)
    g.add_argument("--mixup_switch_prob", type=float, default=0.5)
    g.add_argument("--smoothing", type=float, default=0.1)
    g.add_argument("--model_ema", action="store_true")
    g.add_argument("--model_ema_decay", type=float, default=0.9999)
    g.add_argument("--masked_position_prob", type=float, default=0.0)
    g.add_argument("--target_layer", type=int, default=-1,
                   help="truncate blocks to [:N+1] (run_class_finetuning.py:520-522)")
    g.add_argument("--remove_final_norm", action="store_true")
    g.add_argument("--disable_eval_during_finetuning", action="store_true")
    g.add_argument("--dual_finetune", action="store_true",
                   help="keep the checkpoint head/norms verbatim on import "
                        "(run_class_finetuning.py:408-418 skips the "
                        "shape-mismatch head drop)")
    g.add_argument("--reinit_final_norm", action="store_true",
                   help="drop norm/fc_norm from the imported checkpoint "
                        "(run_class_finetuning.py:413-417)")
    g.add_argument("--laplace", action="store_true",
                   help="last-layer KFAC Laplace on the linear head, fit on "
                        "the train split with marginal-likelihood prior "
                        "tuning (the reference's intended dispatch, "
                        "run_class_finetuning.py:651-656, is dead there — "
                        "its laplace import is commented out at :40; this "
                        "is a native implementation, evals/laplace.py)")
    g.add_argument("--laplace_link", choices=["probit", "mc"], default="probit",
                   help="Laplace predictive link approximation")
    g.add_argument("--temp_scaling", action="store_true",
                   help="post-hoc temperature scaling (Guo et al. 2017) — a "
                        "calibration baseline the reference's metric suite "
                        "measures against but never provides "
                        "(evals/calibration.py)")
    g.add_argument("--temp_scaling_split", choices=["eval", "train", "heldout"],
                   default="eval",
                   help="where to fit T*: 'eval' fits the one scalar on the "
                        "reported split (standard when no held-out "
                        "calibration set exists; negligible leak), 'heldout' "
                        "carves --temp_scaling_heldout_frac of eval for the "
                        "fit and reports on the remainder (Guo et al. "
                        "protocol, leak-free), 'train' matches the Laplace "
                        "protocol (sound only for underfit models — "
                        "near-zero train NLL gives T*~1)")
    g.add_argument("--temp_scaling_heldout_frac", type=float, default=0.1,
                   help="fraction of the eval split carved out as the T* fit "
                        "set under --temp_scaling_split heldout")
    g.add_argument("--lambda_finetuning", type=float, default=1e-4)
    g.add_argument("--lambda_pvn", type=float, default=1e-4)
    e = p.add_argument_group("evaluation")
    e.add_argument("--eval", action="store_true")
    e.add_argument("--mc_dropout", action="store_true")
    e.add_argument("--mc_dropout_forwards", type=int, default=8)
    e.add_argument("--mc_dropout_split_at", type=int, default=0,
                   help="share blocks [0, s) across the K samples (one "
                        "deterministic trunk pass). EXACT MC-dropout when "
                        "--dropout_from_block >= s; otherwise a documented "
                        "last-layers approximation. Meets the K=8 <= 4x "
                        "cost target at s >= 8 (depth 12)")
    e.add_argument("--visualize_embedding", action="store_true",
                   help="dump val-set pooled features as TensorBoard-"
                        "projector TSVs + a PCA scatter, then exit "
                        "(run_class_finetuning.py:634-637)")
    e.add_argument("--ensembles", action="store_true")
    e.add_argument("--ensemble_checkpoints", type=str, nargs="*", default=[])
    e.add_argument("--corrupted_data", action="store_true")
    e.add_argument("--perturbed_data", action="store_true")
    e.add_argument("--corruption_data_path", type=str, default=None)
    e.add_argument("--perturbation_data_path", type=str, default=None)
    e.add_argument("--wnids_path", type=str, default=None,
                   help="wnids.txt for TinyImageNet-C class ids (defaults: "
                        "corruption root, then a sibling clean TinyImageNet dir)")
    return p


def _aa_kwargs(args):
    """Parse 'rand-mM-mstdS[-inc1]' (run_class_finetuning.py default aa).

    Unknown or unsupported tokens ERROR rather than silently dropping
    (round-3 review: a recipe typo like 'n3' or 'p0.5' must not become a
    silent semantic change). The on-device RandAugment bakes in timm's
    two-round, increasing-severity (inc1) configuration, so n2/inc1 are
    accepted as no-ops and every other timm knob is rejected."""
    aa = getattr(args, "aa", None)
    if not aa or aa in ("None", "none"):
        return {}
    parts = aa.split("-")
    if parts[0] != "rand":
        raise ValueError(
            f"--aa policy {aa!r} not supported: only timm 'rand-...' "
            "configs map onto the on-device RandAugment "
            "(ops/randaugment.py); 'original'/'augmix' policies are not "
            "carried"
        )
    def bad(part):
        return ValueError(
            f"unsupported --aa token {part!r} in {aa!r}: the on-device "
            "RandAugment supports m<mag>, mstd<std>, inc1, n2 "
            "(two rounds and increasing severity are baked in)"
        )

    mag, mstd = 9.0, 0.5
    for part in parts[1:]:
        if part.startswith("mstd"):
            try:
                mstd = float(part[4:])
            except ValueError:
                raise bad(part) from None
        elif part in ("inc1", "n2"):
            pass  # the baked-in defaults (increasing tables, two rounds)
        elif part.startswith("m") and part[1:].replace(".", "").isdigit():
            try:
                mag = float(part[1:])
            except ValueError:  # e.g. 'm1.2.3' passes the isdigit gate
                raise bad(part) from None
        else:
            raise bad(part)
    return {"auto_augment": True, "aa_magnitude": mag, "aa_magnitude_std": mstd}


def build_model(args, nb_classes):
    cfg = B.model_config_from_args(args, nb_classes)
    if getattr(args, "masked_position_prob", 0.0) > 0:
        cfg = cfg.replace(has_masking=True)
    if getattr(args, "target_layer", -1) != -1 and not args.learn_layer_weights:
        cfg = cfg.replace(depth=args.target_layer + 1)
    if getattr(args, "remove_final_norm", False):
        cfg = cfg.replace(remove_final_norm=True)
    dtype = B.compute_dtype(args)
    seq_mesh = None
    if getattr(args, "seq_parallel", 1) > 1:
        # context parallelism for 384/512 inputs (SURVEY §5.7): token
        # activations shard over the 'seq' mesh axis; the attention kernel
        # partitions via its shard_map wrapper (ops/flash_attention.py)
        from uncertainty_vit_tpu.parallel import mesh as pmesh

        seq_mesh = pmesh.create_mesh(seq_parallel=args.seq_parallel)
    if args.stochastic:
        if seq_mesh is not None:
            raise ValueError("--seq_parallel is not wired for --stochastic")
        return DistVisionTransformer(cfg=cfg, dtype=dtype), cfg
    return VisionTransformer(cfg=cfg, seq_mesh=seq_mesh, dtype=dtype), cfg


def _eval_prep(images_u8, args):
    """On-device eval transform for one uint8 batch (shape decision is
    static, so this is jittable and reusable inside fused train steps)."""
    crop_pct = args.crop_pct or (224 / 256 if args.input_size < 384 else 1.0)
    if images_u8.shape[1] != args.input_size:
        return eval_transform_batch(
            jnp.asarray(images_u8), args.input_size, crop_pct,
            args.imagenet_default_mean_and_std,
        )
    from uncertainty_vit_tpu.ops.augment import (
        IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD,
        IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD, normalize, to_float,
    )
    mean = (IMAGENET_DEFAULT_MEAN if args.imagenet_default_mean_and_std
            else IMAGENET_INCEPTION_MEAN)
    std = (IMAGENET_DEFAULT_STD if args.imagenet_default_mean_and_std
           else IMAGENET_INCEPTION_STD)
    return normalize(to_float(jnp.asarray(images_u8)), mean, std)


def _eval_batches(loader, args):
    """Yield (normalized images, labels) with the on-device eval transform."""
    for batch in loader:
        yield _eval_prep(batch[0], args), batch[-1]


def load_variables(args, model, sample, return_missing: bool = False):
    rngs = {"params": jax.random.PRNGKey(args.seed)}
    if args.het_layer:
        rngs["mc"] = jax.random.PRNGKey(args.seed + 1)
    variables = model.init(rngs, sample)
    missing = []
    if args.finetune:
        if args.finetune.endswith((".pth", ".pt")):
            sd = C.load_torch_state_dict(args.finetune)
            prefix = getattr(args, "model_prefix", "")
            if prefix:
                sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                      for k, v in sd.items()}
            if getattr(args, "reinit_final_norm", False):
                # run_class_finetuning.py:413-417
                sd = {k: v for k, v in sd.items()
                      if k not in ("norm.weight", "norm.bias",
                                   "fc_norm.weight", "fc_norm.bias")}
            params, missing, unused = C.import_torch_params(
                sd, variables["params"],
                keep_mismatched_head=getattr(args, "dual_finetune", False),
            )
            print(f"imported {args.finetune}: {len(missing)} missing, {len(unused)} unused",
                  flush=True)
            variables = dict(variables, params=params)
            if "spectral_stats" in variables:
                # --sngp checkpoints carry the power-iteration buffers;
                # eval-mode sigma needs the STORED u/v (sngp.py:92)
                stats, found = C.import_torch_spectral_stats(
                    sd, variables["spectral_stats"]
                )
                if found:
                    variables = dict(variables, spectral_stats=stats)
        else:
            restored = C.restore_checkpoint(args.finetune, None)
            src = restored.get("params", restored) if isinstance(restored, dict) else restored
            variables = dict(variables, params=src)
            missing = ["head/kernel", "head/bias"]  # conservatively retrain the head
    if return_missing:
        return variables, missing
    return variables


def _mc_eval_model(model):
    """Rebuild the eval model with stochastic depth OFF for MC-dropout.

    The reference's enable_dropout flips only nn.Dropout modules to train
    mode (uncertainty_evaluations.py:35-39), keeping drop-path disabled, so
    MC-dropout evaluation must not inherit the training --drop_path rate."""
    return type(model)(cfg=model.cfg.replace(drop_path_rate=0.0), dtype=model.dtype)


def _load_ensemble_members(args, variables):
    """--ensemble_checkpoints → list of member variable dicts
    (replaces the reference's hard-coded path templates,
    engine_for_finetuning.py:234-242)."""
    members = []
    for path in args.ensemble_checkpoints:
        if path.endswith((".pth", ".pt")):
            sd = C.load_torch_state_dict(path)
            p, _, _ = C.import_torch_params(sd, variables["params"])
        else:
            raw = C.restore_checkpoint(path, None)
            p = raw.get("params", raw) if isinstance(raw, dict) else raw
        members.append({"params": p})
    return members


def _mc_mean_forward(args, model, variables):
    """MC-dropout mean forward for the -C/-P dispatches with a FRESH rng per
    batch (fold-in counter, like evals/classification.py:102). The reference
    redraws dropout masks on every forward (uncertainty_evaluations.py:479-534);
    reusing one key would correlate errors across the whole dataset."""
    from uncertainty_vit_tpu.evals.mc_dropout import make_mc_dropout_mean_forward

    from uncertainty_vit_tpu.evals.collect import per_call_rng

    mc = make_mc_dropout_mean_forward(
        _mc_eval_model(model), args.mc_dropout_forwards,
        split_at=args.mc_dropout_split_at,
    )
    key = per_call_rng(jax.random.PRNGKey(args.seed))
    return lambda imgs: mc(variables, imgs, key())


def _default_eval_forward(args, model, variables):
    """Deterministic jitted forward for the robustness dispatches; with
    --het_layer each call folds a fresh 'mc' rng so the heteroscedastic
    head's noise varies per batch (see evals.classification.make_eval_forward)."""
    if args.het_layer:
        from uncertainty_vit_tpu.evals.collect import per_call_rng

        jfwd = E.make_eval_forward(model, het=True)
        key = per_call_rng(jax.random.PRNGKey(args.seed))
        return lambda imgs: jfwd(variables, imgs, key())
    return jax.jit(lambda imgs: model.apply(variables, imgs, deterministic=True))


def _fit_loader(args):
    """Train-split loader for post-hoc fits (laplace / temperature): FULL
    split through the EVAL transform — no shuffle, no tail drop, UNPADDED
    host shards (padding would double-count samples in multi-host factor
    reductions); letterbox decode is a train-augmentation concern, so it
    is stripped."""
    fit_args = argparse.Namespace(**{**vars(args), "decode_letterbox": False})
    loader, _ = B.build_loaders(
        fit_args, is_train=True, shuffle=False, drop_last=False,
        pad_shards=False,
    )
    return loader


def _fit_laplace(args, model, variables):
    """Fit the last-layer KFAC Laplace posterior on the train split
    (evals/laplace.py; the reference's intended-but-dead dispatch,
    run_class_finetuning.py:651-656). Returns (posterior, jitted
    (images)→(logits, feats) forward, jitted (logits, feats)→log-probs
    predictive)."""
    from uncertainty_vit_tpu.evals import laplace as L

    if model.cfg.head_type != "linear":
        raise ValueError(
            "--laplace needs the linear head (last-layer Laplace); "
            f"head_type={model.cfg.head_type!r} is itself an "
            "uncertainty method"
        )
    # the GGN at the MAP legitimately uses train data (unlike temperature
    # scaling's NLL fit — see --temp_scaling_split)
    fit_loader = _fit_loader(args)
    ffwd = L.make_feature_forward(model, variables)
    la = L.fit_last_layer_laplace(
        ffwd, variables["params"]["head"], _eval_batches(fit_loader, args)
    )
    la = L.optimize_prior_precision(la)
    print(f"laplace: fit on {la.n} samples, "
          f"prior precision {la.prior_precision:g}", flush=True)
    from uncertainty_vit_tpu.evals.collect import per_call_rng

    key = per_call_rng(jax.random.PRNGKey(args.seed))
    jpred = jax.jit(
        lambda lg, ft, key: L.predictive_log_probs(
            la, lg, ft, link=args.laplace_link, rng=key
        )
    )
    pred = lambda lg, ft: jpred(lg, ft, key())
    return la, ffwd, pred


def run_eval_dispatch(args, model, variables, val_loader, nb_classes):
    """--eval dispatch (run_class_finetuning.py:638-677)."""
    results = {}
    batches = lambda: _eval_batches(val_loader, args)
    crop_pct = args.crop_pct or (224 / 256 if args.input_size < 384 else 1.0)

    if args.laplace and (
        args.perturbed_data or args.ensembles or args.stochastic
        or args.mc_dropout
    ):
        # laplace composes with the clean and -C evals (the corruption path
        # uses argmax over the calibrated predictive); combining with the
        # OTHER uncertainty dispatches would silently drop one of the two
        # flags, so those error explicitly (the reference's own laplace
        # path is dead code, run_class_finetuning.py:40,651-656)
        raise ValueError(
            "--laplace composes with the clean eval and --corrupted_data "
            "only; mc/ensembles/stochastic/-P combinations are not carried"
        )
    if args.temp_scaling and (
        args.laplace or args.corrupted_data or args.perturbed_data
        or args.ensembles or args.stochastic or args.mc_dropout
    ):
        raise ValueError(
            "--temp_scaling supports the clean eval path only (and is "
            "itself a calibrator — combining with --laplace is ambiguous)"
        )

    if args.corrupted_data:
        if args.stochastic:
            fwd = jax.jit(lambda imgs: model.apply(variables, imgs, deterministic=True)[2])
        elif args.mc_dropout:
            fwd = _mc_mean_forward(args, model, variables)
        elif args.laplace:
            # corruption eval under the Laplace GLM predictive: log-probs
            # are valid "logits" for the accuracy/CE metrics
            la, ffwd, pred = _fit_laplace(args, model, variables)
            fwd = lambda imgs: pred(*ffwd(imgs))
        elif args.ensembles:
            # ensembles_c_evaluate (uncertainty_evaluations.py:393-476):
            # mean member logits per corrupted batch
            from uncertainty_vit_tpu.evals.ensembles import (
                ensemble_mean_logits, make_ensemble_forward,
            )
            stacked = stack_params(_load_ensemble_members(args, variables))
            efwd = make_ensemble_forward(model)
            fwd = lambda imgs: ensemble_mean_logits(efwd(stacked, imgs))
        else:
            fwd = _default_eval_forward(args, model, variables)

        croot = args.corruption_data_path or args.data_path
        if args.data_set.startswith("CIFAR"):
            available = tuple(
                d for d in R.DISTORTIONS
                if os.path.exists(os.path.join(croot, f"{d}.npy"))
            )
        else:
            available = tuple(
                d for d in R.DISTORTIONS if os.path.isdir(os.path.join(croot, d))
            )
        skipped = set(R.DISTORTIONS) - set(available)
        if skipped:
            print(f"skipping distortions with no data: {sorted(skipped)}", flush=True)

        def loader_factory(name):
            if args.data_set.startswith("CIFAR"):
                severities = range(1, 6)
                for s in severities:
                    ds = D.load_cifar_c(croot, name, s)
                    for i in range(0, len(ds), args.batch_size):
                        imgs = ds.images[i : i + args.batch_size]
                        lbls = ds.labels[i : i + args.batch_size]
                        # same preprocessing as the clean eval path
                        # (reference datasets.py:251-260 crop_pct semantics)
                        imgs = eval_transform_batch(
                            jnp.asarray(imgs), args.input_size, crop_pct,
                            args.imagenet_default_mean_and_std,
                        )
                        yield imgs, lbls
            else:  # TinyImageNet-C layout
                for s in range(1, 6):
                    ds = D.TinyImageNetC(croot, name, s, wnids_path=args.wnids_path,
                                         decode_size=args.input_size)
                    from uncertainty_vit_tpu.data.pipeline import BatchLoader
                    for batch in BatchLoader(ds, args.batch_size, shuffle=False,
                                             num_workers=args.num_workers, drop_last=False):
                        yield from _eval_batches([batch], args)

        results["corruption"] = R.evaluate_corruption(fwd, loader_factory, distortions=available)
        print(json.dumps(results["corruption"], indent=2), flush=True)
        return results

    if args.perturbed_data:
        proot = args.perturbation_data_path or args.data_path
        if args.stochastic:
            fwd = jax.jit(lambda imgs: model.apply(variables, imgs, deterministic=True)[2])
        elif args.mc_dropout:
            # mc_dropout_p_evaluate (uncertainty_evaluations.py:661-720):
            # mean of K dropout-enabled logits per frame, drop-path off
            fwd = _mc_mean_forward(args, model, variables)
        elif args.ensembles:
            # ensembles_p_evaluate (uncertainty_evaluations.py:724-737,
            # dispatched at :635): mean member logits per frame batch
            from uncertainty_vit_tpu.evals.ensembles import (
                ensemble_mean_logits, make_ensemble_forward,
            )
            stacked = stack_params(_load_ensemble_members(args, variables))
            efwd = make_ensemble_forward(model)
            fwd = lambda imgs: ensemble_mean_logits(efwd(stacked, imgs))
        else:
            fwd = _default_eval_forward(args, model, variables)

        def video_loader(name):
            vids = D.load_cifar_p(proot, name)
            per = max(args.batch_size // max(vids.shape[1], 1), 1)
            for i in range(0, len(vids), per):
                yield vids[i : i + per]

        results["perturbation"] = R.evaluate_perturbation(
            fwd, video_loader, nb_classes, perturbations=R.PERTURBATIONS,
            frame_size=args.input_size,
        )
        print(json.dumps(results["perturbation"], indent=2), flush=True)
        return results

    if args.mc_dropout:
        results["mc_dropout"] = E.evaluate_mc_dropout(
            _mc_eval_model(model), variables, batches(),
            num_samples=args.mc_dropout_forwards,
            split_at=args.mc_dropout_split_at,
        )
    elif args.ensembles:
        results["ensembles"] = E.evaluate_ensemble(
            model, stack_params(_load_ensemble_members(args, variables)), batches()
        )
    elif args.stochastic:
        from uncertainty_vit_tpu.evals import metrics as M
        from uncertainty_vit_tpu.evals.collect import collect_logits

        fwd = jax.jit(lambda imgs: model.apply(variables, imgs, deterministic=True)[2])
        logits_np, labels_np = collect_logits(fwd, batches())
        out = M.classification_metrics(
            jnp.asarray(logits_np), jnp.asarray(labels_np)
        )
        results["dist_eval"] = {k: float(v) for k, v in out.items()}
    elif args.laplace:
        # combinations other than -C error up front (top of this function)
        from uncertainty_vit_tpu.evals import laplace as L

        la, ffwd, _ = _fit_laplace(args, model, variables)
        results["laplace"] = L.evaluate_laplace(
            la, ffwd, batches(), link=args.laplace_link,
            rng=jax.random.PRNGKey(args.seed),
        )
    elif args.temp_scaling:
        from uncertainty_vit_tpu.evals import calibration as CAL

        fwd = _default_eval_forward(args, model, variables)
        fit_batches = (
            _eval_batches(_fit_loader(args), args)
            if args.temp_scaling_split == "train" else None
        )
        results["temp_scaling"] = CAL.evaluate_temperature_scaled(
            fwd, batches(), fit_batches=fit_batches,
            heldout_frac=(args.temp_scaling_heldout_frac
                          if args.temp_scaling_split == "heldout" else None),
            heldout_seed=args.seed,
        )
        print(f"temperature scaling: T* = "
              f"{results['temp_scaling']['temperature']:.4f}", flush=True)
    else:
        results["eval"] = E.evaluate(model, variables, batches(),
                                     het=args.het_layer)
    print(json.dumps(results, indent=2, default=float), flush=True)
    return results


def main(args):
    # bounded-scores attention default ON: finetuning starts from a trained
    # backbone, the regime the round-5 ablation gated (cli/common.py)
    setup_jax(bounded_scores_default=True)
    B.validate_aug_args(args)
    print(f"devices: {jax.devices()}", flush=True)
    triplet = args.stochastic and not args.eval

    val_loader, nb_classes = B.build_loaders(args, is_train=False)
    nb_classes = args.nb_classes or nb_classes
    model, cfg = build_model(args, nb_classes)
    sample = jnp.zeros((args.batch_size, args.input_size, args.input_size, 3))

    if args.visualize_embedding:
        # reference dispatch: dump embeddings and exit (:634-637)
        from uncertainty_vit_tpu.utils.embeddings import visualize_embedding

        variables = load_variables(args, model, sample)
        out = visualize_embedding(
            model, variables, _eval_batches(val_loader, args),
            args.output_dir or ".",
        )
        print(f"embeddings written to {out}", flush=True)
        return out

    if args.eval:
        variables = load_variables(args, model, sample)
        return run_eval_dispatch(args, model, variables, val_loader, nb_classes)

    train_loader, _ = B.build_loaders(
        args, is_train=True, triplet=triplet, letterbox_ok=not triplet
    )
    steps_per_epoch = args.steps_per_epoch or len(train_loader)
    lr_schedule, wd_schedule, total = B.build_lr_schedules(args, steps_per_epoch)

    rng = jax.random.PRNGKey(args.seed)
    variables, missing = load_variables(args, model, sample, return_missing=True)
    params = variables["params"]
    tx = B.build_optimizer(args, params, lr_schedule, wd_schedule, cfg.depth)
    if args.linear_classifier and args.finetune:
        # linear-probe freezing (run_class_finetuning.py:529-538): train only
        # params the checkpoint did NOT provide (the fresh head)
        from uncertainty_vit_tpu.train.optim import freeze_all_except

        trainable = missing or ["head"]
        print(f"linear probe: trainable params = {trainable}", flush=True)
        tx = freeze_all_except(tx, params, trainable)

    mixup_active = B.mixup_active(args)
    # one augmentation closure for every train path (fused step + triplet):
    # a future aug knob threads through exactly one call site
    _aa = _aa_kwargs(args)

    def aug_batch(k, imgs, vhw=None):
        return finetune_train_augment_batch(
            k, imgs, args.input_size, args.color_jitter, args.reprob,
            args.imagenet_default_mean_and_std, valid_hw=vhw,
            interpolation=B.interp_method(args.train_interpolation),
            re_mode=args.remode, re_count=args.recount, **_aa,
        )

    if args.stochastic:
        hp = DistFinetuneHParams(
            num_classes=nb_classes, mixup_active=mixup_active,
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            mixup_prob=args.mixup_prob, mixup_switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing,
            mixup_mode=args.mixup_mode,
            cutmix_minmax=tuple(args.cutmix_minmax) if args.cutmix_minmax else None,
            lambda_finetuning=args.lambda_finetuning, lambda_pvn=args.lambda_pvn,
            update_freq=max(1, args.update_freq),
        )
        state = init_dist_finetune_state(model, tx, rng, sample)
        state = state.replace(params=params, opt_state=tx.init(params))
        # triplet loop fusion: anchor augmentation + pos/neg eval transforms
        # run IN the step jit from raw uint8 batches (one dispatch per step,
        # same as the non-stochastic aug_fn path)
        train_step = make_dist_finetune_train_step(
            model, tx, hp, lr_schedule,
            aug_fn=lambda k, imgs: aug_batch(k, imgs),
            prep_fn=lambda imgs: _eval_prep(imgs, args),
            use_hessian=needs_hessian(args.opt),
        )
    else:
        hp = FinetuneHParams(
            num_classes=nb_classes, mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            mixup_prob=args.mixup_prob, mixup_switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing, mixup_active=mixup_active,
            mixup_mode=args.mixup_mode,
            cutmix_minmax=tuple(args.cutmix_minmax) if args.cutmix_minmax else None,
            masked_position_prob=args.masked_position_prob,
            num_patches=cfg.num_patches, model_ema_decay=args.model_ema_decay,
            head_type=cfg.head_type, update_freq=max(1, args.update_freq),
        )
        state = init_finetune_state(
            model, tx, rng, sample, use_model_ema=args.model_ema,
            head_type=cfg.head_type,
        )
        state = state.replace(params=params, opt_state=tx.init(params))
        # fuse the augmentation program into the train-step jit: uint8 host
        # batches go straight into ONE dispatch per step (VERDICT item:
        # the serialized aug→step split cost ~17% sustained throughput)
        train_step = make_finetune_train_step(
            model, tx, hp, lr_schedule, aug_fn=aug_batch,
            use_hessian=needs_hessian(args.opt),
        )

    start_epoch = args.start_epoch
    if args.auto_resume and not args.resume:
        state, resumed_epoch = C.auto_load(args.output_dir, state)
        # reference auto_load only moves start_epoch when a checkpoint was
        # actually found (utils.py:487-545); --start_epoch otherwise wins
        start_epoch = max(start_epoch, resumed_epoch)
    elif args.resume:
        state = C.restore_checkpoint(args.resume, state)
    if start_epoch and int(state.step) == 0:
        # fresh start at a later epoch: advance the in-graph schedules like
        # the reference's it = epoch * steps_per_epoch indexing
        state = state.replace(
            step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32)
        )

    tb = TensorboardLogger(args.log_dir or args.output_dir)
    jsonl = JsonlLogger(args.output_dir)
    best_acc = -1.0

    # one persistent jitted eval forward for all epochs (no per-epoch retrace)
    if args.stochastic:
        eval_forward = jax.jit(
            lambda v, imgs: model.apply(v, imgs, deterministic=True)[2]
        )
    else:
        eval_forward = E.make_eval_forward(model, het=args.het_layer)

    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        if (
            cfg.head_type == "sngp"
            and cfg.sngp_momentum <= 0
            and getattr(state, "sngp_state", None) is not None
        ):
            # exact-accumulation mode: precision matrix restarts each epoch
            # (SNGP.reset_cov, modeling_finetune.py:596-616)
            from uncertainty_vit_tpu.models.registry import sngp_reset_cov

            state = state.replace(
                sngp_state=sngp_reset_cov(state.sngp_state, cfg.sngp_ridge_penalty)
            )
        logger = MetricLogger()
        # Deferred metric readback: reading float(loss) immediately would
        # block the host on every step, serializing dispatch with compute.
        # A 2-deep window keeps the host ~2 steps ahead (aug/fwd/bwd of step
        # i overlap the readback of step i-2) while still bounding run-ahead
        # and catching NaNs within 2 steps (reference NaN guard semantics,
        # engine_for_finetuning.py:101-103).
        pending: "collections.deque" = collections.deque()
        # NaN reports must carry the GLOBAL step: epoch*steps_per_epoch+step
        # diverges from the checkpointed state.step when resuming with
        # --start_epoch against a checkpointed optimizer step count, so
        # snapshot the resumed step once per epoch (one host sync, at the
        # epoch boundary) and add the loop offset (advisor r4)
        step_base = int(state.step)

        def drain_one():
            m, py_step = pending.popleft()
            loss = float(m["loss"])
            B.check_finite_or_die(loss, py_step)
            logger.update(**{k: float(v) for k, v in m.items()})
            tb.update(head="loss", loss=loss)
            tb.set_step()

        for step, batch in enumerate(logger.log_every(device_prefetch(train_loader), 10, f"Epoch: [{epoch}]")):
            if step >= steps_per_epoch:
                break
            if triplet:
                # raw uint8 triplets: aug + eval transforms fused in-step
                img_u8, pos_u8, neg_u8, labels = batch
                state, metrics = train_step(
                    state, jnp.asarray(img_u8), jnp.asarray(pos_u8),
                    jnp.asarray(neg_u8), jnp.asarray(labels), rng,
                )
            else:
                images_u8, labels = batch[0], batch[-1]
                # letterboxed batches carry per-sample valid extents so the
                # RRC covers the full original image (--decode_letterbox);
                # augmentation runs IN-GRAPH (fused_aug above)
                vhw = jnp.asarray(batch[1]) if len(batch) == 3 else None
                state, metrics = train_step(
                    state, jnp.asarray(images_u8), jnp.asarray(labels), rng, vhw
                )
            pending.append((metrics, step_base + step))
            while len(pending) > 2:
                drain_one()
        while pending:
            drain_one()

        # per-epoch eval (run_class_finetuning.py:714-731)
        test = None
        eval_vars = {"params": state.params}
        for col in ("sngp_state", "sngp_frozen", "spectral_stats"):
            v = getattr(state, col, None)
            if v is not None:
                eval_vars[col] = v
        if args.disable_eval_during_finetuning:
            pass
        elif args.stochastic:
            logits_all, labels_all = [], []
            for images, labels in _eval_batches(val_loader, args):
                logits_all.append(np.asarray(eval_forward(eval_vars, images), np.float32))
                labels_all.append(np.asarray(labels))
            from uncertainty_vit_tpu.evals import metrics as M
            test = {k: float(v) for k, v in M.classification_metrics(
                jnp.asarray(np.concatenate(logits_all)),
                jnp.asarray(np.concatenate(labels_all))).items()}
        else:
            test = E.evaluate(model, eval_vars, _eval_batches(val_loader, args),
                              forward=eval_forward, het=args.het_layer,
                              rng=jax.random.PRNGKey(args.seed + epoch))
        record = {
            "epoch": epoch,
            **{f"train_{k}": v for k, v in logger.epoch_summary().items()},
        }
        if test is not None:
            print(f"epoch {epoch}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(test.items())), flush=True)
            if test["acc1"] > best_acc:
                best_acc = test["acc1"]
                # the best save honors --no_save_ckpt like the periodic one
                if args.save_ckpt and args.output_dir:
                    C.save_checkpoint(args.output_dir, "best", state)
            record.update({f"test_{k}": v for k, v in test.items()})
            record["best_acc1"] = best_acc
        jsonl.write(record)
        if args.save_ckpt and args.output_dir and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            C.save_checkpoint(args.output_dir, epoch, state)
        tb.flush()
    print(f"done. best acc1 {best_acc:.3f}", flush=True)
    return state


if __name__ == "__main__":
    main(get_args_parser().parse_args())
