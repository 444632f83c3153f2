"""Golden-weights eval harness (VERDICT r4 item 9).

Reproduces the reference's get_started eval table end-to-end through OUR
CLI the day real published weights are available
(get_started_for_image_classification.md:74-117: the reference's
`run_class_finetuning.py --eval --model <name> --resume <pth>` commands and
their `* Acc@1 A Acc@5 B loss L` expected-result lines):

    python tools/golden_eval.py \
        --pth beit_large_patch16_224_pt22k_ft22kto1k.pth \
        --model beit_large_patch16_224 --data_path /path/to/imagenet \
        --expect 87.396,98.282,0.515

    python tools/golden_eval.py \
        --pth beit_base_patch16_384_pt22k_ft22kto1k.pth \
        --model beit_base_patch16_384 --input_size 384 \
        --data_path /path/to/imagenet --expect 86.820,98.124,0.565

Loads the .pth through the production importer (utils/checkpoint.py:
interpolation surgery included), runs cli/finetune's eval dispatch, prints
the reference's exact result-line format, and — with --expect — exits
nonzero when outside --acc_tol / --loss_tol. Offline today, the published
pickles are unfetchable; tests/test_golden_eval.py validates the whole
harness against exporter-generated weights so real-weight parity is one
command once artifacts appear.
"""

from __future__ import annotations

import argparse
import sys


def get_args_parser():
    p = argparse.ArgumentParser("golden-weights eval harness")
    p.add_argument("--pth", required=True,
                   help="reference checkpoint (.pth, model|module containers "
                        "probed like run_class_finetuning.py:400-406)")
    p.add_argument("--model", required=True,
                   help="registry name, e.g. beit_large_patch16_224")
    p.add_argument("--data_path", required=True)
    p.add_argument("--data_set", default="IMNET")
    p.add_argument("--input_size", type=int, default=None,
                   help="eval resolution (the get_started 384/512 runs pass "
                        "--input_size explicitly)")
    p.add_argument("--nb_classes", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--crop_pct", type=float, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output_dir", default="")
    p.add_argument("--expect", default=None,
                   help="golden 'acc1,acc5,loss' triple from the get_started "
                        "table; exits nonzero outside tolerance")
    p.add_argument("--acc_tol", type=float, default=0.15,
                   help="|acc - golden| tolerance in percentage points")
    p.add_argument("--loss_tol", type=float, default=0.01)
    p.add_argument("extra", nargs="*", default=[],
                   help="extra flags passed through to cli/finetune")
    return p


def build_cli_argv(a) -> list:
    argv = [
        "--eval", "--model", a.model, "--finetune", a.pth,
        "--data_set", a.data_set, "--data_path", a.data_path,
        "--batch_size", str(a.batch_size), "--num_workers", str(a.num_workers),
        "--output_dir", a.output_dir, "--dtype", a.dtype,
    ]
    if a.input_size is not None:
        argv += ["--input_size", str(a.input_size)]
    if a.nb_classes is not None:
        argv += ["--nb_classes", str(a.nb_classes)]
    if a.crop_pct is not None:
        argv += ["--crop_pct", str(a.crop_pct)]
    argv += list(a.extra)
    return argv


def run(a) -> dict:
    """Run the eval and return {'acc1', 'acc5', 'loss', 'line', 'ok'}."""
    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args(build_cli_argv(a))
    results = FT.main(args)
    ev = results["eval"]
    out = {
        "acc1": float(ev["acc1"]),
        "acc5": float(ev["acc5"]),
        "loss": float(ev["nll"]),
    }
    # the reference's expected-results line format, verbatim
    out["line"] = (
        f"* Acc@1 {out['acc1']:.3f} Acc@5 {out['acc5']:.3f} "
        f"loss {out['loss']:.3f}"
    )
    out["ok"] = True
    if a.expect:
        g1, g5, gl = (float(v) for v in a.expect.split(","))
        out["ok"] = (
            abs(out["acc1"] - g1) <= a.acc_tol
            and abs(out["acc5"] - g5) <= a.acc_tol
            and abs(out["loss"] - gl) <= a.loss_tol
        )
        out["golden"] = {"acc1": g1, "acc5": g5, "loss": gl}
    return out


def main(argv=None) -> int:
    a = get_args_parser().parse_args(argv)
    out = run(a)
    print(out["line"])
    if a.expect and not out["ok"]:
        g = out["golden"]
        print(
            f"GOLDEN MISMATCH: got ({out['acc1']:.3f}, {out['acc5']:.3f}, "
            f"{out['loss']:.3f}) vs expected ({g['acc1']:.3f}, "
            f"{g['acc5']:.3f}, {g['loss']:.3f}) "
            f"[tol acc {a.acc_tol}, loss {a.loss_tol}]",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
