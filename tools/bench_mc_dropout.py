"""Full-depth MC-dropout cost ladder (VERDICT r4 item 10).

Measures the K=8 MC-dropout mean-forward on ViT-B/224 (the reference's
evaluate_MC_dropout workload, uncertainty_evaluations.py:41-89) against the
single deterministic pass, in pass-equivalents:

  - det:        deterministic forward (the 1.0x reference point)
  - xla:        full-depth MC-dropout, stock lowering (rbg bit generator,
                evals/mc_dropout._fast_dropout_key) — round-3 standing: 10.2x
  - fused:      full-depth MC-dropout with ops/dropout.py's in-kernel-PRNG
                Pallas dropout on the MLP-fc2 + attn-proj sites (the ~2
                pass-equivalents of mask HBM traffic under attack)
  - split:      the shared-trunk construction (--dropout_from_block 9,
                3.38x standing) for context

Usage: python tools/bench_mc_dropout.py [--modes det,xla,fused,split]
       [--batch 128] [--k 8] [--iters 10] [--smoke]
--smoke runs a tiny CPU build of the det/xla modes only (the fused kernel
needs the TPU hardware PRNG).

Prints one JSON line per mode:
  {"mode": ..., "img_per_sec": ..., "ms": ..., "pass_equiv": ...}
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="det,xla,fused,split")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--split_at", type=int, default=9)
    ap.add_argument("--drop_rate", type=float, default=0.1)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--selftest", action="store_true",
                    help="run the TPU-gated fused-dropout correctness tests "
                         "(tests/test_fused_dropout.py's *_tpu checks run "
                         "here because tests/conftest.py pins the suite to "
                         "CPU) before measuring")
    args = ap.parse_args()

    from uncertainty_vit_tpu.cli.common import setup_jax

    setup_jax()

    if args.selftest:
        import tests.test_fused_dropout as T

        T.test_fused_dropout_statistics_tpu()
        T.test_mc_dropout_mean_agrees_fused_vs_xla_tpu()
        print(json.dumps({"mode": "selftest", "ok": True}), flush=True)

    import jax
    import jax.numpy as jnp

    from uncertainty_vit_tpu.core.config import get_preset
    from uncertainty_vit_tpu.evals.mc_dropout import make_mc_dropout_mean_forward
    from uncertainty_vit_tpu.models.vit import VisionTransformer
    from uncertainty_vit_tpu.ops import dropout as DO

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        preset, size, modes = "beit_test_patch16_32", 32, ["det", "xla"]
        args.batch, args.k, args.iters = 4, 2, 2
    else:
        preset, size = "beit_base_patch16_224", 224
        modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    cfg = get_preset(
        preset, use_shared_rel_pos_bias=True, drop_path_rate=0.0,
        drop_rate=args.drop_rate,
    )
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(1), (args.batch, size, size, 3))
    variables = {"params": jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]}
    rng = jax.random.PRNGKey(3)

    det_fwd = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))

    def timed(fn, *a):
        for _ in range(2):
            out = fn(*a)
        float(jnp.asarray(out).reshape(-1)[0])  # axon: readback IS the sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        float(jnp.asarray(out).reshape(-1)[0])
        return (time.perf_counter() - t0) / args.iters

    results = {}
    for mode in modes:
        DO.FUSED = mode == "fused"
        try:
            if mode == "det":
                dt = timed(det_fwd, variables, images)
            elif mode in ("xla", "fused"):
                fwd = make_mc_dropout_mean_forward(model, args.k)
                dt = timed(fwd, variables, images, rng)
            elif mode == "split":
                fwd = make_mc_dropout_mean_forward(
                    model, args.k, split_at=args.split_at
                )
                dt = timed(fwd, variables, images, rng)
            else:
                raise ValueError(mode)
        finally:
            DO.FUSED = False
        results[mode] = dt
        rec = {
            "mode": mode,
            "ms": round(dt * 1e3, 2),
            "img_per_sec": round(args.batch / dt, 1),
        }
        if "det" in results:
            rec["pass_equiv"] = round(dt / results["det"], 2)
        print(json.dumps(rec), flush=True)

    if not args.smoke and "fused" in results and "xla" in results:
        print(json.dumps({
            "mode": "summary",
            "fused_vs_xla_speedup": round(results["xla"] / results["fused"], 3),
            "k": args.k, "batch": args.batch,
        }), flush=True)


if __name__ == "__main__":
    main()
