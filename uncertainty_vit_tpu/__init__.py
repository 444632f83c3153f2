"""uncertainty_vit_tpu — TPU-native uncertainty-aware Vision Transformer framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of the
fx-erick/uncertainty-vit reference (see SURVEY.md at the repo root):

- data2vec-style "cyclical" self-supervised pretraining with an EMA teacher
- classic BEiT masked-image-modeling pretraining (dVAE codebook targets)
- joint cyclical+BEiT pretraining with epoch-annealed loss mixing
- supervised finetuning with mixup/cutmix and layer-wise LR decay
- uncertainty stack: vmapped MC-dropout, SNGP (spectral norm + RFF GP head),
  heteroscedastic MC-softmax heads, stochastic mean/covariance "dist"
  transformers with Wasserstein losses, deep ensembles
- calibration & robustness metrics (ECE/TACE/MCE/SCE/ACE/OE/Brier/NLL/AUROC),
  corruption (mCE) and perturbation (flip-prob) benchmarks

Layout:
    core/      config dataclasses, RNG discipline
    models/    canonical ViT + pretraining / dist / dVAE model zoo
    ops/       Pallas kernels and jittable compute ops (attention, masking,
               augmentation, losses)
    parallel/  mesh construction and sharding rules (pjit / shard_map)
    train/     optax optimization, schedules, EMA, train engines
    evals/     metrics and uncertainty / robustness evaluation loops
    data/      dataset adapters and input pipelines
    utils/     checkpointing (Orbax + .pth importer), logging, telemetry
    cli/       entry points mirroring the reference run_*.py drivers
"""

__version__ = "0.1.0"
