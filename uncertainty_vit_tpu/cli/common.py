"""Shared CLI setup: compilation cache, logging, seeding."""

from __future__ import annotations

import os


def setup_jax(
    compilation_cache_dir: str = "/root/.cache/jax_comp",
    bounded_scores_default: bool = False,
) -> None:
    """Enable the persistent compilation cache (some v5e augmentation
    programs take minutes to compile; this amortizes them across runs).

    bounded_scores_default: trace-time default for the attention kernel's
    BOUNDED_SCORES micro-mode. The finetune drivers (trained backbones,
    |scores| ≲ 40 — far from the f32 exp overflow at ~88) pass True: the
    round-5 on-chip ablation measured fwd 0.843 → 0.752 ms/layer and grad
    drift 0.57% (gate: 2%). From-scratch pretraining drivers keep the exact
    max-subtracted path (False) — attention logits are unbounded over a long
    pretrain. The UVIT_ATTN_BOUNDED_SCORES env var ("1"/"0") overrides both
    ways. LSE_DTYPE=bf16 stays opt-in: the same ablation measured 3.4% grad
    drift (fails the gate) with no robust step win (fwd+bwd 24.19 vs 23.57
    ms baseline)."""
    import jax

    try:
        os.makedirs(compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # Attention micro-modes (ops/flash_attention.py trace-time flags).
    bounded_env = os.environ.get("UVIT_ATTN_BOUNDED_SCORES", "")
    bounded = bounded_scores_default if bounded_env == "" else bounded_env == "1"
    if bounded or os.environ.get("UVIT_ATTN_LSE_BF16", "") == "1":
        import jax.numpy as jnp
        from uncertainty_vit_tpu.ops import flash_attention as _FA

        if bounded:
            _FA.BOUNDED_SCORES = True
        if os.environ.get("UVIT_ATTN_LSE_BF16", "") == "1":
            _FA.LSE_DTYPE = jnp.bfloat16

    # Fused in-kernel-PRNG dropout (ops/dropout.py, MC-dropout eval only)
    if os.environ.get("UVIT_FUSED_DROPOUT", "") == "1":
        from uncertainty_vit_tpu.ops import dropout as _DO

        _DO.FUSED = True
