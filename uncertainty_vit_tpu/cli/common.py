"""Shared CLI setup: compilation cache, logging, seeding."""

from __future__ import annotations

import os


def setup_jax(compilation_cache_dir: str = "/root/.cache/jax_comp") -> None:
    """Enable the persistent compilation cache (some v5e augmentation
    programs take minutes to compile; this amortizes them across runs)."""
    import jax

    try:
        os.makedirs(compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # Attention micro-modes (ops/flash_attention.py trace-time flags): env
    # opt-ins so recipes and bench tools can flip them without code edits.
    if os.environ.get("UVIT_ATTN_BOUNDED_SCORES", "") == "1" or os.environ.get(
        "UVIT_ATTN_LSE_BF16", ""
    ) == "1":
        import jax.numpy as jnp
        from uncertainty_vit_tpu.ops import flash_attention as _FA

        if os.environ.get("UVIT_ATTN_BOUNDED_SCORES", "") == "1":
            _FA.BOUNDED_SCORES = True
        if os.environ.get("UVIT_ATTN_LSE_BF16", "") == "1":
            _FA.LSE_DTYPE = jnp.bfloat16

    # Fused in-kernel-PRNG dropout (ops/dropout.py, MC-dropout eval only)
    if os.environ.get("UVIT_FUSED_DROPOUT", "") == "1":
        from uncertainty_vit_tpu.ops import dropout as _DO

        _DO.FUSED = True
