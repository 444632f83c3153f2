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
