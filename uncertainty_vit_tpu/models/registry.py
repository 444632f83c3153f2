"""timm-style model factory covering every registry name the reference
exposes (modeling_finetune.py:1221-1275, modeling_cyclical.py:282-363,
modeling_pretrain.py:139-166, modeling_cyclical_joint.py registry).

create_model(name, family=...) returns (module, config):
  - family='finetune'  → VisionTransformer (classification)
  - family='cyclical'  → CyclicalViT / DistCyclicalViT (data2vec pretrain)
  - family='mim'       → MIMViT (names ending in _8k_vocab)
  - family='joint'     → JointViT (beit_*_joint_* names)
The dist_* names select the mean+covariance model in either family.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig, get_preset
from uncertainty_vit_tpu.models.cyclical import CyclicalViT
from uncertainty_vit_tpu.models.dist_vit import DistCyclicalViT, DistVisionTransformer
from uncertainty_vit_tpu.models.mim import JointViT, MIMViT
from uncertainty_vit_tpu.models.vit import VisionTransformer

MODEL_NAMES = (
    "beit_base_patch16_224", "beit_base_patch16_384",
    "beit_large_patch16_224", "beit_large_patch16_384",
    "beit_large_patch16_512", "beit_huge_patch16_224",
    "beit_base_patch16_224_8k_vocab", "beit_large_patch16_224_8k_vocab",
    "dist_beit_base_patch16_224",
    "beit_base_joint_patch16_224",
)


def _base_preset(name: str) -> ViTConfig:
    m = re.search(r"beit_(base|large|huge)_(?:joint_)?patch16_(\d+)", name)
    if not m:
        raise ValueError(f"unknown model name: {name}")
    return get_preset(f"beit_{m.group(1)}_patch16_{m.group(2)}")


def create_model(
    name: str,
    family: Optional[str] = None,
    dtype: Any = jnp.float32,
    vocab_size: int = 8192,
    **overrides,
) -> Tuple[Any, ViTConfig]:
    """Build (flax module, config) for a registry name. `family` defaults by
    name: *_8k_vocab → mim, *_joint_* → joint, else finetune; pass
    family='cyclical' for the pretraining wrapper of a finetune name."""
    is_dist = name.startswith("dist_")
    if family is None:
        if name.endswith("_8k_vocab"):
            family = "mim"
        elif "_joint_" in name:
            family = "joint"
        else:
            family = "finetune"

    cfg = _base_preset(name)
    if overrides:
        cfg = cfg.replace(**overrides)

    if family == "finetune":
        model = (DistVisionTransformer if is_dist else VisionTransformer)(
            cfg=cfg, dtype=dtype
        )
    elif family == "cyclical":
        cfg = cfg.replace(head_type="none")
        model = (DistCyclicalViT if is_dist else CyclicalViT)(cfg=cfg, dtype=dtype)
    elif family == "mim":
        cfg = cfg.replace(head_type="none")
        model = MIMViT(cfg=cfg, vocab_size=vocab_size, dtype=dtype)
    elif family == "joint":
        cfg = cfg.replace(head_type="none")
        model = JointViT(cfg=cfg, vocab_size=vocab_size, dtype=dtype)
    else:
        raise ValueError(f"unknown family: {family}")
    return model, cfg


def sngp_reset_cov(sngp_state: Any, ridge_penalty: float = 1e-3) -> Any:
    """Reset the GP precision matrix to ridge·I (SNGP.reset_cov,
    modeling_finetune.py:596-597) — call between epochs when using exact
    (momentum ≤ 0) covariance accumulation."""
    import jax

    def reset(leaf):
        if leaf.ndim == 2 and leaf.shape[0] == leaf.shape[1]:
            return ridge_penalty * jnp.eye(leaf.shape[0], dtype=leaf.dtype)
        return leaf

    return jax.tree_util.tree_map(reset, sngp_state)
