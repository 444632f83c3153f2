"""BEiT masked-image-modeling pretrainer and the joint cyclical+BEiT model.

Mirrors `VisionTransformerForMaskedImageModeling` (modeling_pretrain.py:32-136)
and `VisionTransformerForCyclicalJointTraining`
(modeling_cyclical_joint.py:32-220) on the shared ViTBackbone. As with the
cyclical student, heads run over all patch tokens and the loss masks (static
shapes) instead of gathering masked tokens.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.core.init import trunc_normal
from uncertainty_vit_tpu.models.vit import ViTBackbone

Dtype = Any


class MIMViT(nn.Module):
    """Classic BEiT pretrainer: masked patches → dVAE codebook logits
    (modeling_pretrain.py:32-136)."""

    cfg: ViTConfig
    vocab_size: int = 8192
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        return_all_tokens: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg.replace(init_std=self.init_std, init_trunc_abs=self.init_std)
        x, _, _ = ViTBackbone(
            cfg=cfg,
            has_mask_token=True,
            mask_only_when_training=False,
            patch_embed_init=("trunc", self.init_std),
            dtype=self.dtype,
            name="backbone",
        )(images, bool_masked_pos, deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)[:, 1:]
        tn = trunc_normal(self.init_std, self.init_std)
        return nn.Dense(
            self.vocab_size, kernel_init=tn, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="lm_head",
        )(x).astype(jnp.float32)


class JointViT(nn.Module):
    """Joint cyclical + BEiT pretrainer (modeling_cyclical_joint.py:32-220):
    lm_head is a 2-layer GELU MLP regressing teacher features, beit_head
    predicts codebook tokens; forward returns (lm_out, beit_out)."""

    cfg: ViTConfig
    vocab_size: int = 8192
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        return_all_tokens: bool = False,
        layer_results: Optional[str] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg.replace(init_std=self.init_std, init_trunc_abs=self.init_std)
        x, layer_xs, fc_features = ViTBackbone(
            cfg=cfg,
            has_mask_token=True,
            mask_only_when_training=False,
            patch_embed_init=("trunc", self.init_std),
            dtype=self.dtype,
            name="backbone",
        )(images, bool_masked_pos, deterministic)

        if layer_results:
            zs = layer_xs if layer_results == "end" else fc_features
            return [z[:, 1:] for z in zs]

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)[:, 1:]
        tn = trunc_normal(self.init_std, self.init_std)
        h = nn.Dense(cfg.embed_dim * 2, kernel_init=tn, dtype=self.dtype,
                     name="lm_head_fc1")(x)
        h = nn.gelu(h, approximate=False)
        lm_out = nn.Dense(cfg.embed_dim, kernel_init=tn, dtype=self.dtype,
                          name="lm_head_fc2")(h)
        beit_out = nn.Dense(
            self.vocab_size, kernel_init=tn, dtype=self.dtype, name="beit_head"
        )(x).astype(jnp.float32)
        return lm_out, beit_out
