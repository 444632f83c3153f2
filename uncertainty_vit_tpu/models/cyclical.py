"""data2vec-style cyclical pretraining model (student == teacher architecture).

Mirrors `VisionTransformerForCyclicalTraining` (modeling_cyclical.py:33-225):
masked patches are replaced by a learned mask token, the teacher (an EMA copy
run unmasked) exposes per-layer activations, and the student regresses those
targets at the masked positions through `lm_head`.

TPU divergence (documented): the reference gathers the variable-length set of
masked tokens before `lm_head` (modeling_cyclical.py:219-225). Dynamic gathers
break XLA's static shapes, so here `lm_head` runs on all patch tokens and the
loss masks instead — identical math for the masked-mean losses at a negligible
FLOP cost (768² over ≤196 tokens).
"""

from __future__ import annotations

from typing import Any, List, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.core.init import trunc_normal
from uncertainty_vit_tpu.models.vit import ViTBackbone

Dtype = Any


class CyclicalViT(nn.Module):
    """Student/teacher ViT for cyclical (data2vec) pretraining.

    Call modes (modeling_cyclical.py:209-225):
    - layer_results='end'|'fc': returns the list of per-layer activations with
      the cls token stripped (teacher mode; no final norm).
    - return_all_tokens=True: lm_head over all patch tokens after final norm.
    - default: lm_head over all patch tokens (loss applies the mask).
    """

    cfg: ViTConfig
    gp_layer: bool = False
    init_std: float = 0.02
    # sequence-parallel mesh (see ViTBackbone.seq_mesh)
    seq_mesh: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        return_all_tokens: bool = False,
        layer_results: Optional[str] = None,
        deterministic: bool = True,
        update_sngp_cov: bool = False,
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        cfg = self.cfg.replace(
            init_std=self.init_std,
            # cyclical zoo truncates trunc_normal_ at ±std
            # (modeling_cyclical.py:23-24).
            init_trunc_abs=self.init_std,
        )
        x, layer_xs, fc_features = ViTBackbone(
            cfg=cfg,
            has_mask_token=True,
            mask_only_when_training=False,
            patch_embed_init=("trunc", self.init_std),
            seq_mesh=self.seq_mesh,
            dtype=self.dtype,
            name="backbone",
        )(images, bool_masked_pos, deterministic)

        if layer_results:
            zs = layer_xs if layer_results == "end" else fc_features
            return [z[:, 1:] for z in zs]

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        x = x[:, 1:]

        if self.gp_layer:
            from uncertainty_vit_tpu.models.heads import SNGPHead

            b, n, c = x.shape
            out = SNGPHead(
                hidden_size=cfg.embed_dim,
                num_inducing=cfg.embed_dim,
                num_classes=cfg.embed_dim,
                name="lm_head",
            )(x.reshape(b * n, c), update_cov=update_sngp_cov)
            return out.reshape(b, n, -1)

        tn = trunc_normal(self.init_std, self.init_std)
        return nn.Dense(
            cfg.embed_dim,
            kernel_init=tn,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="lm_head",
        )(x)
