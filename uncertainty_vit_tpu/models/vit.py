"""Canonical ViT backbone and the supervised/finetune model.

Mirrors `VisionTransformer` of the reference (modeling_finetune.py:367-523)
with one shared backbone also used by the pretraining models
(models/cyclical.py, models/mim.py), collapsing the reference's duplicate
model files into a single implementation.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.core.init import scaled, trunc_normal
from uncertainty_vit_tpu.models.layers import Block, PatchEmbed, RelativePositionBias

Dtype = Any


class ViTBackbone(nn.Module):
    """Patch embed → [cls] + tokens (+ masking, + pos embed) → blocks.

    Returns (x, layer_xs, fc_features): final tokens and the per-layer block
    outputs / post-MLP residuals used by data2vec targets
    (modeling_cyclical.py:199-206) and learn_layer_weights
    (modeling_finetune.py:494-510). Unused outputs are DCE'd by XLA.
    """

    cfg: ViTConfig
    has_mask_token: bool = False
    # finetune masks only in training (modeling_finetune.py:482-486); the
    # cyclical student masks whenever a mask is given
    # (modeling_cyclical.py:179-182).
    mask_only_when_training: bool = True
    patch_embed_init: Any = "torch"
    # sequence-parallel mesh (data × seq × …): token activations get a
    # with_sharding_constraint over ('data', 'seq') and the attention kernel
    # runs token-sharded via shard_map (SURVEY §5.7; parallel/mesh.py)
    seq_mesh: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        mc_samples: int = 0,
        mc_split: int = 0,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
        """mc_samples > 0 enables split-trunk MC-dropout: blocks [0, mc_split)
        run once deterministically (shared activations), the batch is tiled K×
        and blocks [mc_split, depth) run with dropout active. One compiled
        program whose cost is fwd·(mc_split + K·(depth−mc_split))/depth — the
        BASELINE.json 'shared-activation reuse' MC-dropout. Equivalent to
        exact MC-dropout when the trunk blocks carry no active dropout."""
        cfg = self.cfg
        tn = trunc_normal(cfg.init_std, cfg.init_trunc_abs)

        x = PatchEmbed(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            weight_init=self.patch_embed_init,
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        b, n, c = x.shape
        if self.seq_mesh is not None:
            # anchor the token sharding on the PATCH tokens (the grid² count
            # divides the seq axis; the +1 cls total would not). GSPMD
            # propagates it through the cls concat and the block stack —
            # explicit constraints require divisibility, propagated
            # shardings do not. The attention kernel re-shards at its
            # shard_map boundary with its own pad (flash_attention.py).
            from jax.sharding import NamedSharding

            from uncertainty_vit_tpu.parallel import mesh as pmesh

            if n % self.seq_mesh.shape[pmesh.SEQ_AXIS] == 0:
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.seq_mesh, pmesh.token_spec())
                )

        cls_token = self.param("cls_token", tn, (1, 1, cfg.embed_dim))

        if self.has_mask_token:
            mask_token = self.param("mask_token", tn, (1, 1, cfg.embed_dim))
            apply_mask = bool_masked_pos is not None and (
                not self.mask_only_when_training or not deterministic
            )
            if apply_mask:
                w = bool_masked_pos.reshape(b, n, 1).astype(self.dtype)
                x = x * (1.0 - w) + mask_token.astype(self.dtype) * w

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, c)), x], axis=1
        )
        if cfg.use_abs_pos_emb:
            pos_embed = self.param("pos_embed", tn, (1, cfg.num_patches + 1, cfg.embed_dim))
            x = x + pos_embed.astype(self.dtype)
        pos_drop_rate = cfg.drop_rate if cfg.dropout_from_block == 0 else 0.0
        x = nn.Dropout(pos_drop_rate, deterministic=deterministic, name="pos_drop")(x)

        rel_pos_bias = None
        if cfg.use_shared_rel_pos_bias:
            rel_pos_bias = RelativePositionBias(
                window_size=cfg.grid_size, num_heads=cfg.num_heads, name="rel_pos_bias"
            )()

        dpr = np.linspace(0, cfg.drop_path_rate, cfg.depth)
        layer_xs: List[jnp.ndarray] = []
        fc_features: List[jnp.ndarray] = []
        # int8 path: run the trunk on flattened [B*N, C] activations. XLA
        # assigns [B, N, C] elementwise fusions a batch-minor layout that
        # every Pallas boundary must relayout-copy (~0.4 ms each at ViT-B
        # batch 128); 2-D activations stay in the standard layout end to end
        # (tools/probe_quant_layout.py). Reshapes to/from the attention
        # kernel's [B, N, 3C] are layout-preserving bitcasts.
        # Counter-intuitively this holds for the XLA int8 impl too, not just
        # Pallas: the flat layout costs +8.2 ms/fwd in ISOLATED pure-bf16
        # forward (probe_quant_fwd 'flat-only'), but on the full train step
        # the 3-D trunk is catastrophic for the quantize passes — measured
        # int8-xla 145.2 / int8-xla-fwd 140.9 ms/step on the 3-D trunk vs
        # 113.9 / 109.8 flat (bf16 107.5). The fwd-only number is an
        # isolation artifact that inverts under autodiff.
        flat = cfg.quant != "none"
        seq = x.shape[1]
        unflat = (lambda t: t.reshape(-1, seq, c)) if flat else (lambda t: t)
        if flat:
            x = x.reshape(-1, c)
        for i in range(cfg.depth):
            if mc_samples > 0 and i == mc_split:
                x = jnp.tile(x, (mc_samples, 1) if flat else (mc_samples, 1, 1))
            block_deterministic = deterministic if mc_samples == 0 else (i < mc_split)
            x, fc = Block(
                dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                drop=cfg.drop_rate if i >= cfg.dropout_from_block else 0.0,
                attn_drop=cfg.attn_drop_rate if i >= cfg.dropout_from_block else 0.0,
                drop_path_rate=float(dpr[i]),
                init_values=cfg.init_values,
                window_size=cfg.grid_size if cfg.use_rel_pos_bias else None,
                variant=cfg.attn_variant,
                sinkformer_eps=cfg.sinkformer_eps,
                sinkformer_iters=cfg.sinkformer_iters,
                dual_sto_n_centroids=cfg.dual_sto_n_centroids,
                layer_id=i + 1,
                init_std=cfg.init_std,
                init_trunc_abs=cfg.init_trunc_abs,
                layer_norm_eps=cfg.layer_norm_eps,
                use_flash=cfg.use_flash_attention,
                quant=cfg.quant,
                seq_len=seq if flat else None,
                seq_mesh=self.seq_mesh,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, rel_pos_bias, block_deterministic)
            layer_xs.append(unflat(x))
            fc_features.append(unflat(fc))

        x = unflat(x)
        if mc_samples > 0 and mc_split >= cfg.depth:
            x = jnp.tile(x, (mc_samples, 1, 1))
        return x, layer_xs, fc_features


class VisionTransformer(nn.Module):
    """Supervised/finetune ViT (modeling_finetune.py:367-523).

    forward → pooled feature → head. For head_type 'sngp'/'het' the classifier
    module lives in models/heads.py and may carry mutable state ('sngp_state')
    threaded by the train/eval engines.
    """

    cfg: ViTConfig
    # sequence-parallel mesh (see ViTBackbone.seq_mesh)
    seq_mesh: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        update_sngp_cov: bool = False,
        return_gp_cov: bool = False,
        mc_samples: int = 0,
        mc_split: int = 0,
        return_features: bool = False,
    ):
        cfg = self.cfg
        if mc_samples > 0:
            assert not cfg.learn_layer_weights, "mc split incompatible with layer weights"
            assert not return_features, "return_features incompatible with mc_samples"
        x, layer_xs, _ = ViTBackbone(
            cfg=cfg,
            has_mask_token=cfg.has_masking,
            mask_only_when_training=True,
            patch_embed_init="torch",
            seq_mesh=self.seq_mesh,
            dtype=self.dtype,
            name="backbone",
        )(images, bool_masked_pos, deterministic,
          mc_samples=mc_samples, mc_split=mc_split)

        feat = self._pool(x, layer_xs, deterministic, update_sngp_cov)
        out = self._head(feat, update_sngp_cov, return_gp_cov)
        if return_features:
            # (logits, head-input feature) — the last-layer Laplace fit
            # needs the pooled feature the linear head consumes
            # (evals/laplace.py)
            return out, feat
        if mc_samples > 0:
            b = images.shape[0]
            out = jax.tree_util.tree_map(
                lambda t: t.reshape(mc_samples, b, *t.shape[1:]), out
            )
        return out

    def _pool(self, x, layer_xs, deterministic, update_sngp_cov):
        cfg = self.cfg
        if cfg.learn_layer_weights:
            # Softmax-weighted combination of per-layer pooled features
            # (modeling_finetune.py:499-510).
            pooled = [
                lx[:, 1:, :].mean(axis=1) if cfg.use_mean_pooling else lx[:, 0]
                for lx in layer_xs
            ]
            if cfg.layernorm_before_combine:
                pooled = [
                    _plain_layer_norm(p.astype(jnp.float32)) for p in pooled
                ]
            log_w = self.param(
                "layer_log_weights", nn.initializers.zeros, (cfg.depth,)
            )
            weights = nn.softmax(log_w)
            stacked = jnp.stack(pooled, axis=-1)  # [B, C, depth]
            return jnp.einsum("bcd,d->bc", stacked, weights.astype(stacked.dtype))

        if cfg.use_mean_pooling:
            t = x[:, 1:, :].mean(axis=1)
            if cfg.remove_final_norm:
                # fc_norm → Identity (run_class_finetuning.py:524-527)
                return t
            if cfg.sngp_fc_norm:
                # spectral_norm(BertLinear) replaces fc_norm under --sngp
                # (modeling_finetune.py:413-414).
                from uncertainty_vit_tpu.models.heads import SpectralNormDense

                return SpectralNormDense(
                    features=cfg.embed_dim, dtype=self.dtype, name="fc_norm_sn"
                )(t, update=update_sngp_cov and not deterministic)
            return nn.LayerNorm(
                epsilon=cfg.layer_norm_eps,
                use_bias=not cfg.linear_classifier,
                use_scale=not cfg.linear_classifier,
                name="fc_norm",
            )(t)
        # cls-token head: final norm then cls (modeling_finetune.py:411, 517).
        if cfg.remove_final_norm:
            return x[:, 0]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        return x[:, 0]

    def _head(self, feat, update_sngp_cov, return_gp_cov):
        cfg = self.cfg
        if cfg.head_type == "none":
            return feat
        if cfg.head_type == "linear":
            tn = trunc_normal(0.02, 2.0)
            return nn.Dense(
                cfg.num_classes,
                kernel_init=scaled(tn, cfg.init_scale),
                bias_init=nn.initializers.zeros,
                name="head",
            )(feat.astype(jnp.float32))
        if cfg.head_type == "sngp":
            from uncertainty_vit_tpu.models.heads import SNGPHead

            return SNGPHead(
                hidden_size=cfg.embed_dim,
                num_inducing=cfg.sngp_num_inducing or cfg.embed_dim,
                num_classes=cfg.num_classes,
                momentum=cfg.sngp_momentum,
                ridge_penalty=cfg.sngp_ridge_penalty,
                name="head",
            )(feat, update_cov=update_sngp_cov, return_gp_cov=return_gp_cov)
        if cfg.head_type == "het":
            from uncertainty_vit_tpu.models.heads import MCSoftmaxDenseFA

            return MCSoftmaxDenseFA(
                num_classes=cfg.num_classes,
                num_factors=cfg.het_num_factors,
                temperature=cfg.het_temperature,
                train_mc_samples=cfg.het_train_mc_samples,
                test_mc_samples=cfg.het_test_mc_samples,
                name="head",
            )(feat.astype(jnp.float32), training=update_sngp_cov)
        raise ValueError(f"unknown head_type: {cfg.head_type}")


def _plain_layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """F.layer_norm with no affine params (torch default eps 1e-5)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)
