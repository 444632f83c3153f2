"""Stochastic "dist" mean+covariance transformer.

Mirrors modeling_finetune_dist.py (finetune variant, :15-326) and
modeling_cyclical_dist.py (pretrain variant, :14-166): two token streams
(mean, cov) flow through shared-weight attention whose logits are the
sigmoid-squashed negative 2-Wasserstein distance between (q, cov_q) and
(k, cov_k); the cov stream is rectified via ELU(·)+1 and attends with
squared attention weights.

Reference quirks handled (documented):
  - modeling_finetune_dist.py:48 references a nonexistent `self.drop_cov` in
    the no-layer-scale path (crash in torch); here drop_path is used for both
    streams in both paths.
  - modeling_finetune_dist.py:155 adds rel_pos_bias unconditionally (crash
    when no shared bias); here the add is guarded.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.core.init import scaled, trunc_normal
from uncertainty_vit_tpu.models.layers import Mlp, PatchEmbed, RelativePositionBias, drop_path
from uncertainty_vit_tpu.ops.losses import wasserstein_distance_matmul

Dtype = Any


class DistAttention(nn.Module):
    """Wasserstein-kernel attention over (mean, cov) streams
    (modeling_finetune_dist.py:61-179). qkv weights are SHARED between the
    streams; only the biases differ. cov path: ELU(qkv(cov_x)) + 1."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    layer_id: int = 0
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cov_x: jnp.ndarray,
        rel_pos_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        all_head = head_dim * self.num_heads
        scale = self.qk_scale or head_dim**-0.5
        tn = trunc_normal(self.init_std, 2.0)

        qkv_kernel = self.param("qkv_kernel", tn, (c, all_head * 3))
        # cov_qkv Linear exists as a parameter in the reference (:76) but its
        # weight is unused in forward (:127 uses self.qkv.weight); mirrored.
        _ = self.param("cov_qkv_kernel", tn, (c, all_head * 3))

        def project(inp, q_bias_name, v_bias_name):
            out = inp @ qkv_kernel.astype(self.dtype)
            if self.qkv_bias:
                qb = self.param(q_bias_name, nn.initializers.zeros, (all_head,))
                vb = self.param(v_bias_name, nn.initializers.zeros, (all_head,))
                out = out + jnp.concatenate(
                    [qb, jnp.zeros_like(vb), vb]
                ).astype(self.dtype)
            return out

        qkv = project(x, "q_bias", "v_bias")
        cov_qkv = nn.elu(project(cov_x, "cov_q_bias", "cov_v_bias")) + 1.0

        def split_heads(t):
            t = t.reshape(b, n, 3, self.num_heads, head_dim)
            return [jnp.moveaxis(t[:, :, i], 1, 2) for i in range(3)]

        q, k, v = split_heads(qkv)
        cov_q, cov_k, cov_v = split_heads(cov_qkv)

        q = q * scale
        attn = -wasserstein_distance_matmul(
            q.astype(jnp.float32), cov_q.astype(jnp.float32),
            k.astype(jnp.float32), cov_k.astype(jnp.float32),
        )
        attn = jax.nn.sigmoid(attn + 1e-24)
        if rel_pos_bias is not None:
            attn = attn + rel_pos_bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        attn = attn.astype(self.dtype)

        mean_ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        cov_ctx = jnp.einsum("bhqk,bhkd->bhqd", attn**2, cov_v)
        mean_ctx = jnp.moveaxis(mean_ctx, 1, 2).reshape(b, n, all_head)
        cov_ctx = jnp.moveaxis(cov_ctx, 1, 2).reshape(b, n, all_head)

        proj_init = tn if self.layer_id == 0 else scaled(tn, 1.0 / np.sqrt(2.0 * self.layer_id))
        mean_out = nn.Dense(self.dim, kernel_init=proj_init, dtype=self.dtype, name="proj")(mean_ctx)
        cov_out = nn.Dense(self.dim, kernel_init=proj_init, dtype=self.dtype, name="cov_proj")(cov_ctx)
        dropout = nn.Dropout(self.proj_drop, deterministic=deterministic)
        return dropout(mean_out), dropout(cov_out)


class DistBlock(nn.Module):
    """Pre-norm block over both streams with SHARED norms and MLP
    (modeling_finetune_dist.py:15-59)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    layer_id: int = 1
    init_std: float = 0.02
    layer_norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_mean: jnp.ndarray,
        x_cov: jnp.ndarray,
        rel_pos_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1")
        norm2 = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2")
        attn = DistAttention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop, proj_drop=self.drop,
            layer_id=self.layer_id, init_std=self.init_std, dtype=self.dtype,
            name="attn",
        )
        mlp = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
            drop=self.drop, layer_id=self.layer_id, init_std=self.init_std,
            dtype=self.dtype, name="mlp",
        )

        def dp(h):
            rng = (
                self.make_rng("droppath")
                if (not deterministic and self.drop_path_rate > 0.0)
                else None
            )
            return drop_path(h, self.drop_path_rate, rng, deterministic)

        mean, cov = attn(
            norm1(x_mean).astype(self.dtype), norm1(x_cov).astype(self.dtype),
            rel_pos_bias, deterministic,
        )
        if self.init_values is not None and self.init_values > 0:
            g1 = self.param("gamma_1", nn.initializers.constant(self.init_values), (self.dim,))
            g2 = self.param("gamma_2", nn.initializers.constant(self.init_values), (self.dim,))
            x_mean = x_mean + dp(g1.astype(self.dtype) * mean)
            fc_mean = dp(g2.astype(self.dtype) * mlp(norm2(x_mean).astype(self.dtype), deterministic))
            x_cov = x_cov + dp(g1.astype(self.dtype) * cov)
            fc_cov = dp(g2.astype(self.dtype) * mlp(norm2(x_cov).astype(self.dtype), deterministic))
        else:
            x_mean = x_mean + dp(mean)
            fc_mean = dp(mlp(norm2(x_mean).astype(self.dtype), deterministic))
            x_cov = x_cov + dp(cov)
            fc_cov = dp(mlp(norm2(x_cov).astype(self.dtype), deterministic))
        return x_mean + fc_mean, x_cov + fc_cov


class _DistBackbone(nn.Module):
    """Shared trunk: dual patch embeds + dual cls (+ optional dual mask
    tokens), no abs pos embed, shared rel-pos bias, DistBlocks."""

    cfg: ViTConfig
    has_mask_tokens: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        collect_layers: bool = False,
    ):
        cfg = self.cfg
        tn = trunc_normal(0.02, 2.0)
        images = images.astype(self.dtype)

        mean_x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=self.dtype,
                            name="patch_embed")(images)
        cov_x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=self.dtype,
                           name="cov_patch_embed")(images)
        b, n, c = mean_x.shape

        cls = self.param("cls_token", tn, (1, 1, c))
        cov_cls = self.param("cov_cls_token", tn, (1, 1, c))

        if self.has_mask_tokens:
            mask_token = self.param("mask_token", tn, (1, 1, c))
            cov_mask_token = self.param("cov_mask_token", tn, (1, 1, c))
            if bool_masked_pos is not None:
                w = bool_masked_pos.reshape(b, n, 1).astype(self.dtype)
                mean_x = mean_x * (1 - w) + mask_token.astype(self.dtype) * w
                cov_x = cov_x * (1 - w) + cov_mask_token.astype(self.dtype) * w

        mean_x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c)), mean_x], 1)
        cov_x = jnp.concatenate([jnp.broadcast_to(cov_cls.astype(self.dtype), (b, 1, c)), cov_x], 1)
        mean_x = nn.Dropout(cfg.drop_rate, deterministic=deterministic, name="pos_drop")(mean_x)
        cov_x = nn.Dropout(cfg.drop_rate, deterministic=deterministic, name="cov_pos_drop")(cov_x)

        rel_pos_bias = None
        if cfg.use_shared_rel_pos_bias:
            rel_pos_bias = RelativePositionBias(
                window_size=cfg.grid_size, num_heads=cfg.num_heads, name="rel_pos_bias"
            )()

        dpr = np.linspace(0, cfg.drop_path_rate, cfg.depth)
        mean_z: List[jnp.ndarray] = []
        cov_z: List[jnp.ndarray] = []
        for i in range(cfg.depth):
            mean_x, cov_x = DistBlock(
                dim=cfg.embed_dim, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate, drop_path_rate=float(dpr[i]),
                init_values=cfg.init_values, layer_id=i + 1,
                layer_norm_eps=cfg.layer_norm_eps, dtype=self.dtype,
                name=f"blocks_{i}",
            )(mean_x, cov_x, rel_pos_bias, deterministic)
            if collect_layers:
                mean_z.append(mean_x)
                cov_z.append(cov_x)
        return mean_x, cov_x, mean_z, cov_z


class DistVisionTransformer(nn.Module):
    """Finetune dist ViT (modeling_finetune_dist.py:181-326): mean-pool both
    streams through the shared fc_norm, classify the mean. Returns
    (mean_pooled, cov_pooled, logits)."""

    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, bool_masked_pos=None, deterministic: bool = True):
        cfg = self.cfg
        mean_x, cov_x, _, _ = _DistBackbone(
            cfg=cfg, has_mask_tokens=False, dtype=self.dtype, name="backbone"
        )(images, bool_masked_pos, deterministic)

        if cfg.use_mean_pooling:
            fc_norm = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps,
                use_bias=not cfg.linear_classifier,
                use_scale=not cfg.linear_classifier,
                name="fc_norm",
            )
            mean_pooled = fc_norm(mean_x[:, 1:, :].mean(axis=1))
            cov_pooled = fc_norm(cov_x[:, 1:, :].mean(axis=1))
        else:
            norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")
            mean_pooled = norm(mean_x)[:, 0]
            cov_pooled = norm(cov_x)[:, 0]

        logits = nn.Dense(
            cfg.num_classes, kernel_init=trunc_normal(0.02, 2.0), name="head"
        )(mean_pooled.astype(jnp.float32))
        return mean_pooled, cov_pooled, logits


class DistCyclicalViT(nn.Module):
    """Pretrain dist ViT (modeling_cyclical_dist.py:14-166). Call modes match
    CyclicalViT; the masked-gather student head runs over all patch tokens
    (loss masks — same TPU divergence as models/cyclical.py)."""

    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images,
        bool_masked_pos=None,
        return_all_tokens: bool = False,
        layer_results: Optional[str] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        mean_x, cov_x, mean_z, cov_z = _DistBackbone(
            cfg=cfg, has_mask_tokens=True, dtype=self.dtype, name="backbone"
        )(images, bool_masked_pos, deterministic, collect_layers=bool(layer_results))

        if layer_results:
            return [z[:, 1:] for z in mean_z], [z[:, 1:] for z in cov_z]

        norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")
        mean_x = norm(mean_x)[:, 1:]
        cov_x = norm(cov_x)[:, 1:]
        tn = trunc_normal(0.02, 2.0)
        mean_out = nn.Dense(cfg.embed_dim, kernel_init=tn, dtype=self.dtype,
                            name="lm_head")(mean_x)
        cov_out = nn.Dense(cfg.embed_dim, kernel_init=tn, dtype=self.dtype,
                           name="cov_lm_head")(cov_x)
        return mean_out, cov_out
