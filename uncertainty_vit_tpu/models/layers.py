"""Canonical ViT building blocks (flax.linen).

One implementation replaces the reference's five near-duplicate model files
(modeling_finetune.py, modeling_finetune_try.py, modeling_pretrain.py,
modeling_cyclical.py, modeling_cyclical_joint.py — see SURVEY.md §2.1).
Numerical semantics follow modeling_finetune.py; each module cites the lines
it mirrors. Layout is TPU-native: images are NHWC, compute dtype is
configurable (bfloat16 for the hot path), parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.core.init import scaled, torch_bias_default, torch_linear_default, trunc_normal
from uncertainty_vit_tpu.ops import attention as attn_ops
from uncertainty_vit_tpu.ops import quant as quant_ops
from uncertainty_vit_tpu.ops import relpos
from uncertainty_vit_tpu.ops.flash_attention import fused_qkv_attention, kernel_supported

Dtype = Any


def drop_path(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array], deterministic: bool,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """Stochastic depth per sample (modeling_finetune.py:51-62 / timm drop_path).

    seq_len: when x is the flattened [B*N, C] token matrix (the 2-D trunk
    layout of the int8 path), the per-SAMPLE mask of the reference is one
    bernoulli draw per N consecutive rows."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    if x.ndim == 2 and seq_len is not None:
        b = x.shape[0] // seq_len
        mask = jax.random.bernoulli(rng, keep, (b, 1))
        mask = jnp.broadcast_to(mask[:, None], (b, seq_len, 1)).reshape(-1, 1)
    else:
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _use_quant(quant: str, x: jnp.ndarray, features: int) -> bool:
    """True when the int8 Pallas path should run: flag on, lane-aligned
    shapes, and a TPU backend (or the interpreter, for CPU tests)."""
    if quant != "int8":
        return False
    from uncertainty_vit_tpu.ops import flash_attention as _fa

    if _fa.FORWARD_AD_ONLY:  # Pallas has no JVP rule; see forward_ad_safe()
        return False
    m = int(np.prod(x.shape[:-1]))
    if not quant_ops.supported(m, x.shape[-1], features):
        return False
    return jax.default_backend() == "tpu" or quant_ops.INTERPRET


def _dropout(mod: nn.Module, x: jnp.ndarray, rate: float, deterministic: bool):
    """nn.Dropout, or the fused in-kernel-PRNG Pallas dropout when
    ops.dropout.FUSED is set (trace-time, MC-dropout eval only — see
    ops/dropout.py). Same inverted-dropout math; different mask stream."""
    if deterministic or rate == 0.0:
        return x
    from uncertainty_vit_tpu.ops import dropout as fused
    from uncertainty_vit_tpu.ops import flash_attention as _fa

    if fused.FUSED and fused.supported(x) and not _fa.FORWARD_AD_ONLY:
        return fused.fused_dropout(x, float(rate), mod.make_rng("dropout"))
    return nn.Dropout(rate, deterministic=False)(x)


def _quant_seed(mod: nn.Module, deterministic: bool) -> jnp.ndarray:
    """int32 [1] seed for the gradient stochastic rounding. Each call
    consumes one 'quant' rng fold; eval (no backward) gets a fixed seed."""
    if not deterministic and mod.has_rng("quant"):
        return jax.random.randint(
            mod.make_rng("quant"), (1,), 0, 2**31 - 1, jnp.int32
        )
    return jnp.zeros((1,), jnp.int32)


class _PatchProj(nn.Module):
    """Holds the conv-layout (HWIO) kernel but applies it as a matmul."""

    patch_size: int
    in_chans: int
    embed_dim: int
    kinit: Any
    binit: Any
    dtype: Dtype

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        kernel = self.param("kernel", self.kinit, (p, p, self.in_chans, self.embed_dim))
        bias = self.param("bias", self.binit, (self.embed_dim,))
        wm = kernel.reshape(-1, self.embed_dim).astype(self.dtype)
        return patches @ wm + bias.astype(self.dtype)


class PatchEmbed(nn.Module):
    """Patchifier → [B, N, C] (modeling_finetune.py:304-325), NHWC input.

    The stride-p conv is computed as space-to-depth + matmul — identical
    math, ~2× faster than XLA's conv lowering for 3-channel inputs on v5e —
    while the parameter keeps the conv HWIO layout (checkpoint/importer
    compatible)."""

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32
    # 'torch' = torch Conv2d default (finetune zoo); ('trunc', std) for the
    # cyclical zoo's Conv init (modeling_cyclical.py:158-161).
    weight_init: Any = "torch"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = x.shape
        if self.weight_init == "torch":
            kinit = torch_linear_default()
            binit = torch_bias_default(fan_in=c * p * p)
        else:
            _, std = self.weight_init
            kinit = trunc_normal(std=std, abs_bound=std)
            binit = nn.initializers.zeros

        gh, gw = h // p, w // p
        # space-to-depth: patch-major rows [py, px, c], matching HWIO flatten
        patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, p * p * c).astype(self.dtype)
        return _PatchProj(
            patch_size=p, in_chans=c, embed_dim=self.embed_dim,
            kinit=kinit, binit=binit, dtype=self.dtype, name="proj",
        )(patches)


class _ScaledOutDense(nn.Module):
    """Dense whose kernel/bias are premultiplied by an optional per-feature
    scale — the layer-scale fold. γ ⊙ (x @ W + b) = x @ (W·γ) + γ⊙b exactly,
    but scaling the [C_in, C_out] weight costs ~43× less than scaling the
    [B, N, C_out] activations (measured 0.28 ms/layer of VPU/HBM passes at
    ViT-B/224 batch 128 for the activation form — the Pallas attention call
    is opaque to XLA so the multiply could not fuse into an epilogue).
    Param tree matches nn.Dense (kernel/bias under this module's name)."""

    features: int
    kernel_init: Any
    dtype: Dtype
    quant: str = "none"

    @nn.compact
    def __call__(self, x, scale=None, deterministic: bool = True):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if scale is not None:
            kernel = kernel * scale[None, :]
            bias = bias * scale
        if _use_quant(self.quant, x, self.features):
            # int8 fwd/dgrad/wgrad from the f32 master weights; the fold
            # above quantizes the already-scaled kernel (exact w.r.t. the
            # bf16 fold since both are diagonal rescalings pre-quantization)
            return quant_ops.int8_dense(
                x, kernel, bias, _quant_seed(self, deterministic)
            )
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class Mlp(nn.Module):
    """fc1 → GELU(exact) → fc2 → dropout (modeling_finetune.py:65-82; dropout
    only after fc2 per the comment at :78-80)."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    layer_id: int = 0  # 1-based; 0 disables the fix_init rescale
    init_std: float = 0.02
    init_trunc_abs: float = 2.0
    quant: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, out_scale=None
    ) -> jnp.ndarray:
        tn = trunc_normal(self.init_std, self.init_trunc_abs)
        # same param tree as nn.Dense (kernel/bias under "fc1"); the wrapper
        # adds the optional int8 path
        x = _ScaledOutDense(
            features=self.hidden_dim, kernel_init=tn, dtype=self.dtype,
            quant=self.quant, name="fc1",
        )(x, None, deterministic)
        # torch nn.GELU is exact erf; under bfloat16 compute the tanh form is
        # numerically indistinguishable (max diff ~3e-4 < the bf16 quantum)
        # and ~9 ms/fwd cheaper on v5e at ViT-B/224 batch 128, so it is
        # auto-selected for bf16. f32 keeps exact erf for torch parity.
        x = nn.gelu(x, approximate=(self.dtype == jnp.bfloat16))
        fc2_init = tn if self.layer_id == 0 else scaled(tn, 1.0 / np.sqrt(2.0 * self.layer_id))
        x = _ScaledOutDense(
            features=self.out_dim, kernel_init=fc2_init, dtype=self.dtype,
            quant=self.quant, name="fc2",
        )(x, out_scale, deterministic)
        x = _dropout(self, x, self.drop, deterministic)
        return x


class RelativePositionBias(nn.Module):
    """Shared-across-blocks rel-pos bias table (modeling_finetune.py:328-364).

    Returns [num_heads, N+1, N+1]; zero-initialized like the reference
    (trunc_normal_ of the table is commented out at :357).
    """

    window_size: Tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        nrd = relpos.num_relative_distance(self.window_size)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (nrd, self.num_heads),
        )
        index = jnp.asarray(relpos.relative_position_index(self.window_size))
        bias = table[index.reshape(-1)].reshape(index.shape + (self.num_heads,))
        return bias.transpose(2, 0, 1)


class Attention(nn.Module):
    """MHSA with the reference's fused-qkv / no-key-bias layout
    (modeling_finetune.py:85-188).

    The qkv Linear has no bias; q_bias and v_bias are separate parameters and
    the key bias is structurally zero (:149). Optional per-block rel-pos table
    (window_size), optional shared bias add, softmax/gumbel/sinkformer
    probability variants, attention dropout, projection + dropout.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    window_size: Optional[Tuple[int, int]] = None
    attn_head_dim: Optional[int] = None
    variant: str = "softmax"
    sinkformer_eps: float = 1.0
    sinkformer_iters: int = 3
    layer_id: int = 0
    init_std: float = 0.02
    init_trunc_abs: float = 2.0
    use_flash: bool = True
    quant: str = "none"
    # static token count when called with the flattened 2-D [B*N, C] trunk
    # layout (int8 path: XLA relayout-copies every [B, N, C] fusion output
    # feeding a Pallas call ~0.4 ms each; 2-D activations keep the standard
    # layout end-to-end — tools/probe_quant_layout.py)
    seq_len: Optional[int] = None
    # sequence-parallel mesh (data × seq × …): when set, the kernel path
    # runs token-sharded via shard_map + k/v all-gather over 'seq'
    # (ops/flash_attention.seq_sharded_qkv_attention, SURVEY §5.7)
    seq_mesh: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        rel_pos_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        out_scale=None,
    ) -> jnp.ndarray:
        flat = x.ndim == 2
        if flat:
            n = self.seq_len
            b, c = x.shape[0] // n, x.shape[1]
        else:
            b, n, c = x.shape
        head_dim = self.attn_head_dim or self.dim // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = self.qk_scale or head_dim**-0.5
        tn = trunc_normal(self.init_std, self.init_trunc_abs)

        qkv_kernel = self.param("qkv_kernel", tn, (c, all_head_dim * 3))
        qkv_bias_vec = None
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,))
            # q|zeros|v rows — the structurally-zero key bias
            # (modeling_finetune.py:146-151). Added in the matmul epilogue
            # (XLA fuses it for free; the int8 kernel adds it in its own
            # epilogue), NOT inside the attention kernel: the VMEM-slab add
            # measured ~1 ms/step of extra VPU work (the kernel still
            # accepts a packed [3, C] qv_bias for callers without a
            # preceding matmul to fuse into).
            qkv_bias_vec = jnp.concatenate([q_bias, jnp.zeros_like(v_bias), v_bias])
        if _use_quant(self.quant, x, all_head_dim * 3):
            qkv = quant_ops.int8_dense(
                x, qkv_kernel, qkv_bias_vec, _quant_seed(self, deterministic)
            )
        else:
            qkv = x @ qkv_kernel.astype(self.dtype)
            if qkv_bias_vec is not None:
                qkv = qkv + qkv_bias_vec.astype(self.dtype)

        bias_bhnn = None
        if self.window_size is not None:
            nrd = relpos.num_relative_distance(self.window_size)
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.zeros,
                (nrd, self.num_heads),
            )
            index = jnp.asarray(relpos.relative_position_index(self.window_size))
            local = table[index.reshape(-1)].reshape(index.shape + (self.num_heads,))
            bias_bhnn = local.transpose(2, 0, 1)  # [H, N, N]
        if rel_pos_bias is not None:
            bias_bhnn = rel_pos_bias if bias_bhnn is None else bias_bhnn + rel_pos_bias

        from uncertainty_vit_tpu.ops import flash_attention as _fa

        use_kernel = (
            self.use_flash
            and not _fa.FORWARD_AD_ONLY
            and self.variant == "softmax"
            and kernel_supported(self.num_heads, head_dim, n)
            and (jax.default_backend() == "tpu" or _fa.INTERPRET)
        )
        if use_kernel:
            # Fused path: per-head slicing happens inside the kernel, so the
            # [B, H, N, D] transposed copies never materialize; attention
            # dropout runs in-kernel with a regenerable per-(b,h) mask.
            drop_rate = 0.0 if deterministic else self.attn_drop
            if drop_rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            # reshape 2-D [B*N, 3C] → [B, N, 3C] is a layout-preserving
            # bitcast; the kernel's in/out live in the standard layout
            if self.seq_mesh is not None:
                if drop_rate > 0.0:
                    raise ValueError(
                        "sequence-parallel attention requires attn_drop=0 "
                        "(in-kernel dropout seeds are not defined across "
                        "re-sharded grids)"
                    )
                from uncertainty_vit_tpu.ops.flash_attention import (
                    seq_sharded_qkv_attention,
                )

                out = seq_sharded_qkv_attention(
                    qkv.reshape(b, n, -1), bias_bhnn, None, scale,
                    self.num_heads, self.seq_mesh,
                )
            else:
                out = fused_qkv_attention(
                    qkv.reshape(b, n, -1), bias_bhnn, None, seed, scale,
                    self.num_heads, drop_rate,
                )
            if flat:
                out = out.reshape(b * n, -1)
        else:
            qkv_r = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = [jnp.moveaxis(qkv_r[:, :, i], 1, 2) for i in range(3)]
            dropout_rng = None
            gumbel_rng = None
            if self.attn_drop > 0.0 and not deterministic:
                dropout_rng = self.make_rng("dropout")
            if self.variant == "gumbel":
                gumbel_rng = self.make_rng("gumbel")
            out = attn_ops.naive_attention(
                q, k, v, scale, bias_bhnn,
                variant=self.variant,
                dropout_rate=self.attn_drop,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
                gumbel_rng=gumbel_rng,
                sinkformer_eps=self.sinkformer_eps,
                sinkformer_iters=self.sinkformer_iters,
            )
            out = jnp.moveaxis(out, 1, 2).reshape(
                (b * n, all_head_dim) if flat else (b, n, all_head_dim)
            )
        proj_init = tn if self.layer_id == 0 else scaled(tn, 1.0 / np.sqrt(2.0 * self.layer_id))
        out = _ScaledOutDense(
            features=self.dim, kernel_init=proj_init, dtype=self.dtype,
            quant=self.quant, name="proj",
        )(out, out_scale, deterministic)
        out = _dropout(self, out, self.proj_drop, deterministic)
        return out


class DualStoSelfAttention(nn.Module):
    """'h_sto_trans' variant (modeling_finetune.py:191-260): keys are
    hard-Gumbel-quantized onto a learned centroid codebook; attention weights
    are hard-Gumbel over q·sto_k. Temperatures are both sqrt(h_size)
    (:207-208)."""

    h_size: int
    n_heads: int
    prob_attn: float = 0.0
    prob_h: float = 0.0
    n_centroids: int = 2
    init_std: float = 0.02
    init_trunc_abs: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        rel_pos_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del rel_pos_bias  # unused by the reference variant (:217-255)
        b, n, _ = x.shape
        head_dim = self.h_size // self.n_heads
        tau = float(self.h_size) ** 0.5
        tn = trunc_normal(self.init_std, self.init_trunc_abs)

        dense = lambda name: nn.Dense(
            self.h_size, kernel_init=tn, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name=name,
        )
        qq = dense("query")(x).reshape(b, n, self.n_heads, head_dim)
        kk = dense("key")(x).reshape(b, n, self.n_heads, head_dim)
        vv = dense("value")(x).reshape(b, n, self.n_heads, head_dim)

        def centroid_init(key, shape, dtype=jnp.float32):
            # torch.nn.init.uniform_(a=-0.5, b=0.5) (modeling_finetune.py:213-215)
            return jax.random.uniform(key, shape, dtype, -0.5, 0.5)

        centroid = self.param("centroid", centroid_init, (head_dim, self.n_centroids))

        kk_logits = jnp.einsum("bnhd,dc->bnhc", kk, centroid.astype(self.dtype))
        prob = attn_ops.gumbel_softmax_probs(
            kk_logits, self.make_rng("gumbel"), tau=tau, hard=True
        )
        sto_kk = jnp.einsum("bnhc,cd->bnhd", prob, centroid.T.astype(self.dtype))

        qh = jnp.moveaxis(qq, 1, 2)
        kh = jnp.moveaxis(sto_kk, 1, 2)
        vh = jnp.moveaxis(vv, 1, 2)

        interact = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        )
        weights = attn_ops.gumbel_softmax_probs(
            interact, self.make_rng("gumbel"), tau=tau, hard=True
        ).astype(self.dtype)
        weights = nn.Dropout(self.prob_attn, deterministic=deterministic)(weights)

        out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
        out = jnp.moveaxis(out, 1, 2).reshape(b, n, self.h_size)
        out = dense("proj")(out)
        out = nn.Dropout(self.prob_h, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block returning (x, fc_feature)
    (modeling_finetune.py:263-299). fc_feature is the post-MLP residual branch
    exposed for data2vec layer_results='fc' targets."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    window_size: Optional[Tuple[int, int]] = None
    attn_head_dim: Optional[int] = None
    variant: str = "softmax"
    sinkformer_eps: float = 1.0
    sinkformer_iters: int = 3
    dual_sto_n_centroids: int = 2
    layer_id: int = 1
    init_std: float = 0.02
    init_trunc_abs: float = 2.0
    layer_norm_eps: float = 1e-6
    use_flash: bool = True
    quant: str = "none"
    # token count for the flattened 2-D trunk layout (see Attention.seq_len)
    seq_len: Optional[int] = None
    # sequence-parallel mesh (see Attention.seq_mesh)
    seq_mesh: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        rel_pos_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ln = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps, name=name)
        if self.variant == "dual_sto":
            attn = DualStoSelfAttention(
                h_size=self.dim, n_heads=self.num_heads,
                prob_attn=self.attn_drop, prob_h=self.drop,
                n_centroids=self.dual_sto_n_centroids,
                init_std=self.init_std, init_trunc_abs=self.init_trunc_abs,
                dtype=self.dtype, name="attn",
            )
            if x.ndim == 2:
                # DualSto is 3-D only; bridge from the flattened trunk layout
                base_attn, n = attn, self.seq_len
                attn = lambda h, rpb, det: base_attn(
                    h.reshape(-1, n, h.shape[-1]), rpb, det
                ).reshape(h.shape)
        else:
            attn = Attention(
                dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                proj_drop=self.drop, window_size=self.window_size,
                attn_head_dim=self.attn_head_dim, variant=self.variant,
                sinkformer_eps=self.sinkformer_eps,
                sinkformer_iters=self.sinkformer_iters,
                layer_id=self.layer_id, init_std=self.init_std,
                init_trunc_abs=self.init_trunc_abs, use_flash=self.use_flash,
                quant=self.quant, seq_len=self.seq_len,
                seq_mesh=self.seq_mesh, dtype=self.dtype,
                name="attn",
            )
        mlp = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
            drop=self.drop, layer_id=self.layer_id, init_std=self.init_std,
            init_trunc_abs=self.init_trunc_abs, quant=self.quant,
            dtype=self.dtype, name="mlp",
        )

        def dp(h):
            rng = (
                self.make_rng("droppath")
                if (not deterministic and self.drop_path_rate > 0.0)
                else None
            )
            return drop_path(h, self.drop_path_rate, rng, deterministic,
                             seq_len=self.seq_len)

        if self.init_values is not None and self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (self.dim,)
            )
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (self.dim,)
            )
            if self.variant == "dual_sto":
                # DualSto has no foldable output Dense wrapper; keep the
                # reference's activation-side multiply (rare variant).
                attn_out = gamma_1.astype(self.dtype) * attn(
                    ln("norm1")(x).astype(self.dtype), rel_pos_bias, deterministic
                )
            else:
                # layer-scale folded into proj/fc2 weights (see
                # _ScaledOutDense): γ ⊙ (xW + b) = x(W·γ) + γ⊙b, and both
                # dropout and drop_path are diagonal maps, so the fold is
                # exact w.r.t. the reference's Block
                # (modeling_finetune.py:284-299).
                attn_out = attn(
                    ln("norm1")(x).astype(self.dtype), rel_pos_bias,
                    deterministic, out_scale=gamma_1,
                )
            x = x + dp(attn_out)
            fc_feature = dp(
                mlp(ln("norm2")(x).astype(self.dtype), deterministic,
                    out_scale=gamma_2)
            )
        else:
            attn_out = attn(
                ln("norm1")(x).astype(self.dtype), rel_pos_bias, deterministic
            )
            x = x + dp(attn_out)
            fc_feature = dp(mlp(ln("norm2")(x).astype(self.dtype), deterministic))
        x = x + fc_feature
        return x, fc_feature
