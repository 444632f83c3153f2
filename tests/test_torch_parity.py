"""Numerical parity tests against torch implementations of the reference math.

The reference repo has no test suite (SURVEY.md §4); these tests rebuild its
documented attention/block/ViT semantics (modeling_finetune.py:85-523) inline
in torch on CPU and check our flax modules produce the same outputs when
loaded with identical weights. This validates, among others:
  - the fused-qkv / no-key-bias layout (modeling_finetune.py:149)
  - exact (erf) GELU, LayerNorm eps=1e-6
  - rel-pos bias table indexing (shared + per-block)
  - pre-norm residual wiring with layer scale
  - NHWC/HWIO conv patch embed vs torch NCHW/OIHW
  - mean-pooling fc_norm head
  - sinkformer Sinkhorn normalization (sinkhorn.py:17-67)
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.layers import Attention, Block
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.ops import relpos
from uncertainty_vit_tpu.ops.attention import sinkhorn_probs

RTOL, ATOL = 1e-4, 1e-5


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def torch_attention_forward(x, params, num_heads, scale, rel_bias=None, table=None, index=None):
    """Reference Attention.forward math (modeling_finetune.py:145-188)."""
    qkv_w = t(params["qkv_kernel"]).T  # torch layout [3A, C]
    q_bias, v_bias = t(params["q_bias"]), t(params["v_bias"])
    qkv_bias = torch.cat((q_bias, torch.zeros_like(v_bias), v_bias))
    B, N, C = x.shape
    qkv = F.linear(x, qkv_w, qkv_bias).reshape(B, N, 3, num_heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * scale) @ k.transpose(-2, -1)
    if table is not None:
        local = t(table)[t(index).long().view(-1)].view(N, N, -1).permute(2, 0, 1)
        attn = attn + local.unsqueeze(0)
    if rel_bias is not None:
        attn = attn + t(rel_bias)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, -1)
    return F.linear(out, t(params["proj"]["kernel"]).T, t(params["proj"]["bias"]))


def torch_mlp_forward(x, params):
    h = F.linear(x, t(params["fc1"]["kernel"]).T, t(params["fc1"]["bias"]))
    h = F.gelu(h)  # exact erf GELU, torch nn.GELU default
    return F.linear(h, t(params["fc2"]["kernel"]).T, t(params["fc2"]["bias"]))


def torch_block_forward(x, params, num_heads, scale, eps=1e-6, rel_bias=None, gamma=False):
    ln1 = F.layer_norm(x, x.shape[-1:], t(params["norm1"]["scale"]), t(params["norm1"]["bias"]), eps)
    a = torch_attention_forward(ln1, params["attn"], num_heads, scale, rel_bias=rel_bias)
    if gamma:
        a = t(params["gamma_1"]) * a
    x = x + a
    ln2 = F.layer_norm(x, x.shape[-1:], t(params["norm2"]["scale"]), t(params["norm2"]["bias"]), eps)
    m = torch_mlp_forward(ln2, params["mlp"])
    if gamma:
        m = t(params["gamma_2"]) * m
    return x + m


def test_relative_position_index_matches_torch_construction():
    h = w = 3
    coords = torch.stack(torch.meshgrid([torch.arange(h), torch.arange(w)], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    nrd = (2 * h - 1) * (2 * w - 1) + 3
    idx = torch.zeros((h * w + 1,) * 2, dtype=rel.dtype)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = nrd - 3
    idx[0:, 0] = nrd - 2
    idx[0, 0] = nrd - 1
    np.testing.assert_array_equal(relpos.relative_position_index((h, w)), idx.numpy())


@pytest.mark.parametrize("use_table", [False, True])
def test_attention_parity(use_table):
    dim, heads, n, b = 16, 2, 10, 3
    window = (3, 3)  # N = 9 + 1 cls
    mod = Attention(
        dim=dim, num_heads=heads, qkv_bias=True,
        window_size=window if use_table else None, use_flash=False,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, dim))
    shared_bias = jax.random.normal(jax.random.PRNGKey(2), (heads, n, n)) * 0.1
    params = mod.init(rng, x, shared_bias)["params"]
    p = jax.tree_util.tree_map(np.asarray, params)
    if use_table:
        p["relative_position_bias_table"] = np.asarray(
            jax.random.normal(jax.random.PRNGKey(3), p["relative_position_bias_table"].shape) * 0.05
        )
        params = jax.tree_util.tree_map(jnp.asarray, p)

    ours = mod.apply({"params": params}, x, shared_bias)
    scale = (dim // heads) ** -0.5
    theirs = torch_attention_forward(
        t(x), p, heads, scale, rel_bias=np.asarray(shared_bias),
        table=p.get("relative_position_bias_table"),
        index=relpos.relative_position_index(window) if use_table else None,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("gamma", [False, True])
def test_block_parity(gamma):
    dim, heads, n, b = 16, 2, 5, 2
    mod = Block(
        dim=dim, num_heads=heads, init_values=0.1 if gamma else None,
        layer_id=3, use_flash=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, dim))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    p = jax.tree_util.tree_map(np.asarray, params)

    ours, fc = mod.apply({"params": params}, x)
    scale = (dim // heads) ** -0.5
    theirs = torch_block_forward(t(x), p, heads, scale, gamma=gamma)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=RTOL, atol=ATOL)

    # fc_feature is the post-MLP residual branch: x_out == x_mid + fc_feature,
    # where x_mid is the post-attention residual (modeling_finetune.py:290-299).
    xt = t(x)
    ln1 = F.layer_norm(xt, xt.shape[-1:], t(p["norm1"]["scale"]), t(p["norm1"]["bias"]), 1e-6)
    a = torch_attention_forward(ln1, p["attn"], heads, scale)
    if gamma:
        a = t(p["gamma_1"]) * a
    x_mid = xt + a
    np.testing.assert_allclose(
        np.asarray(fc), (theirs - x_mid).numpy(), rtol=RTOL, atol=1e-4
    )


@pytest.mark.parametrize("full_size", [False, True], ids=["tiny", "beit_base_224"])
def test_full_vit_parity(full_size):
    """Full ViT forward: conv patchify → blocks → mean-pool fc_norm → head.

    Runs both a tiny config and the REAL beit_base_patch16_224 preset
    (depth 12, embed 768, N=197, shared rel-pos — the reference's flagship
    finetune model, modeling_finetune.py:1221-1229) so layout/precision
    divergences that only appear at production scale are caught."""
    if full_size:
        from uncertainty_vit_tpu.core.config import get_preset

        cfg = get_preset(
            "beit_base_patch16_224", num_classes=10,
            use_shared_rel_pos_bias=True, use_abs_pos_emb=True,
        ).replace(use_flash_attention=False)
        images = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    else:
        cfg = ViTConfig(
            img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
            num_classes=7, use_shared_rel_pos_bias=True, use_flash_attention=False,
        )
        images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    model = VisionTransformer(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), images)["params"]
    p = jax.tree_util.tree_map(np.asarray, params)
    ours = np.asarray(model.apply({"params": params}, images))

    # torch forward of the same math
    x = t(images).permute(0, 3, 1, 2)  # NHWC → NCHW
    conv_w = t(p["backbone"]["patch_embed"]["proj"]["kernel"]).permute(3, 2, 0, 1)
    conv_b = t(p["backbone"]["patch_embed"]["proj"]["bias"])
    feat = F.conv2d(x, conv_w, conv_b, stride=16)
    feat = feat.flatten(2).transpose(1, 2)  # [B, N, C]
    cls = t(p["backbone"]["cls_token"]).expand(feat.shape[0], -1, -1)
    xtok = torch.cat([cls, feat], dim=1) + t(p["backbone"]["pos_embed"])

    n = xtok.shape[1]
    table = p["backbone"]["rel_pos_bias"]["relative_position_bias_table"]
    index = relpos.relative_position_index(cfg.grid_size)
    shared = t(table)[t(index).long().view(-1)].view(n, n, -1).permute(2, 0, 1).numpy()

    scale = cfg.head_dim**-0.5
    for i in range(cfg.depth):
        xtok = torch_block_forward(xtok, p["backbone"][f"blocks_{i}"], cfg.num_heads, scale, rel_bias=shared)

    pooled = xtok[:, 1:, :].mean(1)
    pooled = F.layer_norm(pooled, pooled.shape[-1:], t(p["fc_norm"]["scale"]), t(p["fc_norm"]["bias"]), 1e-6)
    logits = F.linear(pooled, t(p["head"]["kernel"]).T, t(p["head"]["bias"]))
    np.testing.assert_allclose(ours, logits.numpy(), rtol=1e-3, atol=1e-4)


def test_sinkhorn_parity():
    """sinkhorn_probs vs the reference's log-domain Sinkhorn (sinkhorn.py:17-67)."""
    scores = np.random.RandomState(0).randn(4, 6, 6).astype(np.float32)
    eps_, iters = 1.0, 3

    C = -torch.from_numpy(scores)
    bsz, xp, yp = C.shape
    mu = torch.full((bsz, xp), 1.0 / xp)
    nu = torch.full((bsz, yp), 1.0 / yp)
    u, v = torch.zeros_like(mu), torch.zeros_like(nu)

    def M(C, u, v):
        return (-C + u.unsqueeze(-1) + v.unsqueeze(-2)) / eps_

    for i in range(iters):
        if i % 2 == 0:
            u = eps_ * (torch.log(mu) - torch.logsumexp(M(C, u, v), dim=-1)) + u
        else:
            v = eps_ * (torch.log(nu) - torch.logsumexp(M(C, u, v).transpose(-2, -1), dim=-1)) + v
    pi = torch.exp(M(C, u, v)) * yp

    ours = sinkhorn_probs(jnp.asarray(scores), eps=eps_, max_iter=iters)
    np.testing.assert_allclose(np.asarray(ours), pi.numpy(), rtol=1e-4, atol=1e-5)


def test_dist_attention_parity():
    """DistAttention vs the reference's Wasserstein-kernel attention math
    (modeling_finetune_dist.py:61-179): shared qkv weights between the mean
    and cov streams (cov_qkv exists but its weight is unused, :127), ELU+1
    cov rectification, q·scale, sigmoid(−W₂) logits + shared rel-pos bias,
    softmax, mean = attn·v, cov = attn²·cov_v, separate projections."""
    from uncertainty_vit_tpu.models.dist_vit import DistAttention

    b, n, c, heads = 2, 9, 16, 2
    hd = c // heads
    scale = hd**-0.5
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c))
    cov_x = jax.random.normal(jax.random.PRNGKey(1), (b, n, c)) * 0.5
    bias = jax.random.normal(jax.random.PRNGKey(2), (heads, n, n)) * 0.1

    model = DistAttention(dim=c, num_heads=heads)
    params = model.init(jax.random.PRNGKey(3), x, cov_x, bias)["params"]
    # nonzero biases so the separate-bias path is actually exercised
    for i, name in enumerate(("q_bias", "v_bias", "cov_q_bias", "cov_v_bias")):
        params[name] = jax.random.normal(jax.random.PRNGKey(10 + i), (c,)) * 0.2
    ours_mean, ours_cov = model.apply({"params": params}, x, cov_x, bias)

    p = jax.tree_util.tree_map(np.asarray, params)
    W = t(p["qkv_kernel"]).T  # torch layout [3C, C]
    qkv_b = torch.cat((t(p["q_bias"]), torch.zeros(c), t(p["v_bias"])))
    cov_b = torch.cat((t(p["cov_q_bias"]), torch.zeros(c), t(p["cov_v_bias"])))

    def heads_split(z):
        return z.reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)

    qkv = heads_split(F.linear(t(x), W, qkv_b))
    q, k, v = qkv[0], qkv[1], qkv[2]
    cov_qkv = heads_split(torch.nn.functional.elu(F.linear(t(cov_x), W, cov_b)) + 1)
    cov_q, cov_k, cov_v = cov_qkv[0], cov_qkv[1], cov_qkv[2]

    def wdm(m1, c1, m2, c2):
        m1, m2 = torch.sigmoid(m1), torch.sigmoid(m2)
        c1, c2 = torch.sigmoid(c1), torch.sigmoid(c2)
        ret = (m1**2).sum(-1, keepdim=True) + (m2**2).sum(-1, keepdim=True).transpose(-1, -2) \
            - 2 * m1 @ m2.transpose(-1, -2)
        s1 = torch.sqrt(torch.clamp(c1, min=1e-24))
        s2 = torch.sqrt(torch.clamp(c2, min=1e-24))
        return ret + c1.sum(-1, keepdim=True) + c2.sum(-1, keepdim=True).transpose(-1, -2) \
            - 2 * s1 @ s2.transpose(-1, -2)

    attn = torch.sigmoid(-wdm(q * scale, cov_q, k, cov_k) + 1e-24)
    attn = (attn + t(bias)).softmax(dim=-1)
    mean_ctx = (attn @ v).transpose(1, 2).reshape(b, n, -1)
    cov_ctx = (attn**2 @ cov_v).transpose(1, 2).reshape(b, n, -1)
    ref_mean = F.linear(mean_ctx, t(p["proj"]["kernel"]).T, t(p["proj"]["bias"]))
    ref_cov = F.linear(cov_ctx, t(p["cov_proj"]["kernel"]).T, t(p["cov_proj"]["bias"]))

    np.testing.assert_allclose(np.asarray(ours_mean), ref_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_cov), ref_cov.numpy(), rtol=1e-4, atol=1e-5)
