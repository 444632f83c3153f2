"""Checkpoint tests: Orbax save/auto-resume round trip, torch importer with
logit parity against a torch-exported reference state, and interpolation."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import ViTConfig
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.utils import checkpoint as C
from uncertainty_vit_tpu.utils.logging import JsonlLogger, MetricLogger, SmoothedValue

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
    num_classes=5, use_shared_rel_pos_bias=True, init_values=0.1,
    has_masking=True, use_flash_attention=False,
)


def test_orbax_roundtrip_and_auto_resume(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    C.save_checkpoint(str(tmp_path), 0, state)
    C.save_checkpoint(str(tmp_path), 3, state)
    found = C.latest_checkpoint(str(tmp_path))
    assert found is not None and found[0] == 3

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, next_epoch = C.auto_load(str(tmp_path), template)
    assert next_epoch == 4
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))

    # empty dir → template unchanged, epoch 0
    same, e0 = C.auto_load(str(tmp_path / "nope"), template)
    assert e0 == 0


def test_torch_import_roundtrip_logit_parity():
    """Export our params to a torch-layout state_dict, re-import, and check
    identical logits — validates every name mapping and transpose."""
    model = VisionTransformer(cfg=TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    sd = C.export_torch_state_dict(params)
    assert "blocks.0.attn.qkv.weight" in sd
    assert sd["blocks.0.attn.qkv.weight"].shape == (48, 16)  # [3A, C] torch layout
    assert "patch_embed.proj.weight" in sd
    assert sd["patch_embed.proj.weight"].shape == (16, 3, 16, 16)  # OIHW

    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    imported, missing, unused = C.import_torch_params(sd, template)
    assert not missing, missing
    assert not unused, unused

    out_a = model.apply({"params": params}, x)
    out_b = model.apply({"params": imported}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)


def test_import_drops_mismatched_head():
    model5 = VisionTransformer(cfg=TINY)
    model7 = VisionTransformer(cfg=TINY.replace(num_classes=7))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    sd = C.export_torch_state_dict(model5.init(jax.random.PRNGKey(0), x)["params"])
    template = model7.init(jax.random.PRNGKey(2), x)["params"]
    imported, missing, _ = C.import_torch_params(sd, template)
    assert any("head" in m for m in missing)
    # head kept at template init
    np.testing.assert_array_equal(
        np.asarray(imported["head"]["kernel"]), np.asarray(template["head"]["kernel"])
    )


def test_pos_embed_interpolation():
    pos = np.random.RandomState(0).randn(1, 1 + 4 * 4, 8).astype(np.float32)
    out = C.interpolate_pos_embed(pos, dst_num_patches=49)
    assert out.shape == (1, 50, 8)
    np.testing.assert_allclose(out[:, 0], pos[:, 0])  # cls passthrough

    same = C.interpolate_pos_embed(pos, dst_num_patches=16)
    np.testing.assert_allclose(same, pos)


@pytest.mark.parametrize("src,dst", [(14, 24), (14, 32), (24, 14)])
def test_pos_embed_interpolation_matches_torch_bicubic(src, dst):
    """Value-level parity with the reference surgery
    (run_class_finetuning.py:496-518): F.interpolate(mode='bicubic',
    align_corners=False) on the patch grid, cls slot untouched. Real
    ViT-B shapes: 224→384 (14→24), 224→512 (14→32), and the 384→224
    downscale (torch default antialias=False, same 4-tap formula)."""
    import torch

    emb = 16
    pos = np.random.RandomState(src + dst).randn(1, 1 + src * src, emb)
    pos = pos.astype(np.float32)

    got = C.interpolate_pos_embed(pos, dst_num_patches=dst * dst)

    grid = torch.tensor(pos[:, 1:]).reshape(1, src, src, emb).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        grid, size=(dst, dst), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, dst * dst, emb).numpy()

    np.testing.assert_allclose(got[:, 0], pos[:, 0])
    # torch computes in f32, ours in f64 — tolerance covers that gap
    np.testing.assert_allclose(got[:, 1:], want, rtol=1e-4, atol=1e-5)


def test_rel_pos_table_interpolation():
    src_size, heads = 7, 3  # 4x4 grid → (2*4-1)=7
    table = np.random.RandomState(0).randn(src_size * src_size + 3, heads).astype(np.float32)
    dst_size = 13  # 7x7 grid
    out = C.interpolate_rel_pos_table(table, dst_size * dst_size + 3)
    assert out.shape == (dst_size * dst_size + 3, heads)
    # cls slots pass through
    np.testing.assert_allclose(out[-3:], table[-3:])
    assert np.isfinite(out).all()


def _reference_rel_pos_resize(table, dst_num_pos):
    """Independent re-derivation of run_class_finetuning.py:433-494: bisect
    the geometric-progression ratio q so sum_{i<src//2} q^i reaches
    dst_size//2, lay source coords at the cumulative-GP positions (mirrored,
    0-centered), targets on the integer grid, then per-head bicubic spline.
    interp2d(kind='cubic') is gone from scipy; this oracle evaluates through
    FITPACK bisplrep/bisplev (scipy's documented bug-for-bug replacement), a
    different code path from the RectBivariateSpline our importer uses."""
    from scipy import interpolate

    src_num_pos, num_heads = table.shape
    src_size = int((src_num_pos - 3) ** 0.5)
    dst_size = int((dst_num_pos - 3) ** 0.5)
    extra, body = table[-3:], table[:-3]

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        if (1.0 - q ** (src_size // 2)) / (1.0 - q) > dst_size // 2:
            right = q
        else:
            left = q
    dis, cur = [], 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    x = np.array([-v for v in reversed(dis)] + [0] + dis)
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)

    heads = []
    for i in range(num_heads):
        z = body[:, i].reshape(src_size, src_size).astype(np.float64)
        xx, yy = np.meshgrid(x, x, indexing="ij")
        tck = interpolate.bisplrep(xx.ravel(), yy.ravel(), z.ravel(),
                                   kx=3, ky=3, s=0)
        heads.append(interpolate.bisplev(dx, dx, tck).reshape(-1, 1))
    new_body = np.concatenate(heads, axis=-1).astype(table.dtype)
    return np.concatenate([new_body, extra], axis=0)


@pytest.mark.parametrize("src_grid,dst_grid", [(14, 24), (14, 32)])
def test_rel_pos_table_interpolation_matches_reference_scheme(src_grid, dst_grid):
    """Numerical parity for the geometric-progression rel-pos resize on the
    real cross-resolution shapes: ViT-B 224→384 maps the (2·14−1)²=27² table
    onto 47², 224→512 onto 63². Smooth tables (the trained-table regime —
    rel-pos biases decay smoothly with distance) must agree to spline-fit
    precision; the oracle re-derives the reference's coordinate solve and
    evaluates through FITPACK bisplrep, not our RectBivariateSpline."""
    src_size, dst_size = 2 * src_grid - 1, 2 * dst_grid - 1
    heads = 4
    # smooth synthetic bias: per-head radial decay + anisotropic ripple
    ii = np.arange(src_size) - src_size // 2
    xx, yy = np.meshgrid(ii, ii, indexing="ij")
    maps = []
    for h in range(heads):
        r2 = (xx / src_size) ** 2 + ((h + 1) / heads) * (yy / src_size) ** 2
        maps.append(np.exp(-4.0 * r2) + 0.1 * np.sin(2.0 * xx / src_size + h))
    body = np.stack([m.ravel() for m in maps], axis=-1)
    table = np.concatenate([body, np.random.RandomState(7).randn(3, heads)],
                           axis=0).astype(np.float32)

    got = C.interpolate_rel_pos_table(table, dst_size * dst_size + 3)
    want = _reference_rel_pos_resize(table, dst_size * dst_size + 3)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[-3:], table[-3:])
    # RectBivariateSpline and bisplrep agree to FITPACK fit tolerance on
    # the interior; both reproduce the reference geometry exactly
    np.testing.assert_allclose(got[:-3], want[:-3], rtol=5e-4, atol=5e-5)


def test_shared_to_per_block_expansion():
    shared = VisionTransformer(cfg=TINY)
    per_block = VisionTransformer(
        cfg=TINY.replace(use_shared_rel_pos_bias=False, use_rel_pos_bias=True)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    sd = C.export_torch_state_dict(shared.init(jax.random.PRNGKey(0), x)["params"])
    template = per_block.init(jax.random.PRNGKey(2), x)["params"]
    imported, missing, _ = C.import_torch_params(sd, template)
    t0 = np.asarray(imported["backbone"]["blocks_0"]["attn"]["relative_position_bias_table"])
    t1 = np.asarray(imported["backbone"]["blocks_1"]["attn"]["relative_position_bias_table"])
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(t0, sd["rel_pos_bias.relative_position_bias_table"])


def test_loggers(tmp_path):
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.global_avg == 2.5 and sv.median == 3.0 and sv.value == 4.0

    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    ml.update(loss=3.0, acc=0.7)
    s = ml.epoch_summary()
    np.testing.assert_allclose(s["loss"], 2.0)
    consumed = list(ml.log_every(range(5), print_freq=10, header="t"))
    assert consumed == list(range(5))

    jl = JsonlLogger(str(tmp_path))
    jl.write({"epoch": 0, "loss": np.float32(1.5)})
    import json
    rec = json.loads(open(jl.path).read().strip())
    assert rec == {"epoch": 0, "loss": 1.5}
