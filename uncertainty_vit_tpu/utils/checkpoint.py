"""Checkpointing: Orbax save/auto-resume + torch .pth importer.

Replaces utils.py:462-545 (save_model / auto_load_model) with Orbax pytree
checkpoints (`checkpoint-{n}/`, scan-highest auto-resume, best-tag), and
reproduces the reference's checkpoint surgery for importing torch weights
(run_class_finetuning.py:400-540): model|module key probing, head drop on
shape mismatch, shared→per-block rel-pos expansion, geometric-progression
rel-pos-table interpolation, bicubic pos-embed interpolation.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax save / resume
# ---------------------------------------------------------------------------

def _ckpt_path(output_dir: str, tag) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{tag}")


def save_checkpoint(output_dir: str, tag, state: Any) -> str:
    """Save a pytree state under output_dir/checkpoint-{tag} (epoch number or
    'best', like utils.py:462-484)."""
    import orbax.checkpoint as ocp

    path = _ckpt_path(output_dir, tag)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(output_dir: str) -> Optional[Tuple[int, str]]:
    """Highest checkpoint-N in output_dir (utils.py:493-503 auto-resume scan)."""
    if not os.path.isdir(output_dir):
        return None
    best = None
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, os.path.join(output_dir, name))
    return best


def restore_checkpoint(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def auto_load(output_dir: str, target: Any) -> Tuple[Any, int]:
    """Resume from the highest checkpoint; returns (state, next_epoch)."""
    found = latest_checkpoint(output_dir)
    if found is None:
        return target, 0
    epoch, path = found
    return restore_checkpoint(path, target), epoch + 1


# ---------------------------------------------------------------------------
# torch .pth importer
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth and return numpy tensors, probing the
    model|module containers (run_class_finetuning.py:400-406)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "module"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def _torch_key_for(path: Tuple[str, ...]) -> Optional[Tuple[str, str]]:
    """Map our param path → (reference state_dict key, transform).

    transform ∈ {'linear_w' (transpose [out,in]→[in,out]),
    'conv_w' (OIHW→HWIO), 'id'}.
    """
    parts = [p for p in path if p != "backbone"]
    name = parts[-1]

    def block_prefix(i: int) -> str:
        return f"blocks.{i}."

    # top-level tokens
    simple = {
        "cls_token": "cls_token", "mask_token": "mask_token",
        "pos_embed": "pos_embed", "cov_cls_token": "cov_cls_token",
        "cov_mask_token": "cov_mask_token",
        "layer_log_weights": "layer_log_weights",
    }
    if len(parts) == 1 and name in simple:
        return simple[name], "id"

    if parts[0] in ("patch_embed", "cov_patch_embed"):
        if name == "kernel":
            return f"{parts[0]}.proj.weight", "conv_w"
        return f"{parts[0]}.proj.bias", "id"

    if parts[0] == "rel_pos_bias":
        return "rel_pos_bias.relative_position_bias_table", "id"

    m = re.fullmatch(r"blocks_(\d+)", parts[0]) if parts else None
    if m:
        i = int(m.group(1))
        rest = parts[1:]
        pre = block_prefix(i)
        if rest[0] in ("norm1", "norm2"):
            tname = "weight" if rest[1] == "scale" else "bias"
            return pre + f"{rest[0]}.{tname}", "id"
        if rest[0] == "attn":
            a = rest[1]
            if a == "qkv_kernel":
                return pre + "attn.qkv.weight", "linear_w"
            if a == "cov_qkv_kernel":
                return pre + "attn.cov_qkv.weight", "linear_w"
            if a in ("q_bias", "v_bias", "cov_q_bias", "cov_v_bias"):
                return pre + f"attn.{a}", "id"
            if a == "relative_position_bias_table":
                return pre + "attn.relative_position_bias_table", "id"
            if a in ("proj", "cov_proj", "query", "key", "value"):
                tname = "weight" if rest[2] == "kernel" else "bias"
                tf = "linear_w" if rest[2] == "kernel" else "id"
                return pre + f"attn.{a}.{tname}", tf
            if a == "centroid":
                return pre + "attn.centroid", "id"
        if rest[0] == "mlp":
            fc = rest[1]
            tname = "weight" if rest[2] == "kernel" else "bias"
            tf = "linear_w" if rest[2] == "kernel" else "id"
            return pre + f"mlp.{fc}.{tname}", tf
        if rest[0] in ("gamma_1", "gamma_2"):
            return pre + rest[0], "id"
        return None

    if parts[0] == "fc_norm_sn":
        # --sngp replaces fc_norm with spectral_norm(BertLinear)
        # (modeling_finetune.py:413-414; sngp.py:43-98): the torch hook
        # stores the unnormalized weight as fc_norm.weight_orig — sigma is
        # recomputed from the (weight_u, weight_v) buffers at forward, see
        # import_torch_spectral_stats
        if name == "kernel":
            return "fc_norm.weight_orig", "linear_w"
        return "fc_norm.bias", "id"

    # heads / norms
    dense_like = {
        "head": "head", "lm_head": "lm_head", "cov_lm_head": "cov_lm_head",
        "beit_head": "beit_head", "lm_head_fc1": "lm_head.0",
        "lm_head_fc2": "lm_head.2",
    }
    if parts[0] in dense_like:
        tname = "weight" if name == "kernel" else "bias"
        tf = "linear_w" if name == "kernel" else "id"
        return f"{dense_like[parts[0]]}.{tname}", tf
    if parts[0] in ("norm", "fc_norm"):
        tname = "weight" if name == "scale" else "bias"
        return f"{parts[0]}.{tname}", "id"
    return None


def _apply_transform(value: np.ndarray, transform: str) -> np.ndarray:
    if transform == "linear_w":
        return value.T
    if transform == "conv_w":
        return value.transpose(2, 3, 1, 0)  # OIHW → HWIO
    return value


def _torch_bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out_size, in_size) matrix reproducing
    torch.nn.functional.interpolate(mode='bicubic', align_corners=False,
    antialias=False) along one axis: half-pixel source centers, 4-tap cubic
    convolution with A=-0.75 (torch/OpenCV convention — NOT the Keys A=-0.5
    that jax.image.resize uses), border-clamped taps."""
    a = -0.75

    def kernel(x):
        ax = np.abs(x)
        return np.where(
            ax <= 1.0,
            ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
            np.where(ax < 2.0, a * (((ax - 5.0) * ax + 8.0) * ax - 4.0), 0.0),
        )

    scale = in_size / out_size
    i = np.arange(out_size)
    center = (i + 0.5) * scale - 0.5
    i0 = np.floor(center).astype(np.int64)
    t = center - i0
    w_mat = np.zeros((out_size, in_size), np.float64)
    for k in range(-1, 3):
        w = kernel(k - t)
        idx = np.clip(i0 + k, 0, in_size - 1)
        np.add.at(w_mat, (i, idx), w)
    return w_mat


def interpolate_pos_embed(pos: np.ndarray, dst_num_patches: int) -> np.ndarray:
    """Bicubic abs-pos-embed interpolation (run_class_finetuning.py:496-518):
    the cls slot passes through; the patch grid is resized with the exact
    torch bicubic semantics (A=-0.75, align_corners=False) the reference's
    F.interpolate call uses — value-parity-tested against torch in
    tests/test_checkpoint.py."""
    num_extra = pos.shape[1] - int(round((pos.shape[1] - 1) ** 0.5)) ** 2
    src_size = int(round((pos.shape[1] - num_extra) ** 0.5))
    dst_size = int(round(dst_num_patches**0.5))
    if src_size == dst_size:
        return pos
    extra = pos[:, :num_extra]
    grid = pos[:, num_extra:].reshape(src_size, src_size, -1).astype(np.float64)
    w = _torch_bicubic_weights(src_size, dst_size)
    resized = np.einsum("yh,hwc,xw->yxc", w, grid, w)
    resized = resized.reshape(1, dst_size * dst_size, -1).astype(pos.dtype)
    return np.concatenate([extra, resized], axis=1)


def interpolate_rel_pos_table(table: np.ndarray, dst_num_pos: int) -> np.ndarray:
    """Geometric-progression rel-pos-table resize
    (run_class_finetuning.py:433-494): source coordinates are laid out with
    geometrically increasing spacing, targets on the integer grid, cubic
    spline per head. scipy.interpolate.interp2d is gone in scipy≥1.13; the
    equivalent RectBivariateSpline(kx=3, ky=3) is used."""
    from scipy import interpolate

    src_num_pos, num_heads = table.shape
    num_extra = 3
    src_size = int((src_num_pos - num_extra) ** 0.5)
    dst_size = int((dst_num_pos - num_extra) ** 0.5)
    if src_size == dst_size:
        return table

    extra = table[-num_extra:, :]
    body = table[:-num_extra, :]

    def gp_sum(a, r, n):
        return a * (1.0 - r**n) / (1.0 - r)

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        if gp_sum(1, q, src_size // 2) > dst_size // 2:
            right = q
        else:
            left = q

    dis, cur = [], 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    x = np.array(r_ids + [0] + dis)
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)

    heads = []
    for i in range(num_heads):
        z = body[:, i].reshape(src_size, src_size).astype(np.float64)
        f = interpolate.RectBivariateSpline(x, x, z, kx=3, ky=3)
        heads.append(f(dx, dx).reshape(-1, 1))
    new_body = np.concatenate(heads, axis=-1).astype(table.dtype)
    return np.concatenate([new_body, extra], axis=0)


def import_torch_params(
    state_dict: Dict[str, np.ndarray],
    params_template: Any,
    expand_shared_rel_pos: bool = True,
    keep_mismatched_head: bool = False,
) -> Tuple[Any, List[str], List[str]]:
    """Fill our param tree from a reference state_dict.

    Returns (params, missing_paths, unused_torch_keys). Reproduces the
    surgery rules: head dropped on shape mismatch (:409-412), shared rel-pos
    table expanded to per-block tables when the target has them (:419-426),
    pos-embed and rel-pos tables interpolated across resolutions,
    relative_position_index entries ignored (utils.py:315-361).
    """
    sd = dict(state_dict)
    sd = {k: v for k, v in sd.items() if "relative_position_index" not in k}

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    treedef = jax.tree_util.tree_structure(params_template)
    out_leaves = []
    missing: List[str] = []
    used = set()

    for path, leaf in flat:
        keypath = tuple(str(getattr(p, "key", p)) for p in path)
        mapping = _torch_key_for(keypath)
        value = None
        if mapping is not None:
            tkey, tf = mapping
            if tkey not in sd and expand_shared_rel_pos and tkey.endswith(
                "relative_position_bias_table"
            ) and tkey.startswith("blocks."):
                # shared→per-block expansion (run_class_finetuning.py:419-426)
                if "rel_pos_bias.relative_position_bias_table" in sd:
                    tkey = "rel_pos_bias.relative_position_bias_table"
            if tkey in sd:
                value = _apply_transform(sd[tkey], tf)
                used.add(tkey)
                name = keypath[-1]
                if name == "pos_embed" and value.shape != leaf.shape:
                    value = interpolate_pos_embed(value, leaf.shape[1] - 1)
                if name == "relative_position_bias_table" and value.shape != leaf.shape:
                    value = interpolate_rel_pos_table(value, leaf.shape[0])
                if value.shape != leaf.shape:
                    # e.g. class-count mismatch: drop and keep init
                    # (:409-412); --dual_finetune (:408) keeps the head
                    # verbatim, which then fails loudly here instead
                    if keep_mismatched_head:
                        raise ValueError(
                            f"--dual_finetune: checkpoint {tkey} shape "
                            f"{value.shape} != model {leaf.shape}"
                        )
                    value = None
        if value is None:
            missing.append("/".join(keypath))
            out_leaves.append(leaf)
        else:
            out_leaves.append(jnp.asarray(value, dtype=leaf.dtype))

    params = jax.tree_util.tree_unflatten(treedef, out_leaves)
    unused = [k for k in sd if k not in used]
    return params, missing, unused


def import_torch_spectral_stats(
    state_dict: Dict[str, np.ndarray], stats_template: Any
) -> Tuple[Any, bool]:
    """Fill the 'spectral_stats' collection (power-iteration u/v of
    models.heads.SpectralNormDense) from a reference --sngp checkpoint's
    fc_norm.weight_u / fc_norm.weight_v buffers (sngp.py:43-98: eval-mode
    sigma = u·(W v) uses the STORED vectors — importing weight_orig without
    them would normalize by a sigma estimated from freshly-initialized
    vectors). Returns (stats, found): found=False when the checkpoint has no
    spectral buffers (template returned unchanged)."""
    names = {"u": "fc_norm.weight_u", "v": "fc_norm.weight_v"}
    if not any(k in state_dict for k in names.values()):
        return stats_template, False

    flat = jax.tree_util.tree_flatten_with_path(stats_template)[0]
    treedef = jax.tree_util.tree_structure(stats_template)
    out = []
    for path, leaf in flat:
        keypath = tuple(str(getattr(p, "key", p)) for p in path)
        tkey = names.get(keypath[-1]) if "fc_norm_sn" in keypath else None
        if tkey and tkey in state_dict and np.shape(state_dict[tkey]) == leaf.shape:
            out.append(jnp.asarray(state_dict[tkey], dtype=leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out), True


def _dvae_torch_key_for(path: Tuple[str, ...], num_layers: int) -> Optional[Tuple[str, str]]:
    """Map DiscreteVAE param paths → reference state_dict keys
    (modeling_discrete_vae.py:104-122 Sequential layout):
      encoder.{2i}.0   strided Conv2d   ← enc_conv_{i}
      encoder.{2i+1}.net.{0,2,4} ResBlock convs ← enc_res_{i}.conv{1,2,3}
      encoder.{2L}     1×1 head         ← enc_head
      decoder mirrors with ConvTranspose2d at even slots ← dec_conv_{i}
      codebook.weight  ← codebook.embedding
    transforms: 'conv_w' OIHW→HWIO, 'deconv_w' torch ConvTranspose
    [in,out,kh,kw] → flipped HWIO (see models/dvae.TorchConvTranspose), 'id'.
    """
    name = path[-1]
    if path[0] == "codebook":
        return "codebook.weight", "id"

    res_conv = {"conv1": 0, "conv2": 2, "conv3": 4}

    for side, prefix in (("enc", "encoder"), ("dec", "decoder")):
        m = re.fullmatch(rf"{side}_conv_(\d+)", path[0])
        if m:
            i = int(m.group(1))
            tname = "weight" if name == "kernel" else "bias"
            tf = "id"
            if name == "kernel":
                tf = "conv_w" if side == "enc" else "deconv_w"
            return f"{prefix}.{2 * i}.0.{tname}", tf
        m = re.fullmatch(rf"{side}_res_(\d+)", path[0])
        if m:
            i = int(m.group(1))
            slot = res_conv[path[1]]
            tname = "weight" if name == "kernel" else "bias"
            tf = "conv_w" if name == "kernel" else "id"
            return f"{prefix}.{2 * i + 1}.net.{slot}.{tname}", tf
        if path[0] == f"{side}_head":
            tname = "weight" if name == "kernel" else "bias"
            tf = "conv_w" if name == "kernel" else "id"
            return f"{prefix}.{2 * num_layers}.{tname}", tf
    return None


def import_dvae_torch_params(
    state_dict: Dict[str, np.ndarray], params_template: Any, num_layers: int = 3
) -> Tuple[Any, List[str], List[str]]:
    """Fill a DiscreteVAE param tree from a reference/OpenAI torch state_dict
    (the `Dalle_VAE` load path, modeling_discrete_vae.py:203-225 /
    utils.py:548-560). Returns (params, missing_paths, unused_keys)."""
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    treedef = jax.tree_util.tree_structure(params_template)
    out_leaves, missing, used = [], [], set()

    for path, leaf in flat:
        keypath = tuple(str(getattr(p, "key", p)) for p in path)
        mapping = _dvae_torch_key_for(keypath, num_layers)
        value = None
        if mapping is not None:
            tkey, tf = mapping
            if tkey in state_dict:
                v = np.asarray(state_dict[tkey])
                if tf == "conv_w":
                    v = v.transpose(2, 3, 1, 0)  # OIHW → HWIO
                elif tf == "deconv_w":
                    # torch ConvTranspose2d [in, out, kh, kw] → HWIO with the
                    # spatial flip baked in for the dilated correlation
                    v = v.transpose(2, 3, 0, 1)[::-1, ::-1]
                if v.shape == leaf.shape:
                    value = v
                    used.add(tkey)
        if value is None:
            missing.append("/".join(keypath))
            out_leaves.append(leaf)
        else:
            out_leaves.append(jnp.asarray(value.copy(), dtype=leaf.dtype))

    params = jax.tree_util.tree_unflatten(treedef, out_leaves)
    unused = [k for k in state_dict if k not in used]
    return params, missing, unused


def _dalle_torch_key_for(path: Tuple[str, ...]) -> Optional[str]:
    """Map DalleEncoder/DalleDecoder param paths → OpenAI dall_e state_dict
    keys (the pickled modules' named-Sequential layout; reference load path
    modeling_discrete_vae.py:203-225). dall_e's custom Conv2d stores its
    parameters as `w` (OIHW) / `b`."""
    suffix = "w" if path[-1] == "kernel" else "b"
    mod = path[0]
    if mod == "input_conv":
        return f"blocks.input.{suffix}"
    if mod == "output_conv":
        return f"blocks.output.conv.{suffix}"
    m = re.fullmatch(r"group_(\d+)_block_(\d+)", mod)
    if m:
        inner = {"id_conv": "id_path"}.get(path[1], f"res_path.{path[1]}")
        return f"blocks.group_{m.group(1)}.block_{m.group(2)}.{inner}.{suffix}"
    return None


def import_dalle_torch_params(
    params_template: Any,
    encoder_sd: Optional[Dict[str, np.ndarray]] = None,
    decoder_sd: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[Any, List[str], List[str]]:
    """Fill a DalleVAE (or bare DalleEncoder/DalleDecoder) param tree from the
    OpenAI encoder.pkl / decoder.pkl state dicts. A DalleVAE template has
    top-level 'encoder'/'decoder' subtrees routed to the matching state dict;
    a bare module template uses whichever dict is given.
    Returns (params, missing_paths, unused_keys)."""
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    treedef = jax.tree_util.tree_structure(params_template)
    out_leaves, missing = [], []
    used = {"encoder": set(), "decoder": set()}

    for path, leaf in flat:
        keypath = tuple(str(getattr(p, "key", p)) for p in path)
        side = None
        rel = keypath
        if keypath[0] in ("encoder", "decoder"):
            side, rel = keypath[0], keypath[1:]
        if side == "encoder":
            sd = encoder_sd
        elif side == "decoder":
            sd = decoder_sd
        else:  # bare DalleEncoder/DalleDecoder template
            sd = encoder_sd if encoder_sd is not None else decoder_sd
        tkey = _dalle_torch_key_for(rel)
        value = None
        if tkey is not None and sd is not None and tkey in sd:
            v = np.asarray(sd[tkey])
            if rel[-1] == "kernel":
                v = v.transpose(2, 3, 1, 0)  # OIHW → HWIO
            if v.shape == leaf.shape:
                value = v
                used[side or ("encoder" if sd is encoder_sd else "decoder")].add(tkey)
        if value is None:
            missing.append("/".join(keypath))
            out_leaves.append(leaf)
        else:
            out_leaves.append(jnp.asarray(value.copy(), dtype=leaf.dtype))

    params = jax.tree_util.tree_unflatten(treedef, out_leaves)
    unused = [
        f"{side}:{k}"
        for side, sd in (("encoder", encoder_sd), ("decoder", decoder_sd))
        if sd is not None
        for k in sd
        if k not in used[side]
    ]
    return params, missing, unused


def load_dalle_pickle_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load an OpenAI dall_e encoder.pkl/decoder.pkl WITHOUT the
    dall_e package: the pickle references classes by module path only, so
    registering minimal nn.Module stand-ins under sys.modules lets pickle
    rebuild the object graph, after which state_dict() has everything."""
    import sys
    import types

    import torch
    import torch.nn as tnn

    def _stub(name):
        return type(name, (tnn.Module,), {})

    mods = {}
    for modname, classes in (
        ("dall_e", ()),
        ("dall_e.utils", ("Conv2d",)),
        ("dall_e.encoder", ("Encoder", "EncoderBlock")),
        ("dall_e.decoder", ("Decoder", "DecoderBlock")),
    ):
        m = sys.modules.get(modname) or types.ModuleType(modname)
        for c in classes:
            if not hasattr(m, c):
                setattr(m, c, _stub(c))
        mods[modname] = m
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def export_torch_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """Inverse mapping: our param tree → reference-layout numpy state_dict
    (for round-trip tests and interop)."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keypath = tuple(str(getattr(p, "key", p)) for p in path)
        mapping = _torch_key_for(keypath)
        if mapping is None:
            continue
        tkey, tf = mapping
        v = np.asarray(leaf)
        if tf == "linear_w":
            v = v.T
        elif tf == "conv_w":
            v = v.transpose(3, 2, 0, 1)
        out[tkey] = v
    return out
