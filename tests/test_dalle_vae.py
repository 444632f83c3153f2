"""Parity tests for the native OpenAI dall_e tokenizer architecture
(models/dalle_vae.py) against an inline torch rebuild of the dall_e
network (the reference's Dalle_VAE load path,
modeling_discrete_vae.py:203-237), on random weights."""

import math
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from uncertainty_vit_tpu.models.dalle_vae import DalleDecoder, DalleEncoder, DalleVAE
from uncertainty_vit_tpu.utils.checkpoint import (
    import_dalle_torch_params,
    load_dalle_pickle_state_dict,
)

# small config so the test runs in seconds; the mapping is name-driven and
# identical at the published sizes (n_hid=256, vocab=8192)
N_HID = 16
VOCAB = 64
N_BLK = 2
GROUPS = 4


class Conv2d(tnn.Module):
    """dall_e.utils.Conv2d: plain conv with params named w (OIHW) / b."""

    def __init__(self, n_in, n_out, kw):
        super().__init__()
        w = torch.empty((n_out, n_in, kw, kw)).normal_(
            std=1 / math.sqrt(n_in * kw**2)
        )
        self.w = tnn.Parameter(w)
        self.b = tnn.Parameter(torch.zeros(n_out))
        self.kw = kw

    def forward(self, x):
        return F.conv2d(x, self.w, self.b, padding=(self.kw - 1) // 2)


def _enc_block(n_in, n_out, n_layers):
    post_gain = 1 / (n_layers**2)

    class EncoderBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            n_hid = n_out // 4
            self.id_path = Conv2d(n_in, n_out, 1) if n_in != n_out else tnn.Identity()
            self.res_path = tnn.Sequential(OrderedDict([
                ("relu_1", tnn.ReLU()), ("conv_1", Conv2d(n_in, n_hid, 3)),
                ("relu_2", tnn.ReLU()), ("conv_2", Conv2d(n_hid, n_hid, 3)),
                ("relu_3", tnn.ReLU()), ("conv_3", Conv2d(n_hid, n_hid, 3)),
                ("relu_4", tnn.ReLU()), ("conv_4", Conv2d(n_hid, n_out, 1)),
            ]))

        def forward(self, x):
            return self.id_path(x) + post_gain * self.res_path(x)

    return EncoderBlock()


def _dec_block(n_in, n_out, n_layers):
    post_gain = 1 / (n_layers**2)

    class DecoderBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            n_hid = n_out // 4
            self.id_path = Conv2d(n_in, n_out, 1) if n_in != n_out else tnn.Identity()
            self.res_path = tnn.Sequential(OrderedDict([
                ("relu_1", tnn.ReLU()), ("conv_1", Conv2d(n_in, n_hid, 1)),
                ("relu_2", tnn.ReLU()), ("conv_2", Conv2d(n_hid, n_hid, 3)),
                ("relu_3", tnn.ReLU()), ("conv_3", Conv2d(n_hid, n_hid, 3)),
                ("relu_4", tnn.ReLU()), ("conv_4", Conv2d(n_hid, n_out, 3)),
            ]))

        def forward(self, x):
            return self.id_path(x) + post_gain * self.res_path(x)

    return DecoderBlock()


def torch_encoder():
    n_layers = GROUPS * N_BLK
    g = lambda blocks, pool: tnn.Sequential(OrderedDict(
        [(f"block_{i + 1}", b) for i, b in enumerate(blocks)]
        + ([("pool", tnn.MaxPool2d(2))] if pool else [])
    ))
    widths = [N_HID, 2 * N_HID, 4 * N_HID, 8 * N_HID]
    groups = []
    prev = N_HID
    for gi, w in enumerate(widths):
        blocks = []
        for bi in range(N_BLK):
            blocks.append(_enc_block(prev if bi == 0 else w, w, n_layers))
        prev = w
        groups.append((f"group_{gi + 1}", g(blocks, pool=gi < 3)))
    return tnn.Sequential(OrderedDict(
        [("input", Conv2d(3, N_HID, 7))] + groups + [
            ("output", tnn.Sequential(OrderedDict([
                ("relu", tnn.ReLU()), ("conv", Conv2d(8 * N_HID, VOCAB, 1)),
            ]))),
        ]
    ))


def torch_decoder(n_init=8):
    n_layers = GROUPS * N_BLK
    g = lambda blocks, up: tnn.Sequential(OrderedDict(
        [(f"block_{i + 1}", b) for i, b in enumerate(blocks)]
        + ([("upsample", tnn.Upsample(scale_factor=2, mode="nearest"))] if up else [])
    ))
    widths = [8 * N_HID, 4 * N_HID, 2 * N_HID, N_HID]
    groups = []
    prev = n_init
    for gi, w in enumerate(widths):
        blocks = []
        for bi in range(N_BLK):
            blocks.append(_dec_block(prev if bi == 0 else w, w, n_layers))
        prev = w
        groups.append((f"group_{gi + 1}", g(blocks, up=gi < 3)))
    return tnn.Sequential(OrderedDict(
        [("input", Conv2d(VOCAB, n_init, 1))] + groups + [
            ("output", tnn.Sequential(OrderedDict([
                ("relu", tnn.ReLU()), ("conv", Conv2d(N_HID, 6, 1)),
            ]))),
        ]
    ))


def _sd(mod):
    """dall_e modules hold their Sequential under a `blocks` attribute, so
    the published state_dict keys are blocks.<name>..."""
    return {f"blocks.{k}": v.detach().numpy()
            for k, v in mod.state_dict().items()}


def test_dalle_encoder_parity():
    torch.manual_seed(0)
    enc_t = torch_encoder()
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        ref_logits = enc_t(x).numpy()  # [B, vocab, 4, 4]

    enc = DalleEncoder(n_hid=N_HID, n_blk_per_group=N_BLK, vocab_size=VOCAB)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    tmpl = enc.init(jax.random.PRNGKey(0), xj)["params"]
    params, missing, unused = import_dalle_torch_params(tmpl, encoder_sd=_sd(enc_t))
    assert not missing, missing
    assert not unused, unused
    got = enc.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.asarray(got), ref_logits.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5
    )
    # the BEiT-facing surface: identical codebook indices
    assert (np.asarray(jnp.argmax(got, -1)).ravel()
            == ref_logits.argmax(1).ravel()).all()


def test_dalle_decoder_parity():
    torch.manual_seed(1)
    dec_t = torch_decoder()
    codes = torch.randint(0, VOCAB, (2, 4, 4))
    z = F.one_hot(codes, VOCAB).permute(0, 3, 1, 2).float()
    with torch.no_grad():
        ref = dec_t(z).numpy()  # [B, 6, 32, 32]

    dec = DalleDecoder(n_init=8, n_hid=N_HID, n_blk_per_group=N_BLK,
                       vocab_size=VOCAB)
    zj = jax.nn.one_hot(jnp.asarray(codes.numpy()), VOCAB)
    tmpl = dec.init(jax.random.PRNGKey(0), zj)["params"]
    params, missing, unused = import_dalle_torch_params(tmpl, decoder_sd=_sd(dec_t))
    assert not missing, missing
    assert not unused, unused
    got = dec.apply({"params": params}, zj)
    np.testing.assert_allclose(
        np.asarray(got), ref.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5
    )


def test_dalle_pickle_loader_roundtrip(tmp_path):
    """load_dalle_pickle_state_dict reconstructs a module graph pickled
    against `dall_e.*` class paths without the dall_e package installed —
    the exact situation of OpenAI's encoder.pkl/decoder.pkl."""
    import sys
    import types

    torch.manual_seed(2)
    created = {n: types.ModuleType(n)
               for n in ("dall_e", "dall_e.utils", "dall_e.encoder")}

    class ConvCls(Conv2d):
        pass

    ConvCls.__module__, ConvCls.__qualname__ = "dall_e.utils", "Conv2d"
    created["dall_e.utils"].Conv2d = ConvCls

    def reg(name):
        cls = type(name, (tnn.Module,), {"__module__": "dall_e.encoder"})
        setattr(created["dall_e.encoder"], name, cls)
        return cls

    EncCls, BlkCls = reg("Encoder"), reg("EncoderBlock")

    def blk(n_in, n_out):
        b = BlkCls()
        n_hid = n_out // 4
        b.id_path = ConvCls(n_in, n_out, 1) if n_in != n_out else tnn.Identity()
        b.res_path = tnn.Sequential(OrderedDict([
            ("relu_1", tnn.ReLU()), ("conv_1", ConvCls(n_in, n_hid, 3)),
            ("relu_2", tnn.ReLU()), ("conv_2", ConvCls(n_hid, n_out, 1)),
        ]))
        return b

    enc = EncCls()
    enc.blocks = tnn.Sequential(OrderedDict([
        ("input", ConvCls(3, N_HID, 7)),
        ("group_1", tnn.Sequential(OrderedDict([
            ("block_1", blk(N_HID, N_HID)),
            ("block_2", blk(N_HID, 2 * N_HID)),
            ("pool", tnn.MaxPool2d(2)),
        ]))),
        ("output", tnn.Sequential(OrderedDict([
            ("relu", tnn.ReLU()), ("conv", ConvCls(2 * N_HID, VOCAB, 1)),
        ]))),
    ]))
    want = {k: v.detach().numpy() for k, v in enc.state_dict().items()}

    p = tmp_path / "encoder.pkl"
    saved = {k: sys.modules.get(k) for k in created}
    sys.modules.update(created)
    try:
        torch.save(enc, p)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    sd = load_dalle_pickle_state_dict(str(p))
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k])


# --- Picklable dall_e.* class hierarchy (published artifact layout) ------
# OpenAI's encoder.pkl/decoder.pkl are torch.save'd module OBJECTS whose
# classes live at dall_e.utils.Conv2d / dall_e.encoder.Encoder(Block) /
# dall_e.decoder.Decoder(Block); the tests below rebuild that exact object
# graph with picklable stand-ins, pickle it, and run the real load chain
# (load_dalle_pickle_state_dict → import_dalle_torch_params → NHWC forward).


class _PConv2d(Conv2d):
    pass


class _PBlock(tnn.Module):
    def forward(self, x):
        return self.id_path(x) + self.post_gain * self.res_path(x)


class _PModule(tnn.Module):
    def forward(self, x):
        return self.blocks(x)


_PConv2d.__module__, _PConv2d.__qualname__ = "dall_e.utils", "Conv2d"
_P_ENC_BLK = type("EncoderBlock", (_PBlock,), {"__module__": "dall_e.encoder"})
_P_DEC_BLK = type("DecoderBlock", (_PBlock,), {"__module__": "dall_e.decoder"})
_P_ENC = type("Encoder", (_PModule,), {"__module__": "dall_e.encoder"})
_P_DEC = type("Decoder", (_PModule,), {"__module__": "dall_e.decoder"})


def _pickle_block(blk_cls, n_in, n_out, n_layers, dec):
    b = blk_cls()
    b.post_gain = 1 / (n_layers**2)
    n_hid = n_out // 4
    b.id_path = _PConv2d(n_in, n_out, 1) if n_in != n_out else tnn.Identity()
    b.res_path = tnn.Sequential(OrderedDict([
        ("relu_1", tnn.ReLU()), ("conv_1", _PConv2d(n_in, n_hid, 1 if dec else 3)),
        ("relu_2", tnn.ReLU()), ("conv_2", _PConv2d(n_hid, n_hid, 3)),
        ("relu_3", tnn.ReLU()), ("conv_3", _PConv2d(n_hid, n_hid, 3)),
        ("relu_4", tnn.ReLU()), ("conv_4", _PConv2d(n_hid, n_out, 3 if dec else 1)),
    ]))
    return b


def _pickle_encoder():
    n_layers = GROUPS * N_BLK
    enc = _P_ENC()
    widths = [N_HID, 2 * N_HID, 4 * N_HID, 8 * N_HID]
    groups, prev = [], N_HID
    for gi, w in enumerate(widths):
        items = [(f"block_{bi + 1}",
                  _pickle_block(_P_ENC_BLK, prev if bi == 0 else w, w,
                                n_layers, dec=False))
                 for bi in range(N_BLK)]
        if gi < 3:
            items.append(("pool", tnn.MaxPool2d(2)))
        groups.append((f"group_{gi + 1}", tnn.Sequential(OrderedDict(items))))
        prev = w
    enc.blocks = tnn.Sequential(OrderedDict(
        [("input", _PConv2d(3, N_HID, 7))] + groups + [
            ("output", tnn.Sequential(OrderedDict([
                ("relu", tnn.ReLU()), ("conv", _PConv2d(8 * N_HID, VOCAB, 1)),
            ]))),
        ]
    ))
    return enc


def _pickle_decoder(n_init=8):
    n_layers = GROUPS * N_BLK
    dec = _P_DEC()
    widths = [8 * N_HID, 4 * N_HID, 2 * N_HID, N_HID]
    groups, prev = [], n_init
    for gi, w in enumerate(widths):
        items = [(f"block_{bi + 1}",
                  _pickle_block(_P_DEC_BLK, prev if bi == 0 else w, w,
                                n_layers, dec=True))
                 for bi in range(N_BLK)]
        if gi < 3:
            items.append(("upsample",
                          tnn.Upsample(scale_factor=2, mode="nearest")))
        groups.append((f"group_{gi + 1}", tnn.Sequential(OrderedDict(items))))
        prev = w
    dec.blocks = tnn.Sequential(OrderedDict(
        [("input", _PConv2d(VOCAB, n_init, 1))] + groups + [
            ("output", tnn.Sequential(OrderedDict([
                ("relu", tnn.ReLU()), ("conv", _PConv2d(N_HID, 6, 1)),
            ]))),
        ]
    ))
    return dec


def _save_as_dalle_pickle(mod, path):
    """torch.save with dall_e.* modules registered so pickle resolves the
    class paths; unregister afterwards so the loader's stubs do the work."""
    import sys
    import types

    created = {}
    for name, attrs in (
        ("dall_e", {}),
        ("dall_e.utils", {"Conv2d": _PConv2d}),
        ("dall_e.encoder", {"Encoder": _P_ENC, "EncoderBlock": _P_ENC_BLK}),
        ("dall_e.decoder", {"Decoder": _P_DEC, "DecoderBlock": _P_DEC_BLK}),
    ):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        created[name] = m
    saved = {k: sys.modules.get(k) for k in created}
    sys.modules.update(created)
    try:
        torch.save(mod, path)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_dalle_encoder_pickle_chain(tmp_path):
    """Full artifact chain: published-layout encoder object pickled under
    dall_e.* class paths → load_dalle_pickle_state_dict (stub unpickling,
    no dall_e installed) → import_dalle_torch_params → NHWC forward parity
    (modeling_discrete_vae.py:213-225 load path)."""
    torch.manual_seed(4)
    enc_t = _pickle_encoder()
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        ref_logits = enc_t(x).numpy()

    p = tmp_path / "encoder.pkl"
    _save_as_dalle_pickle(enc_t, p)
    sd = load_dalle_pickle_state_dict(str(p))
    assert set(sd) == {f"blocks.{k}" for k in
                       {k: None for k, _ in enc_t.blocks.state_dict().items()}}

    enc = DalleEncoder(n_hid=N_HID, n_blk_per_group=N_BLK, vocab_size=VOCAB)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    tmpl = enc.init(jax.random.PRNGKey(0), xj)["params"]
    params, missing, unused = import_dalle_torch_params(tmpl, encoder_sd=sd)
    assert not missing, missing
    assert not unused, unused
    got = enc.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.asarray(got), ref_logits.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5
    )
    assert (np.asarray(jnp.argmax(got, -1)).ravel()
            == ref_logits.argmax(1).ravel()).all()


def test_dalle_decoder_pickle_chain(tmp_path):
    torch.manual_seed(5)
    dec_t = _pickle_decoder()
    codes = torch.randint(0, VOCAB, (2, 4, 4))
    z = F.one_hot(codes, VOCAB).permute(0, 3, 1, 2).float()
    with torch.no_grad():
        ref = dec_t(z).numpy()

    p = tmp_path / "decoder.pkl"
    _save_as_dalle_pickle(dec_t, p)
    sd = load_dalle_pickle_state_dict(str(p))

    dec = DalleDecoder(n_init=8, n_hid=N_HID, n_blk_per_group=N_BLK,
                       vocab_size=VOCAB)
    zj = jax.nn.one_hot(jnp.asarray(codes.numpy()), VOCAB)
    tmpl = dec.init(jax.random.PRNGKey(0), zj)["params"]
    params, missing, unused = import_dalle_torch_params(tmpl, decoder_sd=sd)
    assert not missing, missing
    assert not unused, unused
    got = dec.apply({"params": params}, zj)
    np.testing.assert_allclose(
        np.asarray(got), ref.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5
    )


def test_build_discrete_vae_dispatch():
    """cli.builders.build_discrete_vae mirrors the reference create_d_vae
    dispatch (utils.py:548-573): 'dall-e' → DalleVAE, 'customized' → the
    in-repo DiscreteVAE."""
    import argparse

    from uncertainty_vit_tpu.cli.builders import build_discrete_vae
    from uncertainty_vit_tpu.models.dvae import DiscreteVAE

    sample = jnp.zeros((2, 16, 16, 3))
    args = argparse.Namespace(
        discrete_vae_type="dall-e", discrete_vae_weight_path="",
        second_input_size=16, vocab_size=VOCAB, dvae_num_layers=3,
        dvae_hidden_dim=8,
    )
    vae, variables = build_discrete_vae(args, jax.random.PRNGKey(0), sample)
    assert isinstance(vae, DalleVAE)
    idx = vae.apply(variables, sample, method=vae.get_codebook_indices)
    assert idx.shape == (2, 4)

    args.discrete_vae_type = "customized"
    vae, variables = build_discrete_vae(args, jax.random.PRNGKey(0), sample)
    assert isinstance(vae, DiscreteVAE)
    idx = vae.apply(variables, sample, method=vae.get_codebook_indices)
    assert idx.shape == (2, 4)


def test_dalle_vae_surface():
    """DalleVAE.get_codebook_indices / decode shapes + determinism."""
    vae = DalleVAE(image_size=32, vocab_size=VOCAB)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    variables = vae.init(jax.random.PRNGKey(0), imgs)
    idx = vae.apply(variables, imgs, method=vae.get_codebook_indices)
    assert idx.shape == (2, 16) and idx.dtype == jnp.int32
    probs = vae.apply(variables, imgs, method=vae.get_codebook_probs)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    recon = vae.apply(variables, idx, method=vae.decode)
    assert recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(recon)).all()
