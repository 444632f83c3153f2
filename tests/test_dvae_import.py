"""DiscreteVAE torch-weight import parity.

Rebuilds the reference DiscreteVAE conv stack inline in torch
(modeling_discrete_vae.py:64-140), pushes random weights through
`import_dvae_torch_params`, and checks encoder logits, codebook indices, and
the decoder reconstruction agree with torch — including the ConvTranspose2d
(k=4, s=2, p=1) layout that `TorchConvTranspose` reproduces.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uncertainty_vit_tpu.models.dvae import DiscreteVAE  # noqa: E402
from uncertainty_vit_tpu.utils.checkpoint import import_dvae_torch_params  # noqa: E402

NUM_LAYERS = 2
HIDDEN = 8
VOCAB = 16
CODE_DIM = 12
SIZE = 32


class TorchResBlock(tnn.Module):
    # modeling_discrete_vae.py:64-76
    def __init__(self, chan_in, hidden_size, chan_out):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Conv2d(chan_in, hidden_size, 3, padding=1),
            tnn.ReLU(),
            tnn.Conv2d(hidden_size, hidden_size, 3, padding=1),
            tnn.ReLU(),
            tnn.Conv2d(hidden_size, chan_out, 1),
        )

    def forward(self, x):
        return self.net(x) + x


def build_torch_dvae():
    # modeling_discrete_vae.py:104-122
    enc_layers, dec_layers = [], []
    enc_in, dec_in = 3, CODE_DIM
    for _ in range(NUM_LAYERS):
        enc_layers.append(tnn.Sequential(tnn.Conv2d(enc_in, HIDDEN, 4, stride=2, padding=1), tnn.ReLU()))
        enc_layers.append(TorchResBlock(HIDDEN, HIDDEN, HIDDEN))
        enc_in = HIDDEN
        dec_layers.append(tnn.Sequential(tnn.ConvTranspose2d(dec_in, HIDDEN, 4, stride=2, padding=1), tnn.ReLU()))
        dec_layers.append(TorchResBlock(HIDDEN, HIDDEN, HIDDEN))
        dec_in = HIDDEN
    enc_layers.append(tnn.Conv2d(HIDDEN, VOCAB, 1))
    dec_layers.append(tnn.Conv2d(HIDDEN, 3, 1))

    model = tnn.Module()
    model.codebook = tnn.Embedding(VOCAB, CODE_DIM)
    model.encoder = tnn.Sequential(*enc_layers)
    model.decoder = tnn.Sequential(*dec_layers)
    return model


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = build_torch_dvae().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    # our model: downsample factor 2^NUM_LAYERS of a SIZE input
    fmodel = DiscreteVAE(
        image_size=SIZE, num_tokens=VOCAB, codebook_dim=CODE_DIM,
        num_layers=NUM_LAYERS, hidden_dim=HIDDEN,
    )
    x = np.random.RandomState(0).rand(2, SIZE, SIZE, 3).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, unused = import_dvae_torch_params(
        sd, variables["params"], num_layers=NUM_LAYERS
    )
    assert missing == [], missing
    assert unused == [], unused
    return tmodel, fmodel, {"params": params}, x


def test_encoder_logits_parity(pair):
    tmodel, fmodel, variables, x = pair
    with torch.no_grad():
        ref = tmodel.encoder(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x), method=fmodel.encode_logits)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_codebook_indices_parity(pair):
    tmodel, fmodel, variables, x = pair
    with torch.no_grad():
        ref = tmodel.encoder(torch.from_numpy(x).permute(0, 3, 1, 2)).argmax(1).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x), method=fmodel.get_codebook_indices)
    )
    np.testing.assert_array_equal(got, ref.reshape(ref.shape[0], -1))


def test_decoder_parity(pair):
    """ConvTranspose2d(4, 2, 1) layout: decode the same code grid."""
    tmodel, fmodel, variables, x = pair
    rs = np.random.RandomState(1)
    grid = SIZE // (2 ** NUM_LAYERS)
    codes = rs.randint(0, VOCAB, (2, grid, grid))
    with torch.no_grad():
        emb = tmodel.codebook(torch.from_numpy(codes))  # [B, h, w, D]
        ref = tmodel.decoder(emb.permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(codes), method=fmodel.decode_codes)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
