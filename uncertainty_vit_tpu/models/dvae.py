"""Discrete VAE image tokenizer (flax).

Mirrors `DiscreteVAE` (modeling_discrete_vae.py:79-237): conv encoder of
[stride-2 conv + ReLU + ResBlock] × num_layers + 1×1 head over the codebook
vocab; mirror decoder with transposed convs. `get_codebook_indices` is the
argmax over encoder logits (:133-138), which is all BEiT pretraining needs.

The reference's `Dalle_VAE` (:203-237) loads OpenAI's pickled encoder/decoder;
those weights are an external artifact — import them via
utils/checkpoint.py's torch importer when available. Images are NHWC in
[0, 1].
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


# canonical home is ops/augment.py (it is a data transform); re-exported here
# because the reference exposes them on the dVAE side (modeling_discrete_vae)
from uncertainty_vit_tpu.ops.augment import (  # noqa: F401
    DALLE_LOGIT_LAPLACE_EPS, map_pixels, unmap_pixels,
)


class TorchConvTranspose(nn.Module):
    """torch-exact ConvTranspose2d(k=4, s=2, p=1) as a dilated convolution.

    torch's transposed conv equals: dilate the input by the stride (insert
    zeros), pad each spatial side by k−1−p, then CORRELATE with the kernel
    flipped spatially and with in/out channels swapped. flax's own
    nn.ConvTranspose uses lax.conv_transpose 'SAME' padding semantics which
    do NOT reproduce torch's arrangement — this module exists so OpenAI /
    reference dVAE decoder weights import bit-correctly
    (modeling_discrete_vae.py:113 ConvTranspose2d(dec_in, hidden, 4, 2, 1)).

    The kernel param is stored HWIO *already flipped* for the dilated
    correlation; the importer performs the flip/transpose once at load time.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    torch_padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.kernel_size - 1 - self.torch_padding
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class ResBlock(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out, (1, 1), dtype=self.dtype, name="conv3")(h)
        return h + x


class DiscreteVAE(nn.Module):
    image_size: int = 256
    num_tokens: int = 8192
    codebook_dim: int = 512
    num_layers: int = 3
    hidden_dim: int = 64
    channels: int = 3
    temperature: float = 0.9
    straight_through: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.codebook = nn.Embed(self.num_tokens, self.codebook_dim, name="codebook")
        enc = []
        dec = []
        for i in range(self.num_layers):
            enc.append(nn.Conv(self.hidden_dim, (4, 4), strides=2, padding=1,
                               dtype=self.dtype, name=f"enc_conv_{i}"))
            enc.append(ResBlock(self.hidden_dim, self.hidden_dim, self.dtype,
                                name=f"enc_res_{i}"))
            # 2× upsample, torch-exact (see TorchConvTranspose)
            dec.append(TorchConvTranspose(self.hidden_dim, dtype=self.dtype,
                                          name=f"dec_conv_{i}"))
            dec.append(ResBlock(self.hidden_dim, self.hidden_dim, self.dtype,
                                name=f"dec_res_{i}"))
        self.enc_head = nn.Conv(self.num_tokens, (1, 1), dtype=self.dtype, name="enc_head")
        self.dec_head = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="dec_head")
        self.enc_layers = enc
        self.dec_layers = dec

    def encode_logits(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C] → [B, H/8, W/8, vocab] logits."""
        h = images.astype(self.dtype)
        for i, layer in enumerate(self.enc_layers):
            h = layer(h)
            if i % 2 == 0:  # ReLU after the strided conv (modeling_discrete_vae.py:111)
                h = nn.relu(h)
        return self.enc_head(h)

    def decode_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """[B, h, w] int codes → [B, H, W, C] reconstruction."""
        h = self.codebook(codes).astype(self.dtype)
        for i, layer in enumerate(self.dec_layers):
            h = layer(h)
            if i % 2 == 0:
                h = nn.relu(h)
        return self.dec_head(h)

    def get_codebook_indices(self, images: jnp.ndarray) -> jnp.ndarray:
        """argmax over encoder logits (modeling_discrete_vae.py:133-138) →
        [B, h·w] int32 token ids."""
        logits = self.encode_logits(images)
        idx = jnp.argmax(logits, axis=-1)
        return idx.reshape(idx.shape[0], -1).astype(jnp.int32)

    def __call__(
        self, images: jnp.ndarray, temperature: float | None = None,
        rng: jax.Array | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training forward: gumbel-soft codebook sample → decode; returns
        (recon, logits) for an MSE/perceptual recon loss."""
        logits = self.encode_logits(images)
        tau = self.temperature if temperature is None else temperature
        if rng is not None:
            g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
            soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
        else:
            soft = jax.nn.softmax(logits.astype(jnp.float32) / tau, axis=-1)
        h = jnp.einsum("bhwv,vd->bhwd", soft.astype(self.dtype),
                       self.codebook.embedding.astype(self.dtype))
        for i, layer in enumerate(self.dec_layers):
            h = layer(h)
            if i % 2 == 0:
                h = nn.relu(h)
        return self.dec_head(h), logits
