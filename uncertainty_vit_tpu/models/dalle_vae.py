"""OpenAI DALL-E discrete-VAE tokenizer architecture (flax).

The reference's `Dalle_VAE` (modeling_discrete_vae.py:203-237) wraps the
external `dall_e` package: `load_model("encoder.pkl")` /
`load_model("decoder.pkl")`, `get_codebook_indices` = argmax over encoder
logits (:223-225), `decode` = one-hot → decoder (:217-221). This module
reimplements that encoder/decoder network natively (NHWC, XLA convs) so the
published OpenAI tokenizer weights are consumable on TPU —
utils/checkpoint.py:import_dalle_torch maps the pickled torch modules'
state dict onto this tree.

Architecture (openai/DALL-E dvae, as pickled by the published weights):

  Encoder: Conv 7×7 (3 → n_hid) → 4 groups of `n_blk_per_group` bottleneck
  residual blocks at widths (1, 2, 4, 8)·n_hid with 2× max-pool between
  groups (3 pools total → /8 tokens) → ReLU + Conv 1×1 (8·n_hid → vocab).

  EncoderBlock(n_in → n_out): identity path (Conv 1×1 when n_in ≠ n_out)
  plus `post_gain`-scaled residual path
  ReLU→Conv3×3(n_out/4) → ReLU→Conv3×3 → ReLU→Conv3×3 → ReLU→Conv1×1(n_out),
  with post_gain = 1/n_layers² and n_layers = group_count·n_blk_per_group.

  Decoder mirrors it: Conv 1×1 (vocab → n_init), groups at widths
  (8, 4, 2, 1)·n_hid with nearest 2× upsample between groups, ReLU +
  Conv 1×1 (n_hid → 2·output_channels) (mean+logit-laplace-scale planes; the
  reconstruction is the first `output_channels` planes, sigmoid+unmap).

All convs are plain conv + bias with torch "same" padding ((k−1)/2).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops.augment import unmap_pixels

Dtype = Any


def _conv(features: int, k: int, dtype, name: str):
    return nn.Conv(features, (k, k), padding=(k - 1) // 2, dtype=dtype, name=name)


class DalleEncoderBlock(nn.Module):
    n_out: int
    post_gain: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_hid = self.n_out // 4
        idp = x
        if x.shape[-1] != self.n_out:
            idp = _conv(self.n_out, 1, self.dtype, "id_conv")(x)
        h = _conv(n_hid, 3, self.dtype, "conv_1")(nn.relu(x))
        h = _conv(n_hid, 3, self.dtype, "conv_2")(nn.relu(h))
        h = _conv(n_hid, 3, self.dtype, "conv_3")(nn.relu(h))
        h = _conv(self.n_out, 1, self.dtype, "conv_4")(nn.relu(h))
        return idp + self.post_gain * h


class DalleEncoder(nn.Module):
    """dall_e encoder: [B, H, W, 3] in [0, 1] (map_pixels applied by the
    caller, as the reference does at datasets.py:86-102) → [B, H/8, W/8,
    vocab] logits."""

    group_count: int = 4
    n_hid: int = 256
    n_blk_per_group: int = 2
    input_channels: int = 3
    vocab_size: int = 8192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_layers = self.group_count * self.n_blk_per_group
        post_gain = 1.0 / (n_layers**2)
        h = _conv(self.n_hid, 7, self.dtype, "input_conv")(x.astype(self.dtype))
        widths = [self.n_hid * m for m in (1, 2, 4, 8)]
        for g, w in enumerate(widths):
            for b in range(self.n_blk_per_group):
                h = DalleEncoderBlock(
                    n_out=w, post_gain=post_gain, dtype=self.dtype,
                    name=f"group_{g + 1}_block_{b + 1}",
                )(h)
            if g < len(widths) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = _conv(self.vocab_size, 1, self.dtype, "output_conv")(nn.relu(h))
        return h


class DalleDecoderBlock(nn.Module):
    n_out: int
    post_gain: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_hid = self.n_out // 4
        idp = x
        if x.shape[-1] != self.n_out:
            idp = _conv(self.n_out, 1, self.dtype, "id_conv")(x)
        h = _conv(n_hid, 1, self.dtype, "conv_1")(nn.relu(x))
        h = _conv(n_hid, 3, self.dtype, "conv_2")(nn.relu(h))
        h = _conv(n_hid, 3, self.dtype, "conv_3")(nn.relu(h))
        h = _conv(self.n_out, 3, self.dtype, "conv_4")(nn.relu(h))
        return idp + self.post_gain * h


class DalleDecoder(nn.Module):
    """dall_e decoder: [B, h, w, vocab] one-hot/probs → [B, 8h, 8w, 6]
    (mean and logit-laplace scale planes)."""

    group_count: int = 4
    n_init: int = 128
    n_hid: int = 256
    n_blk_per_group: int = 2
    output_channels: int = 3
    vocab_size: int = 8192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        n_layers = self.group_count * self.n_blk_per_group
        post_gain = 1.0 / (n_layers**2)
        h = _conv(self.n_init, 1, self.dtype, "input_conv")(z.astype(self.dtype))
        widths = [self.n_hid * m for m in (8, 4, 2, 1)]
        for g, w in enumerate(widths):
            for b in range(self.n_blk_per_group):
                h = DalleDecoderBlock(
                    n_out=w, post_gain=post_gain, dtype=self.dtype,
                    name=f"group_{g + 1}_block_{b + 1}",
                )(h)
            if g < len(widths) - 1:
                b_, hh, ww, c = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, c), "nearest")
        h = _conv(2 * self.output_channels, 1, self.dtype, "output_conv")(nn.relu(h))
        return h


class DalleVAE(nn.Module):
    """`Dalle_VAE` surface (modeling_discrete_vae.py:203-237) on the native
    encoder/decoder above. image_size is the tokenizer view size (the
    reference's `second_input_size`); tokens are (image_size/8)²."""

    image_size: int = 112
    vocab_size: int = 8192
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = DalleEncoder(vocab_size=self.vocab_size, dtype=self.dtype)
        self.decoder = DalleDecoder(vocab_size=self.vocab_size, dtype=self.dtype)

    def get_codebook_indices(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, S, S, 3] (map_pixels'ed) → [B, (S/8)²] int32 (:223-225)."""
        logits = self.encoder(images)
        idx = jnp.argmax(logits, axis=-1)
        return idx.reshape(idx.shape[0], -1).astype(jnp.int32)

    def get_codebook_probs(self, images: jnp.ndarray) -> jnp.ndarray:
        """softmax over the vocab axis (:227-229), [B, h, w, vocab]."""
        return jax.nn.softmax(self.encoder(images), axis=-1)

    def decode(self, img_seq: jnp.ndarray) -> jnp.ndarray:
        """[B, (S/8)²] int codes → [B, S, S, 3] reconstruction in [0, 1]
        (:217-221 + the reference's sigmoid/unmap at usage sites)."""
        s = self.image_size // 8
        z = jax.nn.one_hot(
            img_seq.reshape(-1, s, s), self.vocab_size, dtype=self.dtype
        )
        out = self.decoder(z)
        return unmap_pixels(jax.nn.sigmoid(out[..., : 3].astype(jnp.float32)))

    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Autoencode roundtrip: (codebook indices, reconstruction). Runs
        both halves so `init` materializes encoder AND decoder params."""
        logits = self.encoder(images)
        idx = jnp.argmax(logits, axis=-1)
        z = jax.nn.one_hot(idx, self.vocab_size, dtype=self.dtype)
        recon = unmap_pixels(
            jax.nn.sigmoid(self.decoder(z)[..., : 3].astype(jnp.float32))
        )
        return idx.reshape(images.shape[0], -1).astype(jnp.int32), recon
