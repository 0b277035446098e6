"""Conditional convolutional Autoencoder.

Capability-parity with the reference Autoencoder
(/root/reference/dl_models/autoencoder.py:205-417): conv encoder
(64-512, stride 2) -> Flatten ⊕ Embedding(2000,256)/Dense(n_neurons)
vector branch -> Dense(latent 64) bottleneck -> Dense/reshape transpose-conv
decoder with sigmoid head. Encoder/decoder are exposed as methods so the
VAE-style separate encode/decode call pattern works
(model.apply(..., method='encode')).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unet_rir_tpu.models.ae_common import (
    ConvEncoder,
    ConvTransposeDecoder,
    InfoVectorDense,
    pre_latent_shape,
)


class Autoencoder(nn.Module):
    """(B,144,160,2)+(B,2,16)int -> (B,144,160,2) in [0,1]."""

    conv_filters: Sequence[int] = (64, 128, 256, 512)
    conv_kernels: Sequence[int] = (3, 3, 3, 3)
    conv_strides: Sequence[int] = (2, 2, 2, 2)
    latent_space_dim: int = 64
    n_neurons: int = 32 * 64
    input_hw: tuple[int, int] = (144, 160)
    embed_vocab: int = 2000
    embed_features: int = 256
    dtype: Any = jnp.float32

    L2_PATTERNS = ("reg_",)

    def setup(self):
        self._pre_latent = pre_latent_shape(
            self.input_hw, self.conv_strides, self.conv_filters[-1]
        )
        self.encoder_stack = ConvEncoder(
            self.conv_filters, self.conv_kernels, self.conv_strides,
            regularized=True, dtype=self.dtype,
        )
        self.vector_branch = InfoVectorDense(
            self.n_neurons, vocab_size=self.embed_vocab,
            embed_features=self.embed_features, dropout_rate=0.3,
            dtype=self.dtype,
        )
        self.latent_dense = nn.Dense(self.latent_space_dim, dtype=self.dtype,
                                     name="encoder_output")
        self.decoder_stack = ConvTransposeDecoder(
            self._pre_latent, self.conv_filters, self.conv_kernels,
            self.conv_strides, output_activation="sigmoid",
            regularized=True, dtype=self.dtype,
        )

    def encode(self, spec, emb, *, training: bool = False):
        x = self.encoder_stack(spec.astype(self.dtype), training=training)
        x = x.reshape((x.shape[0], -1))
        y = self.vector_branch(emb, training=training)
        return self.latent_dense(jnp.concatenate([x, y], axis=-1))

    def decode(self, z, *, training: bool = False):
        return self.decoder_stack(z, training=training)

    def __call__(self, spec, emb, *, training: bool = False):
        return self.decode(self.encode(spec, emb, training=training), training=training)


__all__ = ["Autoencoder"]
