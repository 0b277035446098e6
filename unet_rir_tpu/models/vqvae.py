"""Conditional VQ-VAE with straight-through vector quantization.

Capability-parity with the reference VQVAE (/root/reference/dl_models/
vqvae.py:42-520):

* Encoder: conv stack -> Flatten ⊕ Embedding(1500,128)/Dense vector branch
  (unflattened Dense, vqvae.py:445-455) -> Dense to a *spatial* (H,W,2)
  grid -> Dropout(0.3) -> reshape -> 1x1 conv to last filter count ->
  VectorQuantizer (vqvae.py:490-520).
* VectorQuantizer: codebook (embedding_dim, num_embeddings); inputs are
  flattened to (-1, embedding_dim), assigned to nearest code by L2,
  straight-through estimator passes decoder gradients to the encoder
  (stop_gradient identity, vqvae.py:84); aux loss = codebook +
  beta*commitment (beta=0.25, vqvae.py:79-82) returned in the aux dict
  (functional replacement for keras add_loss — SURVEY.md §7 hard part 5).
* Decoder: shared Dense/reshape transpose-conv stack, sigmoid head.
* Fixes the reference's load() bug which rebuilt a VAE (vqvae.py:237) —
  the registry restores the correct class by name.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_rir_tpu.models.ae_common import (
    ConvEncoder,
    ConvTransposeDecoder,
    InfoVectorDense,
    pre_latent_shape,
)


class VectorQuantizer(nn.Module):
    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, x):
        codebook = self.param(
            "embeddings",
            nn.initializers.uniform(scale=0.05),
            (self.embedding_dim, self.num_embeddings),
        )
        flat = x.reshape((-1, self.embedding_dim))
        # Nearest code by L2: argmin ||f||^2 + ||e||^2 - 2 f.e (vqvae.py:87-98)
        distances = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=0)
            - 2.0 * flat @ codebook
        )
        indices = jnp.argmin(distances, axis=1)
        quantized = codebook.T[indices].reshape(x.shape)

        commitment = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
        codebook_loss = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(x)))
        vq_loss = self.beta * commitment + codebook_loss

        # Straight-through estimator.
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, vq_loss


class VQVAE(nn.Module):
    conv_filters: Sequence[int] = (32, 64, 128, 256)
    conv_kernels: Sequence[int] = (3, 3, 3, 3)
    conv_strides: Sequence[int] = (2, 2, 2, 2)
    latent_space_dim: int = 16  # VQ embedding_dim
    n_neurons: int = 320
    input_hw: tuple[int, int] = (144, 160)
    embed_vocab: int = 1500
    embed_features: int = 128
    beta: float = 0.25
    dtype: Any = jnp.float32

    L2_PATTERNS = ()

    def setup(self):
        self._pre_latent = pre_latent_shape(
            self.input_hw, self.conv_strides, self.conv_filters[-1]
        )
        h, w, _ = self._pre_latent
        self._bottleneck_hw = (h, w)
        self.encoder_stack = ConvEncoder(
            self.conv_filters, self.conv_kernels, self.conv_strides,
            regularized=False, dtype=self.dtype,
        )
        self.vector_branch = InfoVectorDense(
            self.n_neurons, vocab_size=self.embed_vocab,
            embed_features=self.embed_features, dropout_rate=0.0,
            flatten=False, dtype=self.dtype,
        )
        self.bottleneck_dense = nn.Dense(h * w * 2, dtype=self.dtype)
        self.bottleneck_dropout = nn.Dropout(0.3)
        self.bottleneck_proj = nn.Conv(self.conv_filters[-1], (1, 1), dtype=self.dtype)
        self.quantizer = VectorQuantizer(
            num_embeddings=self.conv_filters[-1],
            embedding_dim=self.latent_space_dim, beta=self.beta,
        )
        # The quantized latent is already spatial (B, H, W, C); the decoder
        # consumes it directly (the reference's decoder-input declaration is
        # inconsistent with its encoder output — divergence recorded).
        self.decoder_stack = ConvTransposeDecoder(
            self._pre_latent, self.conv_filters, self.conv_kernels,
            self.conv_strides, output_activation="sigmoid",
            regularized=False, spatial_input=True, dtype=self.dtype,
        )

    def encode(self, spec, emb, *, training: bool = False):
        """Returns (quantized latent, vq_loss)."""
        x = self.encoder_stack(spec.astype(self.dtype), training=training)
        x = x.reshape((x.shape[0], -1))
        y = self.vector_branch(emb, training=training)
        h, w = self._bottleneck_hw
        z = self.bottleneck_dense(jnp.concatenate([x, y], axis=-1))
        z = self.bottleneck_dropout(z, deterministic=not training)
        z = z.reshape((z.shape[0], h, w, 2))
        z = self.bottleneck_proj(z).astype(jnp.float32)
        return self.quantizer(z)

    def decode(self, z, *, training: bool = False):
        return self.decoder_stack(z, training=training)

    def __call__(self, spec, emb, *, training: bool = False):
        quantized, vq_loss = self.encode(spec, emb, training=training)
        recon = self.decode(quantized, training=training)
        return recon, {"vq_loss": vq_loss}


__all__ = ["VQVAE", "VectorQuantizer"]
