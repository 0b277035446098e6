"""Shared encoder/decoder stacks for the AE-family models.

Capabilities of the reference's AE skeleton (autoencoder.py:205-417,
vae.py:380-472, vqvae.py:430-520, diff_vae.py:360-472) re-composed as flax
modules:

* `ConvEncoder`: Conv(f,k,s,SAME)+BN+ReLU per stage (encoder_conv_layer).
* `ConvTransposeDecoder`: Dense(prod(shape))+Dropout -> reshape -> stride-1
  transpose conv -> reversed stride transposes -> output transpose conv
  (decoder_conv_transpose_layer_*); head activation configurable
  (sigmoid for AE/VAE/VQVAE, linear for DiffVAE).
* `InfoVectorDense`: Embedding -> [Flatten] -> Dense (+Dropout), covering
  the per-model vector-branch variants (vocab/width/flatten/dropout knobs).

Reference quirk reproduced deliberately: VAE/VQVAE/DiffVAE conv stacks
carry no L2 regularizers; the plain Autoencoder's do (autoencoder.py:396).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unet_rir_tpu.models.layers import BN_EPS, BN_MOMENTUM

Dtype = Any


class InfoVectorDense(nn.Module):
    """Conditioning branch: Embed -> [Flatten] -> Dense -> [Dropout]."""

    out_features: int
    vocab_size: int = 2000
    embed_features: int = 256
    dropout_rate: float = 0.3  # 0 disables (VAE branch has no dropout)
    flatten: bool = True  # VQVAE/DiffVAE apply Dense on the unflattened embed
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, *, training: bool = False):
        e = nn.Embed(self.vocab_size, self.embed_features, dtype=self.dtype)(v)
        if self.flatten:
            e = e.reshape((e.shape[0], -1))
        e = nn.Dense(self.out_features, dtype=self.dtype)(e)
        if self.dropout_rate:
            e = nn.Dropout(self.dropout_rate, deterministic=not training)(e)
        return e.reshape((e.shape[0], -1))


class ConvEncoder(nn.Module):
    """Stacked Conv+BN+ReLU stages (autoencoder.py:382-402)."""

    conv_filters: Sequence[int] = (64, 128, 256, 512)
    conv_kernels: Sequence[int] = (3, 3, 3, 3)
    conv_strides: Sequence[int] = (2, 2, 2, 2)
    regularized: bool = True  # name convs reg_* so L2 applies (AE only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        prefix = "reg_enc" if self.regularized else "enc"
        for i, (f, k, s) in enumerate(
            zip(self.conv_filters, self.conv_kernels, self.conv_strides)
        ):
            x = nn.Conv(f, (k, k), strides=s, padding="SAME", dtype=self.dtype,
                        name=f"{prefix}_{i}")(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class ConvTransposeDecoder(nn.Module):
    """Dense -> reshape -> transpose-conv stack -> 2-channel head.

    `pre_latent_shape` is the encoder's final (H, W, C) — e.g. (9, 10, 512)
    for the 144x160 input with 4 stride-2 stages.
    """

    pre_latent_shape: tuple[int, int, int]
    conv_filters: Sequence[int] = (64, 128, 256, 512)
    conv_kernels: Sequence[int] = (3, 3, 3, 3)
    conv_strides: Sequence[int] = (2, 2, 2, 2)
    output_activation: str = "sigmoid"  # 'sigmoid' | 'linear'
    dense_dropout: float = 0.3
    regularized: bool = True
    spatial_input: bool = False  # True: z is already (B, H, W, C); skip Dense
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, training: bool = False):
        h, w, c = self.pre_latent_shape
        prefix = "reg_dec" if self.regularized else "dec"
        if self.spatial_input:
            x = z.astype(self.dtype)
        else:
            x = nn.Dense(h * w * c, dtype=self.dtype, name="decoder_dense")(z)
            if self.dense_dropout:
                x = nn.Dropout(self.dense_dropout, deterministic=not training)(x)
            x = x.reshape((x.shape[0], h, w, c))

        # First transpose conv, stride 1 (autoencoder.py:263-281).
        x = nn.ConvTranspose(self.conv_filters[-1],
                             (self.conv_kernels[-1], self.conv_kernels[-1]),
                             strides=(1, 1), padding="SAME", dtype=self.dtype,
                             name=f"{prefix}_t0")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        x = nn.relu(x)

        # Reversed stride-2 stack, stopping before the first layer
        # (autoencoder.py:283-316).
        n = len(self.conv_filters)
        for j, i in enumerate(reversed(range(1, n))):
            x = nn.ConvTranspose(self.conv_filters[i - 1],
                                 (self.conv_kernels[i - 1], self.conv_kernels[i - 1]),
                                 strides=(self.conv_strides[i - 1],) * 2,
                                 padding="SAME", dtype=self.dtype,
                                 name=f"{prefix}_t{j + 1}")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype)(x)
            x = nn.relu(x)

        # Output head: transpose conv to 2 channels with the first stage's
        # kernel/stride (autoencoder.py:318-334) — no regularizer.
        x = nn.ConvTranspose(2, (self.conv_kernels[0], self.conv_kernels[0]),
                             strides=(self.conv_strides[0],) * 2,
                             padding="SAME", dtype=self.dtype, name="head")(x)
        x = x.astype(jnp.float32)
        if self.output_activation == "sigmoid":
            return nn.sigmoid(x)
        return x


def pre_latent_shape(input_shape: tuple[int, int], strides: Sequence[int], last_filters: int):
    """Encoder output (H, W, C) after the stride stack."""
    h, w = input_shape
    for s in strides:
        h = -(-h // s)
        w = -(-w // s)
    return (h, w, last_filters)


__all__ = ["InfoVectorDense", "ConvEncoder", "ConvTransposeDecoder", "pre_latent_shape"]
