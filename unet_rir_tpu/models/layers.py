"""Shared flax building blocks for the conditional conv model zoo.

These reproduce the *capabilities* of the reference's Keras block helpers
(u_net.py:324-386, autoencoder.py:356-417) in idiomatic flax.linen:

* NHWC layout throughout (TPU conv-friendly).
* BatchNorm uses Keras-default momentum/epsilon so loss curves are
  comparable. Under data parallelism, batch statistics are GLOBAL: the
  DP path is jit + GSPMD (global-view SPMD), so the batch-axis mean/var
  inside nn.BatchNorm is computed over the full global batch and XLA
  inserts the cross-chip collectives automatically — sync-BN for free
  (verified: tests/test_parallel.py::test_dp_with_batchnorm_matches_
  single_device). This is a deliberate improvement over the reference,
  whose Keras MirroredStrategy BN is per-replica (SURVEY.md §7 hard
  part 4); it makes DP loss curves exactly device-count-invariant.
* A configurable compute dtype (bfloat16 on TPU) with float32 params.
* Conv layers that carry L2(0.001) weight penalties in the reference are
  given the name prefix ``reg_`` so the loss layer can collect them
  (see train/losses.py:l2_penalty).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# Keras BatchNormalization defaults (the reference never overrides them).
BN_MOMENTUM = 0.99
BN_EPS = 1e-3


class ConvBNRelu(nn.Module):
    """Conv -> [BN] -> ReLU (reference convolutional_block_1, u_net.py:364-371)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=self.strides, padding="SAME", dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.relu(x)


class DoubleConvBNRelu(nn.Module):
    """Two stacked ConvBNRelu (reference convolutional_block_2, u_net.py:373-386)."""

    features: int
    kernel_size: int = 3
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = ConvBNRelu(self.features, self.kernel_size, 1, self.batch_norm, self.dtype)(x, training=training)
        x = ConvBNRelu(self.features, self.kernel_size, 1, self.batch_norm, self.dtype)(x, training=training)
        return x


class ResidualAddBlock(nn.Module):
    """conv-BN-relu x2 with identity shortcut (reference residual_block_1, u_net.py:324-339)."""

    features: int
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        h = ConvBNRelu(self.features, 3, 1, self.batch_norm, self.dtype)(x, training=training)
        h = ConvBNRelu(self.features, 3, 1, self.batch_norm, self.dtype)(h, training=training)
        return h + x


class ResidualTwoPathBlock(nn.Module):
    """Two conv paths summed (reference residual_block_2, u_net.py:341-361)."""

    features: int
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        h = ConvBNRelu(self.features, 3, 1, self.batch_norm, self.dtype)(x, training=training)
        h = ConvBNRelu(self.features, 3, 1, self.batch_norm, self.dtype)(h, training=training)
        s = ConvBNRelu(self.features, 3, 1, self.batch_norm, self.dtype)(x, training=training)
        return h + s


def mode_block(mode: int, features: int, batch_norm: bool, dtype: Dtype) -> nn.Module:
    """Feature-extraction block selected by `mode` (u_net.py:280-287)."""
    if mode == 0:
        return ConvBNRelu(features, 3, 1, batch_norm, dtype)
    if mode == 1:
        return DoubleConvBNRelu(features, 3, batch_norm, dtype)
    if mode == 2:
        return ResidualAddBlock(features, batch_norm, dtype)
    if mode == 3:
        return ResidualTwoPathBlock(features, batch_norm, dtype)
    raise ValueError(f"unknown mode {mode}")


class VectorEmbed(nn.Module):
    """Conditioning-vector branch: Embedding -> Flatten -> Dense -> Dropout.

    Shared skeleton of the reference vector blocks (u_net.py:253-263,
    autoencoder.py:356-368). Input is an int array (B, 2, 16); output is a
    flat (B, out_features) activation (callers reshape as needed).
    """

    out_features: int
    vocab_size: int = 2000
    embed_features: int = 256
    dropout_rate: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, *, training: bool = False):
        e = nn.Embed(self.vocab_size, self.embed_features, dtype=self.dtype)(v)
        e = e.reshape((e.shape[0], -1))
        e = nn.Dense(self.out_features, dtype=self.dtype)(e)
        e = nn.Dropout(self.dropout_rate, deterministic=not training)(e)
        return e


__all__ = [
    "BN_MOMENTUM",
    "BN_EPS",
    "ConvBNRelu",
    "DoubleConvBNRelu",
    "ResidualAddBlock",
    "ResidualTwoPathBlock",
    "mode_block",
    "VectorEmbed",
]
