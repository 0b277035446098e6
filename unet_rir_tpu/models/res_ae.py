"""Residual Autoencoder (ResAE).

Capability-parity with the reference ResAE (/root/reference/dl_models/
res_ae.py:280-530): every encoder stage is a residual *conv* block
(1x1-stride-s / kxk / 1x1 with a projected shortcut) followed by a
residual *identity* block, all LeakyReLU(0.3) + BN and L2(0.001)
regularized; the decoder mirrors it with transpose convs; the latent is
Dense(latent)+Dropout(0.3) on Flatten ⊕ vector branch (res_ae.py:523-530).

Shape note (documented divergence, SURVEY.md §7 hard part 3): the
reference's stride-2 1x1 transpose convs use Keras padding='valid', whose
output length is in*s + max(k-s, 0) = 2*in; we use padding='SAME' which
gives the same 2*in under XLA semantics.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unet_rir_tpu.models.ae_common import InfoVectorDense, pre_latent_shape
from unet_rir_tpu.models.layers import BN_EPS, BN_MOMENTUM

LEAKY_SLOPE = 0.3  # keras LeakyReLU default


class _ResStage(nn.Module):
    """One residual stage: projection block then identity block."""

    features: int
    kernel: int
    stride: int
    transpose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        conv = nn.ConvTranspose if self.transpose else nn.Conv
        stride2 = (self.stride, self.stride)

        def bn(h):
            return nn.BatchNorm(use_running_average=not training,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype)(h)

        f, k = self.features, self.kernel
        # Projection (res_conv / res_t_conv): 1x1 stride-s, kxk, 1x1 + shortcut.
        h = conv(f, (1, 1), strides=stride2, padding="SAME", dtype=self.dtype,
                 name="reg_proj1")(x)
        h = nn.leaky_relu(bn(h), LEAKY_SLOPE)
        h = conv(f, (k, k), padding="SAME", dtype=self.dtype, name="reg_proj2")(h)
        h = nn.leaky_relu(bn(h), LEAKY_SLOPE)
        h = bn(conv(f, (1, 1), padding="SAME", dtype=self.dtype, name="reg_proj3")(h))
        s = bn(conv(f, (1, 1), strides=stride2, padding="SAME", dtype=self.dtype,
                    name="reg_short")(x))
        x = nn.leaky_relu(h + s, LEAKY_SLOPE)

        # Identity (res_identity / res_t_identity): 1x1, kxk, 1x1 + input.
        h = conv(f, (1, 1), padding="SAME", dtype=self.dtype, name="reg_id1")(x)
        h = nn.leaky_relu(bn(h), LEAKY_SLOPE)
        h = conv(f, (k, k), padding="SAME", dtype=self.dtype, name="reg_id2")(h)
        h = nn.leaky_relu(bn(h), LEAKY_SLOPE)
        h = bn(conv(f, (1, 1), padding="SAME", dtype=self.dtype, name="reg_id3")(h))
        return nn.leaky_relu(h + x, LEAKY_SLOPE)


class ResAE(nn.Module):
    """(B,144,160,2)+(B,2,16)int -> (B,144,160,2) in [0,1]."""

    conv_filters: Sequence[int] = (32, 64, 128, 256)
    conv_kernels: Sequence[int] = (3, 3, 3, 3)
    conv_strides: Sequence[int] = (2, 2, 2, 2)
    latent_space_dim: int = 32
    n_neurons: int = 16 * 64
    input_hw: tuple[int, int] = (144, 160)
    embed_vocab: int = 2000
    embed_features: int = 256
    dtype: Any = jnp.float32

    L2_PATTERNS = ("reg_",)

    def setup(self):
        self._pre_latent = pre_latent_shape(
            self.input_hw, self.conv_strides, self.conv_filters[-1]
        )
        n = len(self.conv_filters)
        self.enc_stages = [
            _ResStage(self.conv_filters[i], self.conv_kernels[i],
                      self.conv_strides[i], dtype=self.dtype)
            for i in range(n)
        ]
        self.vector_branch = InfoVectorDense(
            self.n_neurons, vocab_size=self.embed_vocab,
            embed_features=self.embed_features, dropout_rate=0.3,
            dtype=self.dtype,
        )
        self.latent_dense = nn.Dense(self.latent_space_dim, dtype=self.dtype,
                                     name="e_out")
        self.latent_dropout = nn.Dropout(0.3)
        h, w, c = self._pre_latent
        self.decoder_dense = nn.Dense(h * w * c, dtype=self.dtype)
        self.decoder_dropout = nn.Dropout(0.3)
        # First transpose stage stride 1 at last filters, then reversed.
        self.dec_first = _ResStage(self.conv_filters[-1], self.conv_kernels[-1],
                                   1, transpose=True, dtype=self.dtype)
        # NOTE: kernels index [i] while filters/strides index [i-1] — this
        # mirrors the reference exactly (res_ae.py:304-306 passes
        # conv_kernels[layer_index] with conv_filters/strides[layer_index-1]);
        # only visible with heterogeneous kernel configs.
        self.dec_stages = [
            _ResStage(self.conv_filters[i - 1], self.conv_kernels[i],
                      self.conv_strides[i - 1], transpose=True, dtype=self.dtype)
            for i in reversed(range(1, n))
        ]
        self.head = nn.ConvTranspose(
            2, (self.conv_kernels[0], self.conv_kernels[0]),
            strides=(self.conv_strides[0],) * 2, padding="SAME",
            dtype=self.dtype, name="head",
        )

    def encode(self, spec, emb, *, training: bool = False):
        x = spec.astype(self.dtype)
        for stage in self.enc_stages:
            x = stage(x, training=training)
        x = x.reshape((x.shape[0], -1))
        y = self.vector_branch(emb, training=training)
        z = self.latent_dense(jnp.concatenate([x, y], axis=-1))
        return self.latent_dropout(z, deterministic=not training)

    def decode(self, z, *, training: bool = False):
        h, w, c = self._pre_latent
        x = self.decoder_dense(z)
        x = self.decoder_dropout(x, deterministic=not training)
        x = x.reshape((x.shape[0], h, w, c))
        x = self.dec_first(x, training=training)
        for stage in self.dec_stages:
            x = stage(x, training=training)
        return nn.sigmoid(self.head(x).astype(jnp.float32))

    def __call__(self, spec, emb, *, training: bool = False):
        return self.decode(self.encode(spec, emb, training=training), training=training)


__all__ = ["ResAE"]
