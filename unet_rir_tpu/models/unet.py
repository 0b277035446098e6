"""Conditional U-Net — the flagship RIR synthesis model.

TPU-native re-design of the reference UNet (/root/reference/dl_models/
u_net.py:201-321):

* 5 encoder stages: stride-1 stem at 32 filters, then stride-2 downs at
  64/128/256/512 — spatial path 144x160 -> 9x10 (u_net.py:213-226).
* Conditioning: Embedding(2000, 256) over the (2, 16) int info-vector ->
  Dense(9*10*16) -> Dropout(0.3) -> reshape (9, 10, 16) -> 1x1 conv to 512
  channels, **added** to the bottleneck (u_net.py:228-229, 253-263).
* 4 decoder stages: stride-2 transpose convs at 256/128/64/32 with skip
  concatenation and two conv blocks each (u_net.py:233-243, 291-321).
* Output head: 6x6 conv to 2 channels + sigmoid (u_net.py:247-249).
* `mode` 0-3 selects the per-stage feature block style (u_net.py:280-287).

Down/up convs that carry L2(0.001) penalties in the reference are named
with the ``reg_`` prefix for the loss collector. Compute dtype is
configurable (bfloat16 recommended on TPU); params stay float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from unet_rir_tpu.models.layers import VectorEmbed, mode_block


class UNet(nn.Module):
    """Inputs: spec (B, 144, 160, 2) float, emb (B, 2, 16) int -> (B, 144, 160, 2) in [0,1]."""

    number_filters_0: int = 32
    kernels: int = 3
    mode: int = 0
    batch_norm: bool = True
    embed_vocab: int = 2000
    embed_features: int = 256
    vector_channels: int = 16
    dtype: Any = jnp.float32

    # L2(0.001)-regularized layer name prefix (train/losses.l2_penalty).
    L2_PATTERNS = ("reg_",)

    @nn.compact
    def __call__(self, spec, emb, *, training: bool = False):
        f0 = self.number_filters_0
        k = (self.kernels, self.kernels)
        x = spec.astype(self.dtype)

        skips = []
        factors = (1, 2, 4, 8, 16)
        for i, factor in enumerate(factors):
            stride = 1 if i == 0 else 2
            x = nn.Conv(f0 * factor, k, strides=stride, padding="SAME",
                        dtype=self.dtype, name=f"reg_down_{i}")(x)
            x = mode_block(self.mode, f0 * factor, self.batch_norm, self.dtype)(
                x, training=training)
            skips.append(x)

        bottleneck = skips.pop()  # (B, 9, 10, 512)
        bh, bw = bottleneck.shape[1], bottleneck.shape[2]

        v = VectorEmbed(bh * bw * self.vector_channels,
                        vocab_size=self.embed_vocab,
                        embed_features=self.embed_features,
                        dropout_rate=0.3, dtype=self.dtype)(emb, training=training)
        v = v.reshape((v.shape[0], bh, bw, self.vector_channels))
        v = nn.Conv(f0 * factors[-1], (1, 1), dtype=self.dtype, name="vector_proj")(v)
        x = bottleneck + v

        for i, factor in enumerate(reversed(factors[:-1])):  # 8, 4, 2, 1
            x = nn.ConvTranspose(f0 * factor, k, strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"reg_up_{i}")(x)
            x = jnp.concatenate([skips.pop(), x], axis=-1)
            x = mode_block(0, f0 * factor, self.batch_norm, self.dtype)(
                x, training=training)  # skip-fusion conv (u_net.py:309-310)
            x = mode_block(self.mode, f0 * factor, self.batch_norm, self.dtype)(
                x, training=training)

        out = nn.Conv(2, (6, 6), padding="SAME", dtype=self.dtype, name="head")(x)
        return nn.sigmoid(out.astype(jnp.float32))


__all__ = ["UNet"]
