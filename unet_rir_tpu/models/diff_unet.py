"""Diff U-Net — phase-difference predicting U-Net variant.

Capability-parity with the reference DiffUNet (/root/reference/dl_models/
diff_u_net.py:200-300): identical topology to UNet but

* all encoder/decoder stage convs use kernel size 2 (hardcoded,
  diff_u_net.py:268, 296),
* the conditioning block is Embedding(1500,128) -> Flatten -> Dense(prod
  of the FULL bottleneck shape) -> Dropout(0.5) -> reshape, added to the
  bottleneck WITHOUT a 1x1 projection (diff_u_net.py:251-260),
* the head is a linear 1x1 conv so signed phase-differences can be
  emitted (diff_u_net.py:246-249).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_rir_tpu.models.layers import mode_block


class DiffUNet(nn.Module):
    """(B,144,160,2)+(B,2,16)int -> (B,144,160,2) unbounded (diff target)."""

    number_filters_0: int = 32
    kernels: int = 2  # stage conv kernel (reference hardcodes 2)
    mode: int = 0
    batch_norm: bool = True
    embed_vocab: int = 1500
    embed_features: int = 128
    dtype: Any = jnp.float32

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

        bottleneck = skips.pop()
        b, bh, bw, bc = bottleneck.shape

        v = nn.Embed(self.embed_vocab, self.embed_features, dtype=self.dtype)(emb)
        v = v.reshape((b, -1))
        v = nn.Dense(bh * bw * bc, dtype=self.dtype, name="encoder_inf_dense")(v)
        v = nn.Dropout(0.5, deterministic=not training)(v)
        x = bottleneck + v.reshape((b, bh, bw, bc))

        for i, factor in enumerate(reversed(factors[:-1])):
            x = nn.ConvTranspose(f0 * factor, k, strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"reg_up_{i}")(x)
            x = jnp.concatenate([skips.pop(), x], axis=-1)
            x = mode_block(0, f0 * factor, self.batch_norm, self.dtype)(
                x, training=training)
            x = mode_block(self.mode, f0 * factor, self.batch_norm, self.dtype)(
                x, training=training)

        return nn.Conv(2, (1, 1), dtype=self.dtype, name="head")(x).astype(jnp.float32)

    # Static loss helpers kept for API parity with the reference
    # (diff_u_net.py:385-426). The training engine uses train/losses.py;
    # these are the standalone metrics the reference exposes on the class.

    @staticmethod
    def mse_coef(y_true, y_pred):
        """Flattened MSE (diff_u_net.py:385-393)."""
        return jnp.mean(jnp.square(y_true.ravel() - y_pred.ravel()))

    @staticmethod
    def rmse_coef(y_true, y_pred):
        """Flattened RMSE with the reference's 1e-12 stabilizer
        (diff_u_net.py:395-403)."""
        d = y_true.ravel() - y_pred.ravel()
        return jnp.sqrt(jnp.mean(jnp.square(d)) + 1.0e-12)

    @staticmethod
    def rmse_coef_slicing(y_true, y_pred):
        """RMSE over the fixed [0,0,20,0]->[32,160,12,1] slice the reference
        hardcodes (diff_u_net.py:405-416)."""
        t = jax.lax.slice(y_true, (0, 0, 20, 0), (32, 160, 32, 1))
        p = jax.lax.slice(y_pred, (0, 0, 20, 0), (32, 160, 32, 1))
        return jnp.sqrt(jnp.mean(jnp.square(t.ravel() - p.ravel())))

    @staticmethod
    def l1_norm(y_true, y_pred):
        """Summed absolute error (diff_u_net.py:418-426)."""
        return jnp.sum(jnp.abs(y_true.ravel() - y_pred.ravel()))


__all__ = ["DiffUNet"]
