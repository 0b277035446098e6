"""Small CNN spectrogram classifier (room/zone experiments).

Capability-parity with the reference deep_CNN (/root/reference/dl_models/
cnn_clas.py:19-53): 3x [Conv(valid)+BN+AvgPool/GAP] stages -> Dense(256)
+BN+Dropout(0.5) -> softmax head. Returns logits; apply softmax/
cross-entropy in the caller (optax.softmax_cross_entropy).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from unet_rir_tpu.models.layers import BN_EPS, BN_MOMENTUM


class DeepCNN(nn.Module):
    n_classes: int = 6
    batch_norm: bool = True
    dtype: Any = jnp.float32

    L2_PATTERNS = ()

    @nn.compact
    def __call__(self, spec, emb=None, *, training: bool = False):
        def bn(h):
            if not self.batch_norm:
                return h
            return nn.BatchNorm(use_running_average=not training,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype)(h)

        x = spec.astype(self.dtype)
        for filters in (16, 32):
            x = nn.relu(nn.Conv(filters, (3, 3), padding="VALID", dtype=self.dtype)(x))
            x = bn(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype)(x))
        x = bn(x)
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D
        x = nn.relu(nn.Dense(256, dtype=self.dtype)(x))
        x = bn(x)
        x = nn.Dropout(0.5, deterministic=not training)(x)
        return nn.Dense(self.n_classes, dtype=self.dtype)(x).astype(jnp.float32)


__all__ = ["DeepCNN"]
