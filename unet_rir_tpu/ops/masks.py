"""Time-decaying sigmoid loss mask.

Equivalent of the reference `sigmoid(beta, dimensions)` helper
(/root/reference/preprocess.py:116-121, main_training.py:15-20): a flipped
logistic over the time-frame axis, tiled across frequency rows, optionally
multiplied into the phase loss so early (high-energy) frames dominate.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_mask(beta: float, dimensions: tuple[int, int]) -> jnp.ndarray:
    """(H, W) mask: flipped logistic 1/(1+exp(-(x+5)*beta)) over x in [-10, 10]."""
    h, w = dimensions
    x = jnp.linspace(-10.0, 10.0, w)
    z = 1.0 / (1.0 + jnp.exp(-(x + 5.0) * beta))
    z = jnp.flip(z)
    return jnp.tile(z, (h, 1))


__all__ = ["sigmoid_mask"]
