"""Static zero-padding of (129, 151) STFT grids to the (144, 160) model grid.

Equivalent of the reference TensorPadder (/root/reference/preprocess.py:60-113):
bottom/right zero-pad up to the desired shape, and a crop that inverts it.
Operates on the last two non-channel axes so it composes with batch and
channel dims; pure jnp, shape-static.

144 and 160 are both multiples of 16, so 4 stride-2 convs stay exact and
the last-dim padding keeps lanes reasonably utilized on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from unet_rir_tpu.ops.stft import N_BINS, N_FRAMES

MODEL_SHAPE = (144, 160)
STFT_SHAPE = (N_BINS, N_FRAMES)  # (129, 151)


def model_shape_for(stft_shape: tuple[int, int], multiple: int = 16) -> tuple[int, int]:
    """Smallest grid >= stft_shape with both dims divisible by `multiple`.

    16 keeps four stride-2 stages exact; the default 0.2 s RIR gives
    (129, 151) -> (144, 160). Longer RIRs widen the frame axis
    (SURVEY.md §5.7): e.g. 0.4 s -> (129, 301) -> (144, 304).
    """
    up = lambda v: -(-v // multiple) * multiple
    return (up(stft_shape[0]), up(stft_shape[1]))


def pad_to(x: jnp.ndarray, desired: tuple[int, int] = MODEL_SHAPE, axes: tuple[int, int] = (-2, -1)) -> jnp.ndarray:
    """Zero-pad axes to `desired` (bottom/right). No-op if already larger."""
    ax0, ax1 = [a % x.ndim for a in axes]
    p0 = max(0, desired[0] - x.shape[ax0])
    p1 = max(0, desired[1] - x.shape[ax1])
    if p0 == 0 and p1 == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[ax0] = (0, p0)
    pads[ax1] = (0, p1)
    return jnp.pad(x, pads)


def crop_to(x: jnp.ndarray, desired: tuple[int, int] = STFT_SHAPE, axes: tuple[int, int] = (-2, -1)) -> jnp.ndarray:
    """Crop axes back to `desired` (inverse of pad_to)."""
    ax0, ax1 = [a % x.ndim for a in axes]
    idx = [slice(None)] * x.ndim
    idx[ax0] = slice(0, desired[0])
    idx[ax1] = slice(0, desired[1])
    return x[tuple(idx)]


def pad_amp_phase(amp: jnp.ndarray, phase: jnp.ndarray, desired: tuple[int, int] = MODEL_SHAPE):
    return pad_to(amp, desired), pad_to(phase, desired)


def un_pad(amp: jnp.ndarray, phase: jnp.ndarray, desired: tuple[int, int] = STFT_SHAPE):
    return crop_to(amp, desired), crop_to(phase, desired)


class TensorPadder:
    """Object API kept for parity with the reference preprocess.TensorPadder."""

    def __init__(self, desired_shape: tuple[int, int] = MODEL_SHAPE):
        self.desired_shape = tuple(desired_shape)

    def pad_amp_phase(self, amp, phase):
        return pad_amp_phase(amp, phase, self.desired_shape)

    def transform(self, tensor):
        return pad_to(tensor, self.desired_shape)

    @staticmethod
    def un_pad(amp, phase, desired_shape):
        return un_pad(amp, phase, tuple(desired_shape))


__all__ = [
    "MODEL_SHAPE",
    "STFT_SHAPE",
    "model_shape_for",
    "pad_to",
    "crop_to",
    "pad_amp_phase",
    "un_pad",
    "TensorPadder",
]
