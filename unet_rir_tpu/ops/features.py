"""End-to-end featurization / defeaturization pipelines (fused, on-device).

Composes the L1 ops into the two hot pipelines:

* `featurize(wav)`: wav (..., 9600) -> normalized padded 2-channel
  spectrogram (..., 144, 160, 2). This is the device-side equivalent of the
  reference host loop Loader.load -> FeatureExtractor.extract ->
  Normalizer.normalize -> TensorPadder.pad_amp_phase
  (/root/reference/dataset.py:214-223) — but batched and jit-fused.
* `defeaturize(feature)`: the inverse (reference postprocess.py:54-133):
  unpad -> denormalize -> A*exp(j*phi) -> iSTFT (or Griffin-Lim) -> wav,
  all on device; only the final host write leaves HBM.

Everything is shape-static: (129,151) STFT grid padded to (144,160).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unet_rir_tpu.ops.normalize import denormalize, normalize
from unet_rir_tpu.ops.pad import pad_amp_phase, un_pad
from unet_rir_tpu.ops.stft import N_SAMPLES, griffin_lim, istft, stft_amp_phase


@jax.jit
def featurize(wav: jnp.ndarray) -> jnp.ndarray:
    """wav (..., T) -> feature (..., 144, 160, 2) float32 in [0, 1]."""
    wav = wav - jnp.mean(wav, axis=-1, keepdims=True)  # DC removal (preprocess.py:56)
    amp, phase = stft_amp_phase(wav)
    amp_n, phase_n = normalize(amp, phase)
    amp_p, phase_p = pad_amp_phase(amp_n, phase_n)
    return jnp.stack([amp_p, phase_p], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("algorithm", "length"))
def defeaturize(
    feature: jnp.ndarray,
    algorithm: str = "ph",
    length: int | None = N_SAMPLES,
) -> jnp.ndarray:
    """feature (..., 144, 160, 2) -> wav (..., length).

    algorithm='ph' recombines predicted amplitude+phase; 'gl' discards the
    phase channel and runs Griffin-Lim (reference postprocess.py:127-131).
    """
    amp_p = feature[..., 0]
    phase_p = feature[..., 1]
    amp_n, phase_n = un_pad(amp_p, phase_p)
    amp, phase = denormalize(amp_n, phase_n)
    if algorithm == "ph":
        spec = amp * jnp.exp(1j * phase)
        return istft(spec, length=length)
    elif algorithm == "gl":
        return griffin_lim(amp)[..., :length]
    raise ValueError(f"unknown algorithm: {algorithm!r}")


__all__ = ["featurize", "defeaturize"]
