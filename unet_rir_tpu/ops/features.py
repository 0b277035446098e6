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

Dispatch (measured on v5e, B=256 — RESULTS.md "Kernel-level wins"): the
default path is the pure-jnp pipeline whose DFTs are MXU matmuls
(ops.stft method='matmul' on TPU) — XLA fuses the window/normalize/pad
elementwise chain into the matmuls and it beats the XLA-FFT path (~2x)
everywhere and the fused Pallas featurize kernel at the 0.2 s grid. At
wide grids (F >= 301 frames, i.e. durations >= 0.4 s) the Pallas kernel
measured ahead (1.01 vs 1.09 ms at 0.4 s), so `featurize` auto-dispatches
to it on TPU there; `use_pallas=True/False` forces either path. The
defeaturize twin kernel lost in every measured cell and was removed
(VERDICT r2 item 8) — `use_pallas` on `defeaturize` is no longer
accepted; the jnp matmul-DFT path IS the fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unet_rir_tpu.ops.normalize import denormalize, normalize
from unet_rir_tpu.ops.pad import STFT_SHAPE, crop_to, model_shape_for, pad_to
from unet_rir_tpu.ops.stft import HOP_LENGTH, N_BINS, griffin_lim, istft, stft_amp_phase


def _featurize_jnp(wav: jnp.ndarray) -> jnp.ndarray:
    wav = wav - jnp.mean(wav, axis=-1, keepdims=True)  # DC removal (preprocess.py:56)
    amp, phase = stft_amp_phase(wav)
    # Pad to the smallest /16 grid for this duration ((144,160) at 0.2 s).
    grid = model_shape_for((amp.shape[-2], amp.shape[-1]))
    amp_n, phase_n = normalize(amp, phase)
    return jnp.stack(
        [pad_to(amp_n, grid), pad_to(phase_n, grid)], axis=-1
    ).astype(jnp.float32)


# Frame count from which the fused Pallas featurize kernel measures ahead
# of the XLA matmul-DFT path on TPU (0.4 s grid; RESULTS.md three-way).
_PALLAS_MIN_FRAMES = 301


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def featurize(wav: jnp.ndarray, use_pallas: bool | None = None) -> jnp.ndarray:
    """wav (..., T) -> feature (..., H, W, 2) float32 in [0, 1].

    H, W = model_shape_for the duration's STFT grid ((144, 160) at 0.2 s).
    use_pallas=None auto-dispatches: the fused kernel on TPU at wide grids
    (>= 0.4 s), the XLA matmul-DFT path otherwise (module docstring).
    """
    n = wav.shape[-1]
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and 1 + n // HOP_LENGTH >= _PALLAS_MIN_FRAMES
        )
    if use_pallas and n % HOP_LENGTH == 0 and wav.ndim >= 2:
        from unet_rir_tpu.ops.pallas.stft_pallas import featurize_pallas

        grid = model_shape_for((N_BINS, 1 + n // HOP_LENGTH))
        lead = wav.shape[:-1]
        flat = wav.reshape((-1, n))
        return featurize_pallas(flat).reshape(lead + grid + (2,))
    return _featurize_jnp(wav)


def _defeaturize_jnp(feature, algorithm, length, stft_shape=STFT_SHAPE,
                     gl_iters=32):
    amp_p = feature[..., 0]
    phase_p = feature[..., 1]
    amp_n = crop_to(amp_p, stft_shape)
    phase_n = crop_to(phase_p, stft_shape)
    amp, phase = denormalize(amp_n, phase_n)
    if algorithm == "ph":
        spec = amp * jnp.exp(1j * phase)
        return istft(spec, length=length)
    elif algorithm == "gl":
        return griffin_lim(amp, n_iter=gl_iters)[..., :length]
    raise ValueError(f"unknown algorithm: {algorithm!r}")


@functools.partial(jax.jit,
                   static_argnames=("algorithm", "length", "stft_shape",
                                    "gl_iters"))
def defeaturize(
    feature: jnp.ndarray,
    algorithm: str = "ph",
    length: int | None = None,
    stft_shape: tuple[int, int] = STFT_SHAPE,
    gl_iters: int = 32,
) -> jnp.ndarray:
    """feature (..., H, W, 2) -> wav (..., length).

    algorithm='ph' recombines predicted amplitude+phase; 'gl' discards the
    phase channel and runs Griffin-Lim (reference postprocess.py:127-131;
    `gl_iters` == its librosa n_iter=32 default, exposed so the
    reconstruction-quality/cost trade can be measured).
    For non-default durations pass the unpadded `stft_shape`
    (n_bins, n_frames); `length` defaults to hop*(n_frames-1).
    """
    if length is None:
        length = HOP_LENGTH * (stft_shape[1] - 1)
    return _defeaturize_jnp(feature, algorithm, length, stft_shape, gl_iters)


__all__ = ["featurize", "defeaturize"]
