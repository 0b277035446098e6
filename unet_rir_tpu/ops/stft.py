"""Device-side STFT / iSTFT / Griffin-Lim (signal layer L1).

TPU-native re-design of the reference's librosa-on-CPU featurization
(/root/reference/preprocess.py:13-18) and vocoding
(/root/reference/postprocess.py:116-133):

* All functions are pure jnp, shape-static, jit/vmap-friendly, and run on
  device — the reference round-trips every sample through host NumPy.
* The framing gather compiles to one XLA gather; rfft/irfft use the XLA FFT.
* Overlap-add exploits n_fft % hop == 0: frames whose index is congruent
  mod R=n_fft/hop never overlap, so iSTFT is R reshapes + a sum — no
  scatter, no serial loop.
* Griffin-Lim is a `lax.scan` of iSTFT/STFT projections with momentum
  (the fast GL variant librosa implements), fully on device.

Conventions match librosa defaults used by the reference: periodic Hann
window of `win_length` centered inside `n_fft`, `center=True` with reflect
padding, spectrum shape (..., 1 + n_fft//2, n_frames).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

# Reference signal constants (dataset.py:62-70).
N_FFT = 256
WIN_LENGTH = 128
HOP_LENGTH = 64
SAMPLE_RATE = 48000
DURATION = 0.2  # seconds
N_SAMPLES = int(SAMPLE_RATE * DURATION)  # 9600
N_BINS = 1 + N_FFT // 2  # 129
N_FRAMES = 1 + N_SAMPLES // HOP_LENGTH  # 151 (center=True)


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (fftbins=True), librosa's default analysis window."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _padded_window(n_fft: int, win_length: int, dtype=np.float32) -> np.ndarray:
    """Hann(win_length) zero-padded and centered to n_fft samples."""
    w = hann_window(win_length, dtype)
    lpad = (n_fft - win_length) // 2
    return np.pad(w, (lpad, n_fft - win_length - lpad))


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, frame_length)."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=None)
def _dft_tables(n_fft: int, win_length: int):
    """Windowed forward-DFT tables (n_fft, bins): X = f C + i f S.

    Used by the matmul transform path — on TPU a length-256 DFT as two real
    matmuls runs on the MXU, several times faster than the XLA FFT.
    """
    w = _padded_window(n_fft, win_length, np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    c = (w[:, None] * np.cos(ang)).astype(np.float32)
    s = (-w[:, None] * np.sin(ang)).astype(np.float32)
    return c, s


@functools.lru_cache(maxsize=None)
def _idft_tables(n_fft: int, win_length: int):
    """Inverse tables (bins, n_fft) with synthesis window, Hermitian
    weights and 1/n_fft folded in."""
    w = _padded_window(n_fft, win_length, np.float64)
    n_bins = 1 + n_fft // 2
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    weight = np.full((n_bins, 1), 2.0)
    weight[0] = weight[-1] = 1.0
    icr = (weight / n_fft * np.cos(ang) * w[None, :]).astype(np.float32)
    ici = (-weight / n_fft * np.sin(ang) * w[None, :]).astype(np.float32)
    return icr, ici


def _default_method() -> str:
    return "matmul" if jax.default_backend() == "tpu" else "fft"


@functools.partial(jax.jit, static_argnames=("n_fft", "win_length", "hop_length", "center", "pad_mode", "method"))
def stft(
    x: jnp.ndarray,
    n_fft: int = N_FFT,
    win_length: int = WIN_LENGTH,
    hop_length: int = HOP_LENGTH,
    center: bool = True,
    pad_mode: str = "reflect",
    method: str | None = None,
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., 1 + n_fft//2, n_frames).

    method: 'fft' (XLA FFT), 'matmul' (windowed-DFT matmuls on the MXU),
    or None = pick per backend.
    """
    if method is None:
        method = _default_method()
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    if method == "matmul":
        c, s = _dft_tables(n_fft, win_length)
        hi = jax.lax.Precision.HIGHEST
        re = jnp.einsum("...fn,nk->...kf", frames, jnp.asarray(c), precision=hi)
        im = jnp.einsum("...fn,nk->...kf", frames, jnp.asarray(s), precision=hi)
        return jax.lax.complex(re, im)
    window = jnp.asarray(_padded_window(n_fft, win_length))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def stft_amp_phase(x: jnp.ndarray, **kwargs) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(amplitude, phase) featurization (reference preprocess.py:13-18)."""
    spec = stft(x, **kwargs)
    return jnp.abs(spec), jnp.angle(spec)


def _ola_fixed_hop(frames_td: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Overlap-add (..., F, n_fft) -> (..., n_fft + hop*(F-1)).

    Requires n_fft % hop == 0. Frames with index r (mod R=n_fft/hop) tile the
    timeline without overlap, so the OLA is a sum of R reshaped groups —
    a fully vectorized XLA-friendly formulation (no scatter).
    """
    if n_fft % hop != 0:
        raise ValueError("OLA fast path requires n_fft % hop == 0")
    r_groups = n_fft // hop
    n_frames = frames_td.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)

    # Pad the frame axis so every residue class has the same group size.
    n_pad_frames = (-n_frames) % r_groups
    if n_pad_frames:
        pad = [(0, 0)] * (frames_td.ndim - 2) + [(0, n_pad_frames), (0, 0)]
        frames_td = jnp.pad(frames_td, pad)
    total = frames_td.shape[-2]
    per_group = total // r_groups

    batch_shape = frames_td.shape[:-2]
    out = jnp.zeros(batch_shape + (out_len,), frames_td.dtype)
    group_len = per_group * n_fft
    for r in range(r_groups):
        group = frames_td[..., r::r_groups, :].reshape(batch_shape + (group_len,))
        start = r * hop
        # Clip the flattened group into the valid output window.
        keep = min(group_len, out_len - start)
        pad = [(0, 0)] * len(batch_shape) + [(start, out_len - start - keep)]
        out = out + jnp.pad(group[..., :keep], pad)
    return out


def _window_sumsquare(n_frames: int, n_fft: int, win_length: int, hop: int) -> np.ndarray:
    """Envelope of summed squared synthesis windows (host-side constant)."""
    w2 = _padded_window(n_fft, win_length, np.float64) ** 2
    out = np.zeros(n_fft + hop * (n_frames - 1))
    for f in range(n_frames):
        out[f * hop : f * hop + n_fft] += w2
    return out


@functools.partial(jax.jit, static_argnames=("n_fft", "win_length", "hop_length", "center", "length", "method"))
def istft(
    spec: jnp.ndarray,
    n_fft: int = N_FFT,
    win_length: int = WIN_LENGTH,
    hop_length: int = HOP_LENGTH,
    center: bool = True,
    length: int | None = None,
    method: str | None = None,
) -> jnp.ndarray:
    """Inverse STFT of (..., bins, n_frames) -> (..., samples).

    librosa-compatible: synthesis window = analysis window, normalized by
    the window sum-of-squares envelope where it is numerically non-zero
    (reference postprocess.py:127-129 relies on this path).
    method: 'fft' | 'matmul' | None (per backend), as in stft().
    """
    if method is None:
        method = _default_method()
    n_frames = spec.shape[-1]
    if method == "matmul":
        icr, ici = _idft_tables(n_fft, win_length)
        hi = jax.lax.Precision.HIGHEST
        frames_td = jnp.einsum(
            "...kf,kn->...fn", spec.real, jnp.asarray(icr), precision=hi
        ) + jnp.einsum("...kf,kn->...fn", spec.imag, jnp.asarray(ici), precision=hi)
    else:
        window = jnp.asarray(_padded_window(n_fft, win_length))
        frames_td = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
        frames_td = frames_td * window
    y = _ola_fixed_hop(frames_td, n_fft, hop_length)

    wss = _window_sumsquare(n_frames, n_fft, win_length, hop_length)
    tiny = np.finfo(np.float32).tiny
    scale = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0).astype(np.float32)
    y = y * jnp.asarray(scale)

    if center:
        y = y[..., n_fft // 2 : y.shape[-1] - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


@functools.partial(
    jax.jit,
    static_argnames=("n_iter", "n_fft", "win_length", "hop_length", "momentum", "init", "method"),
)
def griffin_lim(
    amplitude: jnp.ndarray,
    n_iter: int = 32,
    n_fft: int = N_FFT,
    win_length: int = WIN_LENGTH,
    hop_length: int = HOP_LENGTH,
    momentum: float = 0.99,
    init: Literal["random", "zeros"] = "random",
    key: jax.Array | None = None,
    method: str | None = None,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction from magnitude, as a lax.scan.

    Device-native equivalent of librosa.griffinlim as used by the reference
    (postprocess.py:131): fast GL with momentum, 32 iterations. On TPU the
    64 inner transforms run as MXU matmuls (method='matmul').
    """
    kwargs = dict(n_fft=n_fft, win_length=win_length, hop_length=hop_length,
                  method=method)
    eps = 1e-16
    if init == "random" :
        if key is None:
            key = jax.random.key(0)
        phase = jax.random.uniform(key, amplitude.shape, minval=-np.pi, maxval=np.pi)
        angles = jnp.exp(1j * phase)
    else:
        angles = jnp.ones(amplitude.shape, jnp.complex64)

    def body(carry, _):
        angles, rebuilt_prev = carry
        inverse = istft(amplitude * angles, **kwargs)
        rebuilt = stft(inverse, **kwargs)
        tprev = rebuilt - (momentum / (1.0 + momentum)) * rebuilt_prev
        new_angles = tprev / (jnp.abs(tprev) + eps)
        return (new_angles, rebuilt), None

    (angles, _), _ = jax.lax.scan(
        body, (angles, jnp.zeros_like(angles)), None, length=n_iter
    )
    return istft(amplitude * angles, **kwargs)


__all__ = [
    "N_FFT",
    "WIN_LENGTH",
    "HOP_LENGTH",
    "SAMPLE_RATE",
    "DURATION",
    "N_SAMPLES",
    "N_BINS",
    "N_FRAMES",
    "hann_window",
    "frame_signal",
    "stft",
    "stft_amp_phase",
    "istft",
    "griffin_lim",
]
