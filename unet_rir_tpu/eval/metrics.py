"""Evaluation metric suite — all computed on device, batched.

Exact definitions from the reference harness (rir_generation.py:31-40,
195-225; BASELINE.md table):

  MSE spectrogram   mean((spec_t - spec_p)^2) over the full (144,160,2)
  MSE magnitude     mean over the amplitude channel
  Phase loss        mean(1 - cos(phi_t - phi_p)) on denormalized radians
  MSE waveform      mean((wav_t - wav_p)^2), full and first 2400 samples
  Misalignment dB   20*log10(||x_p - x_t||_2 / ||x_t||_2), amp & waveform

The reference computes these per sample on host NumPy; here one jitted call
evaluates a whole batch on device and returns per-sample vectors so the
per-room aggregation stays a cheap host reduction.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

FIFTY_MS_SAMPLES = 2400  # 50 ms @ 48 kHz (rir_generation.py:218)


@jax.jit
def spectrogram_metrics(spec_true: jnp.ndarray, spec_pred: jnp.ndarray) -> dict:
    """Per-sample spectral metrics for (B, H, W, 2) normalized tensors."""
    amp_t, amp_p = spec_true[..., 0], spec_pred[..., 0]
    phase_t, phase_p = spec_true[..., 1], spec_pred[..., 1]

    mse_spec = jnp.mean(jnp.square(spec_true - spec_pred), axis=(1, 2, 3))
    mse_amp = jnp.mean(jnp.square(amp_t - amp_p), axis=(1, 2))
    t = phase_t * (2 * math.pi) - math.pi
    p = phase_p * (2 * math.pi) - math.pi
    pha = jnp.mean(1.0 - jnp.cos(t - p), axis=(1, 2))

    num = jnp.sqrt(jnp.sum(jnp.square(amp_p - amp_t), axis=(1, 2)))
    den = jnp.sqrt(jnp.sum(jnp.square(amp_t), axis=(1, 2)))
    missa_amp = 20.0 * jnp.log10(num / den)
    return {
        "mse_spectrogram": mse_spec,
        "mse_magnitude": mse_amp,
        "phase_1mcos": pha,
        "misalignment_magnitude_db": missa_amp,
    }


@jax.jit
def waveform_metrics(wav_true: jnp.ndarray, wav_pred: jnp.ndarray) -> dict:
    """Per-sample waveform metrics for (B, T) tensors."""
    mse = jnp.mean(jnp.square(wav_true - wav_pred), axis=-1)
    mse_50ms = jnp.mean(
        jnp.square(wav_true[..., :FIFTY_MS_SAMPLES] - wav_pred[..., :FIFTY_MS_SAMPLES]),
        axis=-1,
    )
    num = jnp.linalg.norm(wav_pred - wav_true, axis=-1)
    den = jnp.linalg.norm(wav_true, axis=-1)
    missa = 20.0 * jnp.log10(num / den)
    return {
        "mse_waveform": mse,
        "mse_waveform_50ms": mse_50ms,
        "misalignment_waveform_db": missa,
    }


@jax.jit
def log_spectral_distance(amp_true: jnp.ndarray, amp_pred: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-sample LSD in dB over linear magnitudes (B, F, T) — the
    north-star parity metric (BASELINE.json)."""
    lt = 20.0 * jnp.log10(jnp.maximum(amp_true, eps))
    lp = 20.0 * jnp.log10(jnp.maximum(amp_pred, eps))
    return jnp.mean(jnp.sqrt(jnp.mean(jnp.square(lt - lp), axis=1)), axis=-1)


@jax.jit
def log_spectral_distance_gated(
    amp_true: jnp.ndarray,
    amp_pred: jnp.ndarray,
    gate_db: float = 40.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Energy-gated LSD: average per-frame LSD only over time frames whose
    TRUE frame energy lies within `gate_db` of the sample's loudest frame.

    Plain LSD at wide analysis windows is dominated by near-silent late
    frames where the log distance saturates at the floor (RESULTS.md "1.3 s
    window" caveat) — a 1.3 s window's LSD is not comparable to a 0.2 s
    one. Gating restricts the average to frames that carry signal, the
    standard practice from speech coding (frames below the gate carry no
    perceptual information), making LSD comparable across window lengths.
    gate_db=inf (or very large) recovers the plain metric.

    Default 40 dB (energy), measured not guessed: the reference
    amplitude normalization floor (normalize.py: amp/128 + 1e-5 clipped
    at -100 dB) denormalizes near-floor frames to small RESIDUAL
    amplitudes whose frame energy sits ~55-58 dB below the loudest frame
    — a 60 dB gate admits that entire saturated tail, so at a 1.3 s
    window gated == plain LSD for every mid-T60 room (measured,
    RESULTS.md "1.3 s window"). 40 dB excludes the floor residual and
    matches the energy content of the reference's 0.2 s contract window
    (a 0.5-0.67 s-T60 room decays ~36-48 dB in energy by 0.2 s), making
    per-room gated LSD consistent across window lengths (measured:
    6.0-6.1 dB for every reverberant room at 1.3 s, same scale as the
    0.2 s plain metric).
    """
    lt = 20.0 * jnp.log10(jnp.maximum(amp_true, eps))
    lp = 20.0 * jnp.log10(jnp.maximum(amp_pred, eps))
    frame_lsd = jnp.sqrt(jnp.mean(jnp.square(lt - lp), axis=1))  # (B, T)
    energy = jnp.sum(jnp.square(amp_true), axis=1)  # (B, T)
    thr = jnp.max(energy, axis=-1, keepdims=True) * 10.0 ** (-gate_db / 10.0)
    gate = (energy >= thr).astype(frame_lsd.dtype)
    return jnp.sum(frame_lsd * gate, axis=-1) / jnp.maximum(
        jnp.sum(gate, axis=-1), 1.0)


def t60_estimate(wav: jnp.ndarray, fs: int = 48000,
                 noise_comp: bool = False) -> jnp.ndarray:
    """Batch T60 estimate via Schroeder backward integration + T20 fit.

    Used for T60-parity checks between synthesized and true RIRs.
    wav: (B, T) -> (B,) seconds.

    noise_comp applies Chu's noise-floor compensation (the ISO 3382
    recommendation): the per-sample noise energy, estimated from the final
    10% of the window, is subtracted from the backward integral before the
    dB fit. Use it ONLY when the analysis window extends well past the
    room's decay (tail = noise) — e.g. short-T60 rooms inside a 1.3 s
    window, where an uncompensated fit integrates ~1.25 s of prediction
    noise and inflates the estimate by an order of magnitude. When the
    decay fills the window (T60 ≳ window, the 0.2 s contract regime) the
    "tail" is real reverberant energy and compensation corrupts the fit —
    hence default off, matching the parity numbers recorded since round 1
    (measured both ways in RESULTS.md "1.3 s window").
    """
    energy = jnp.square(wav)
    # Schroeder curve: reversed cumulative sum of energy.
    sch = jnp.cumsum(energy[..., ::-1], axis=-1)[..., ::-1]
    if noise_comp:
        n = energy.shape[-1]
        tail = max(1, n // 10)
        noise_per_samp = jnp.mean(energy[..., n - tail:], axis=-1, keepdims=True)
        remaining = jnp.arange(n, 0, -1, dtype=energy.dtype)
        sch = jnp.maximum(sch - noise_per_samp * remaining, 1e-30)
    sch_db = 10.0 * jnp.log10(jnp.maximum(sch / jnp.maximum(sch[..., :1], 1e-20), 1e-20))

    t = jnp.arange(wav.shape[-1]) / fs

    def fit_one(db):
        # T20: fit between -5 and -25 dB, extrapolate to -60.
        mask = (db <= -5.0) & (db >= -25.0)
        w = mask.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0)
        tm = jnp.sum(w * t) / n
        dm = jnp.sum(w * db) / n
        cov = jnp.sum(w * (t - tm) * (db - dm))
        var = jnp.maximum(jnp.sum(w * jnp.square(t - tm)), 1e-12)
        slope = cov / var  # dB per second (negative)
        return -60.0 / jnp.minimum(slope, -1e-6)

    return jax.vmap(fit_one)(sch_db)


def parity_metrics(
    assembled: jnp.ndarray,
    spec_out: jnp.ndarray,
    wav_pred: jnp.ndarray,
    wav_true: jnp.ndarray,
    stft_shape: tuple[int, int],
    fs: int = 48000,
    noise_comp: bool = False,
    gate_db: float = 40.0,
) -> dict:
    """Per-sample north-star parity metrics (BASELINE.json: LSD + T60).

    Takes the NORMALIZED padded spectrograms the eval loop already holds
    ((B, Hp, Wp, 2) model grids), crops the zero-pad back to `stft_shape`
    and denormalizes the amplitude channel to linear magnitude before the
    LSD; T60 comes from the vocoded waveforms via the Schroeder T20 fit.
    Returns lsd_db, lsd_gated_db (energy-gated, see
    log_spectral_distance_gated), t60_true_s, t60_pred_s, t60_rel_err.
    """
    from unet_rir_tpu.ops.normalize import denormalize_amp

    fbins, frames = stft_shape
    amp_t = denormalize_amp(spec_out[:, :fbins, :frames, 0])
    amp_p = denormalize_amp(assembled[:, :fbins, :frames, 0])
    t60_t = t60_estimate(wav_true, fs=fs, noise_comp=noise_comp)
    t60_p = t60_estimate(wav_pred, fs=fs, noise_comp=noise_comp)
    return {
        "lsd_db": log_spectral_distance(amp_t, amp_p),
        "lsd_gated_db": log_spectral_distance_gated(amp_t, amp_p, gate_db),
        "t60_true_s": t60_t,
        "t60_pred_s": t60_p,
        "t60_rel_err": jnp.abs(t60_p - t60_t) / jnp.maximum(t60_t, 1e-6),
    }


__all__ = [
    "FIFTY_MS_SAMPLES",
    "spectrogram_metrics",
    "waveform_metrics",
    "log_spectral_distance",
    "log_spectral_distance_gated",
    "parity_metrics",
    "t60_estimate",
]
