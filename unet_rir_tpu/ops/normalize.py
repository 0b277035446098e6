"""Amplitude/phase normalization with exact reference formulas.

Matches /root/reference/preprocess.py:21-41:
  amp_norm   = (20*log10(amp/128 + 1e-5) + 100) / 100
  phase_norm = (phase + pi) / (2*pi)
and the exact inverses (denormalized phase is additionally re-wrapped to
[-pi, pi), preprocess.py:39).

Pure jnp; works on any leading batch shape; jit/vmap friendly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

MAX_DB = 100.0
_EPS = 10.0 ** (-MAX_DB / 20.0)  # 1e-5
_AMP_SCALE = 128.0


def normalize_amp(amp: jnp.ndarray) -> jnp.ndarray:
    db = 20.0 * jnp.log10(amp / _AMP_SCALE + _EPS)
    return (db + MAX_DB) / MAX_DB


def denormalize_amp(amp_norm: jnp.ndarray) -> jnp.ndarray:
    db = amp_norm * MAX_DB - MAX_DB
    return (10.0 ** (db / 20.0) - _EPS) * _AMP_SCALE


def normalize_phase(phase: jnp.ndarray) -> jnp.ndarray:
    return (phase + math.pi) / (2.0 * math.pi)


def denormalize_phase(phase_norm: jnp.ndarray) -> jnp.ndarray:
    phase = phase_norm * 2.0 * math.pi - math.pi
    return wrap_phase(phase)


def wrap_phase(phase: jnp.ndarray) -> jnp.ndarray:
    """Wrap radians into [-pi, pi) (reference preprocess.py:39)."""
    return (phase + math.pi) % (2.0 * math.pi) - math.pi


def normalize(amp: jnp.ndarray, phase: jnp.ndarray):
    return normalize_amp(amp), normalize_phase(phase)


def denormalize(amp_norm: jnp.ndarray, phase_norm: jnp.ndarray):
    return denormalize_amp(amp_norm), denormalize_phase(phase_norm)


class Normalizer:
    """Object API kept for parity with the reference preprocess.Normalizer."""

    md = MAX_DB
    ep = _EPS

    @staticmethod
    def normalize(amp, phase):
        return normalize(amp, phase)

    @staticmethod
    def denormalize(amp_norm, phase_norm):
        return denormalize(amp_norm, phase_norm)


__all__ = [
    "MAX_DB",
    "normalize_amp",
    "denormalize_amp",
    "normalize_phase",
    "denormalize_phase",
    "wrap_phase",
    "normalize",
    "denormalize",
    "Normalizer",
]
