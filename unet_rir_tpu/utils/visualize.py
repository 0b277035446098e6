"""Diagnostic plots (matplotlib, headless Agg backend).

Capability-parity with the reference visualize.py (/root/reference/
visualize.py:9-175): wav and spectrogram plots plus the four side-by-side
true-vs-predicted diagnostic figures the eval loop saves every N samples
(rir_generation.py:295-308). One generic pair-grid helper replaces the
reference's four copy-paste variants.
"""

from __future__ import annotations

import os

import numpy as np

from unet_rir_tpu.ops.stft import SAMPLE_RATE


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    return plt


def create_directory_if_none(dir_path: str) -> None:
    os.makedirs(dir_path, exist_ok=True)


def _squeeze2d(a):
    a = np.asarray(a)
    return a[..., 0] if a.ndim == 3 else a


def _draw_spec(ax, stft, title):
    stft = _squeeze2d(stft)
    h, w = stft.shape
    x = np.linspace(0, stft.size, num=w, dtype=int)
    ax.pcolormesh(x, range(h), stft)
    ax.set_title(title)


def _draw_wav(ax, signal, title):
    signal = np.asarray(signal)
    t = np.linspace(0, len(signal) / SAMPLE_RATE, num=len(signal))
    ax.plot(t, signal)
    ax.set_title(title)


def _suptitle(model, characteristics):
    c = list(characteristics)
    return f"Model {model}: {c[0]} {c[1]} {c[2]} L{c[3]} M{c[4]}"


def _save_grid(panels, model, characteristics, path):
    """panels: list of ('wav'|'spec', data, title)."""
    plt = _plt()
    fig, axes = plt.subplots(len(panels), figsize=(12, 4 * len(panels)))
    if len(panels) == 1:
        axes = [axes]
    for ax, (kind, data, title) in zip(axes, panels):
        (_draw_wav if kind == "wav" else _draw_spec)(ax, data, title)
    fig.suptitle(_suptitle(model, characteristics))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def plot_wav(signal, path: str | None = None):
    plt = _plt()
    fig, ax = plt.subplots()
    _draw_wav(ax, signal, "Wav")
    if path:
        fig.savefig(path)
    plt.close(fig)


def plot_spec(stft, path: str | None = None):
    plt = _plt()
    fig, ax = plt.subplots()
    _draw_spec(ax, stft, "Spectrogram")
    if path:
        fig.savefig(path)
    plt.close(fig)


def plot_feature_vs_wav(stft, signal, model, characteristics, path):
    _save_grid([("wav", signal, "Wav"), ("spec", stft, "Spectogram")],
               model, characteristics, path)


def plot_feature_vs_feature_wav(signal, stft_true, stft_pred, model, characteristics, path):
    _save_grid(
        [("wav", signal, "Wav true"), ("spec", stft_true, "Spectogram true"),
         ("spec", stft_pred, "Spectogram pred")],
        model, characteristics, path,
    )


def plot_phase_vs_phase(phase_true, phase_pred, model, characteristics, path):
    _save_grid(
        [("spec", phase_true, "Phase true"), ("spec", phase_pred, "Phase pred")],
        model, characteristics, path,
    )


def plot_wav_vs_wav(wav_true, wav_pred, model, characteristics, path):
    _save_grid(
        [("wav", wav_true, "Wav true"), ("wav", wav_pred, "Wav pred")],
        model, characteristics, path,
    )


__all__ = [
    "create_directory_if_none",
    "plot_wav",
    "plot_spec",
    "plot_feature_vs_wav",
    "plot_feature_vs_feature_wav",
    "plot_phase_vs_phase",
    "plot_wav_vs_wav",
]
