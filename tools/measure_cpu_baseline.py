"""Measure the CPU reference-pipeline RIR synthesis throughput.

Reproduces the reference's eval hot path (rir_generation.py:160-308) on
host CPU: batched model forward (batch=4 as the reference uses) followed
by **per-sample** host NumPy post-processing (unpad -> denormalize ->
complex STFT -> iSTFT), which is how the reference spends its time
(librosa/NumPy per sample, SURVEY.md §3.4).

Writes bench_baseline.json consumed by bench.py's vs_baseline.
Run once: python tools/measure_cpu_baseline.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import scipy.signal


def _numpy_postprocess(feature: np.ndarray) -> np.ndarray:
    """Host NumPy unpad+denorm+iSTFT for ONE sample (reference-equivalent)."""
    amp = feature[:129, :151, 0]
    phase = feature[:129, :151, 1]
    amp = (amp * 100.0) - 100.0
    amp = (10.0 ** (amp / 20.0) - 1e-5) * 128.0
    phase = phase * 2 * math.pi - math.pi
    spec = amp * (np.cos(phase) + 1j * np.sin(phase))
    # librosa-equivalent iSTFT via scipy primitives (per-frame irfft + OLA)
    n_fft, win_len, hop = 256, 128, 64
    w = scipy.signal.get_window("hann", win_len, fftbins=True)
    w = np.pad(w, ((n_fft - win_len) // 2, (n_fft - win_len) // 2))
    frames = np.fft.irfft(spec.T, n=n_fft) * w
    n_frames = frames.shape[0]
    out = np.zeros(n_fft + hop * (n_frames - 1))
    wss = np.zeros_like(out)
    for i in range(n_frames):
        out[i * hop : i * hop + n_fft] += frames[i]
        wss[i * hop : i * hop + n_fft] += w**2
    out = np.where(wss > 1e-11, out / np.maximum(wss, 1e-11), out)
    return out[n_fft // 2 : -n_fft // 2]


def main() -> None:
    from unet_rir_tpu import models
    from unet_rir_tpu.train import init_model, make_forward

    batch = 4  # reference eval batch size (rir_generation.py:45)
    model = models.UNet()
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.uniform(0, 1, (batch, 144, 160, 2)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (batch, 2, 16)).astype(np.int32))
    variables = init_model(model, (spec, emb))
    forward = make_forward(model)

    # Warm-up compile
    np.asarray(forward(variables, spec, emb))

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = np.asarray(forward(variables, spec, emb))
        for j in range(batch):
            _numpy_postprocess(pred[j])
    dt = time.perf_counter() - t0
    rirs_per_sec = batch * iters / dt

    out = {
        "cpu_reference_rirs_per_sec": round(rirs_per_sec, 3),
        "method": "UNet fp32 forward (jax-cpu, batch=4) + per-sample NumPy "
                  "unpad/denorm/iSTFT, mirroring rir_generation.py:160-308",
        "measured_on": "this machine's host CPU",
    }
    path = os.path.join(os.path.dirname(__file__), "..", "bench_baseline.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
