"""Three-way feature-kernel bench: XLA-FFT vs XLA matmul-DFT vs Pallas.

Produces the RESULTS.md "Kernel-level wins" table. Timing uses the
chained-iteration method (bench.py docstring): k on-device iterations with
a data dependency, one scalar readback, per-op time from the difference of
two iteration counts (cancels dispatch/tunnel latency).

Usage:  python tools/bench_kernels.py [--batch 256] [--durations 0.2 0.4]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 8, 32


def _measure(fn, x, reps: int = 4) -> float:
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(x, k):
        def body(c, _):
            o = fn(c)
            # Full-reduction feedback: the carry depends on EVERY output
            # element, so XLA cannot dead-code-eliminate any part of the
            # op under test (a first-element-only feedback lets the
            # compiler slice away most of the computation).
            full = o.real.sum().astype(c.dtype) if jnp.iscomplexobj(o) \
                else o.sum().astype(c.dtype)
            return c + full * jnp.asarray(1e-30, c.dtype), full

        _, outs = jax.lax.scan(body, x, None, length=k)
        return outs.sum()

    def m(k):
        t0 = time.perf_counter()
        s = float(run_k(x, k))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    m(K1), m(K2)  # compile + warm
    a = min(m(K1) for _ in range(reps))
    b = min(m(K2) for _ in range(reps))
    return (b - a) / (K2 - K1)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--durations", type=float, nargs="*", default=[0.2, 0.4])
    args = p.parse_args()

    import importlib

    import jax.numpy as jnp

    S = importlib.import_module("unet_rir_tpu.ops.stft")
    F = importlib.import_module("unet_rir_tpu.ops.features")
    from unet_rir_tpu.ops.normalize import denormalize, normalize
    from unet_rir_tpu.ops.pad import crop_to, pad_to
    from unet_rir_tpu.ops.pallas.stft_pallas import featurize_pallas

    B = args.batch
    for dur in args.durations:
        N = int(round(dur * S.SAMPLE_RATE / S.HOP_LENGTH)) * S.HOP_LENGTH
        rng = np.random.default_rng(0)
        t = np.arange(N) / S.SAMPLE_RATE
        wav = jnp.asarray(
            (rng.standard_normal((B, N)) * np.exp(-t / 0.05)).astype(np.float32))
        shape = (S.N_BINS, 1 + N // S.HOP_LENGTH)
        n_out = S.HOP_LENGTH * (shape[1] - 1)
        feat = F.featurize(wav, use_pallas=False)

        def mk_feat(method):
            # Mirrors ops.features._featurize_jnp exactly (DC removal,
            # per-channel pad to the duration's model grid) with the DFT
            # method injected, so all three arms compute the same function.
            from unet_rir_tpu.ops.pad import model_shape_for

            grid = model_shape_for(shape)

            def f(w):
                w = w - jnp.mean(w, axis=-1, keepdims=True)
                amp, ph = S.stft_amp_phase(w, method=method)
                a, p_ = normalize(amp, ph)
                return jnp.stack(
                    [pad_to(a, grid), pad_to(p_, grid)], axis=-1)
            return f

        def mk_defeat(method):
            def f(ft):
                a = crop_to(ft[..., 0], shape)
                p_ = crop_to(ft[..., 1], shape)
                amp, ph = denormalize(a, p_)
                return S.istft(amp * jnp.exp(1j * ph), length=n_out, method=method)
            return f

        arms = [
            ("featurize/fft", mk_feat("fft"), wav),
            ("featurize/matmul", mk_feat("matmul"), wav),
            ("featurize/pallas", lambda w: featurize_pallas(w), wav),
            ("defeaturize/fft", mk_defeat("fft"), feat),
            ("defeaturize/matmul", mk_defeat("matmul"), feat),
        ]
        for name, fn, x in arms:
            try:
                per = _measure(fn, x)
                print(f"{dur:.1f}s {name}: {per * 1000:.3f} ms (B={B})", flush=True)
            except Exception as e:
                print(f"{dur:.1f}s {name}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
