"""Measure small-request serving latency: batch buckets vs fixed batch.

VERDICT r2 item 5 asked for the tail-latency story behind
`RIRSynthesizer(buckets=...)`: the reference served at a fixed batch 4
(/root/reference/rir_generation.py:69-70); this repo's throughput batch is
128, so without buckets a 1-3 sample request executes a 128-wide program.
This tool measures, on the real chip:

1. Per-dispatch device latency of each bucket's compiled fused-synthesis
   program (U-Net fwd + iSTFT), via the tunnel-safe chained-scan method
   (bench.py): k iterations with a carried data dependency, one scalar
   readback, latency from the difference of two iteration counts.
2. End-to-end `RIRSynthesizer.synthesize` wall-clock for a small request
   routed through buckets vs padded to the fixed batch, with the probed
   per-readback tunnel constant subtracted (eval/generation.py method) —
   the host-visible number a serving client would see on local hardware.

Usage:  python tools/measure_serving_latency.py [--buckets 8 32 128]
Prints one JSON line with per-bucket ms and the small-request comparison.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_latency_per_dispatch(model, variables, batch: int,
                                k_small: int = 4, k_large: int = 16) -> float:
    """Per-iteration device latency (s) of the fused synthesis program at
    `batch`, tunnel-safe (chained lax.scan + single scalar readback)."""
    import jax
    import jax.numpy as jnp

    from unet_rir_tpu.ops.features import defeaturize

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.uniform(0, 1, (batch, 144, 160, 2)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (batch, 2, 16)).astype(np.int32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def gen_k(variables, spec, emb, k: int):
        def body(carry, _):
            pred = model.apply(variables, carry, emb, training=False)
            wav = defeaturize(pred, algorithm="ph")
            # Full-reduction feedback: no dead-code elimination possible.
            return carry + wav.sum() * jnp.float32(1e-30), wav[:, 0]

        _, outs = jax.lax.scan(body, spec, None, length=k)
        return outs.sum()

    def run(k: int) -> float:
        t0 = time.perf_counter()
        s = float(gen_k(variables, spec, emb, k))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    run(k_small)  # compile both variants
    run(k_large)
    t_small = min(run(k_small) for _ in range(3))
    t_large = min(run(k_large) for _ in range(3))
    return (t_large - t_small) / (k_large - k_small)


def probe_readback_constant() -> float:
    """Median wall-clock of a trivial scalar readback through the tunnel."""
    import jax.numpy as jnp

    float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0])  # warm-up/compile
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0])
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def request_wall_clock(synth, n_request: int, repeats: int = 5) -> float:
    """Best-of-N end-to-end synthesize() wall-clock for an n-sample request
    (compilation already done via warmup())."""
    rng = np.random.default_rng(1)
    spec = rng.uniform(0, 1, (n_request, 144, 160, 2)).astype(np.float32)
    emb = rng.integers(0, 1500, (n_request, 2, 16)).astype(np.int32)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, wavs = synth.synthesize(spec, emb)
        dt = time.perf_counter() - t0
        assert wavs.shape[0] == n_request and np.isfinite(wavs).all()
        best = min(best, dt)
    return best


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--buckets", type=int, nargs="*", default=[8, 32, 128])
    p.add_argument("--request", type=int, default=3,
                   help="small-request size for the end-to-end comparison")
    args = p.parse_args()

    import jax.numpy as jnp

    from unet_rir_tpu import models
    from unet_rir_tpu.serving import RIRSynthesizer
    from unet_rir_tpu.train import init_model

    model = models.UNet(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    spec0 = jnp.asarray(rng.uniform(0, 1, (2, 144, 160, 2)).astype(np.float32))
    emb0 = jnp.asarray(rng.integers(0, 1500, (2, 2, 16)).astype(np.int32))
    variables = init_model(model, (spec0, emb0))

    out: dict = {"buckets": args.buckets, "request_n": args.request}

    # 1. Per-bucket device latency (timing is weight-independent).
    for b in sorted(set(args.buckets)):
        ms = device_latency_per_dispatch(model, variables, b) * 1e3
        out[f"device_ms_batch_{b}"] = round(ms, 3)
        print(f"# bucket {b}: {ms:.3f} ms/dispatch (device)", flush=True)

    # 2. End-to-end small request: bucketed vs fixed throughput batch.
    readback = probe_readback_constant()
    out["readback_constant_ms"] = round(readback * 1e3, 1)
    fixed = RIRSynthesizer(model, variables, batch_size=max(args.buckets))
    fixed.warmup()
    bucketed = RIRSynthesizer(model, variables, buckets=tuple(args.buckets))
    bucketed.warmup()
    t_fixed = request_wall_clock(fixed, args.request)
    t_bucket = request_wall_clock(bucketed, args.request)
    assert bucketed.last_dispatch_sizes == [min(
        b for b in sorted(set(args.buckets)) if b >= args.request)]
    out["e2e_ms_fixed_batch"] = round(t_fixed * 1e3, 1)
    out["e2e_ms_bucketed"] = round(t_bucket * 1e3, 1)
    out["e2e_ms_fixed_batch_minus_readback"] = round((t_fixed - readback) * 1e3, 1)
    out["e2e_ms_bucketed_minus_readback"] = round((t_bucket - readback) * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
