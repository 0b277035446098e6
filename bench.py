"""Benchmark: RIRs synthesized per second per chip (flagship U-Net, fused).

Measures the BASELINE.json north-star metric: end-to-end RIR synthesis
throughput — U-Net forward + denormalize + unpad + iSTFT, fused in one
jitted XLA program; waveforms never leave HBM during the measurement.

Timing method: the remote-TPU tunnel makes `block_until_ready` unreliable
and gives every host readback a large fixed latency, so we iterate ON
DEVICE via `lax.scan` with a data dependency between iterations and do a
single scalar readback; throughput is derived from the *difference* of two
iteration counts, cancelling the fixed dispatch/readback latency. (Method
validated against a 4096^3 bf16 matmul measuring ~180 TFLOP/s on v5e,
consistent with hardware peak.)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rirs/sec/chip", "vs_baseline": N}

vs_baseline compares against the CPU reference-pipeline throughput in
bench_baseline.json (see tools/measure_cpu_baseline.py — UNet forward on
host CPU + per-sample NumPy unpad/denorm/iSTFT, mirroring the reference's
host-bound eval loop rir_generation.py:160-308).
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import time

import numpy as np

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
BATCH = 128  # measured sweet spot on v5e (64:7.4k, 128:11.9k, 256:10k, 512:9.4k rirs/s)
K_SMALL = 4
K_LARGE = 16


def _build(batch: int):
    import jax
    import jax.numpy as jnp

    from unet_rir_tpu import models
    from unet_rir_tpu.ops.features import defeaturize
    from unet_rir_tpu.train import init_model

    model = models.UNet(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.uniform(0, 1, (batch, 144, 160, 2)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (batch, 2, 16)).astype(np.int32))
    variables = init_model(model, (spec, emb))

    @functools.partial(jax.jit, static_argnames=("k",))
    def gen_k(variables, spec, emb, k: int):
        """Run the fused synthesis k times with a carried data dependency."""

        def body(carry, _):
            pred = model.apply(variables, carry, emb, training=False)
            wav = defeaturize(pred, algorithm="ph")
            # Full-reduction feedback: the carry depends on EVERY output
            # sample, so XLA cannot dead-code-eliminate any part of the
            # forward or the iSTFT. (A first-sample-only feedback — used
            # before round 2 — lets the compiler slice away most of the
            # overlap-add, overstating throughput.)
            carry = carry + wav.sum() * jnp.float32(1e-30)
            return carry, wav[:, 0]

        carry, outs = jax.lax.scan(body, spec, None, length=k)
        return outs.sum()

    return variables, spec, emb, gen_k


def bench_tpu(batch: int = BATCH) -> float:
    variables, spec, emb, gen_k = _build(batch)

    def run(k: int) -> float:
        t0 = time.perf_counter()
        s = float(gen_k(variables, spec, emb, k))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    run(K_SMALL)  # compile both variants
    run(K_LARGE)
    t_small = min(run(K_SMALL) for _ in range(3))
    t_large = min(run(K_LARGE) for _ in range(3))
    per_iter = (t_large - t_small) / (K_LARGE - K_SMALL)
    return batch / per_iter


class _Deadline(Exception):
    pass


@contextlib.contextmanager
def _deadline(budget_s: float):
    """SIGALRM-based deadline for slow-but-returning device calls (the
    observed tunnel failure mode: minutes-long readbacks that do return).
    Caveat: a call truly hung inside native code never re-enters the
    interpreter, so the handler cannot fire until it returns — a hard
    guarantee needs an external watchdog (the driver's own process timeout
    serves that role)."""
    import signal

    def _raise(signum, frame):
        raise _Deadline(f"exceeded {budget_s:.0f}s budget")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(budget_s))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def bench_train(budget_s: float = 420.0) -> dict:
    """Secondary: train-step throughput + MFU (VERDICT r1 item 5), using
    tools/measure_train_mfu.py's chained-step method. Never fatal."""
    try:
        with _deadline(budget_s):
            import sys

            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
            from measure_train_mfu import measure

            # batch 512, not 256: the two cells are MFU-equivalent on v5e
            # (512: 40.4% at 5.3% spread vs 256: 41.7% at 22.1% spread,
            # best-of-3 — RESULTS.md round-4 table), and the official
            # artifact should quote the reproducible cell, not the noisy
            # one (VERDICT r4 weak #3). 64: 21%, 128: 38%; remat/batch-1024
            # measured worse ("Intensity-raising experiments").
            r = measure(batch_size=512, bf16=True, filters=32,
                        peak_tflops=197e12)
            out = {"train_samples_per_sec": r["train_samples_per_sec"],
                   "train_spread_pct": r.get("train_spread_pct")}
            if "mfu_pct" in r:
                out["train_mfu_pct"] = r["mfu_pct"]  # best of 3
                out["train_mfu_pct_worst"] = r.get("mfu_pct_worst")
            return out
    except (Exception, _Deadline) as e:
        print(f"# train bench skipped: {e!r}", flush=True)
        return {}


def _wait_for_healthy_tunnel(max_wait_s: float = 420.0) -> None:
    """The tunnel degrades on a rough 30-60 min oscillation (CLAUDE.md);
    a bench launched inside a degraded window would burn every deadline
    and report 0.0. Spend up to max_wait_s probing for recovery first —
    a late valid number beats a fast zero."""
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < max_wait_s:
        if _tunnel_healthy():
            return
        print(f"# tunnel degraded; waiting for recovery "
              f"({time.perf_counter() - t0:.0f}s elapsed)", flush=True)
        time.sleep(45)


LADDER = ((BATCH, 420), (64, 300), (32, 240))


def run_ladder(bench_fn=None, wait_fn=None, ladder=LADDER) -> dict:
    """Attempt the headline batch, then descend the fallback ladder.

    BENCH_r04 halved the round's headline purely on tunnel weather: a
    degraded window blew the batch-128 budget and the ladder descended to
    64 without ever re-checking whether the tunnel had recovered (VERDICT
    r4 weak #2 / next #5). Policy now: after a FAILED headline attempt,
    re-run the health wait and retry the headline ONCE before descending.
    Returns {"value", "batch", "attempted_batches", "degraded_capture"};
    degraded_capture is True whenever the recorded batch is not the
    headline (the JSON then self-describes the fallback)."""
    bench_fn = bench_fn or bench_tpu
    wait_fn = wait_fn or _wait_for_healthy_tunnel
    headline = ladder[0][0]
    plan = list(ladder)
    attempted: list[int] = []
    retried_headline = False
    i = 0
    while i < len(plan):
        attempt_batch, budget_s = plan[i]
        attempted.append(attempt_batch)
        try:
            with _deadline(budget_s):
                value = bench_fn(attempt_batch)
            return {"value": value, "batch": attempt_batch,
                    "attempted_batches": attempted,
                    "degraded_capture": attempt_batch != headline}
        except (Exception, _Deadline) as e:  # compile/tunnel error or hang
            print(f"# bench attempt at batch {attempt_batch} failed: {e!r}",
                  flush=True)
            if attempt_batch == headline and not retried_headline:
                retried_headline = True
                print("# waiting for tunnel recovery, then retrying the "
                      "headline batch once before descending", flush=True)
                wait_fn()
                plan.insert(i + 1, (attempt_batch, budget_s))
        i += 1
    return {"value": None, "batch": None, "attempted_batches": attempted,
            "degraded_capture": True}


def main() -> None:
    # The remote-TPU tunnel occasionally degrades; wait briefly for a
    # healthy window, then retry (headline once after recovery, then
    # smaller batches) so a transient stall doesn't zero the round.
    _wait_for_healthy_tunnel()
    ladder_result = run_ladder()
    value, batch = ladder_result["value"], ladder_result["batch"]
    if value is None:
        print(json.dumps({
            "metric": "RIR synthesis throughput (U-Net fwd + iSTFT fused)",
            "value": 0.0,
            "unit": "rirs/sec/chip",
            "vs_baseline": None,
            "degraded_capture": True,
            "attempted_batches": ladder_result["attempted_batches"],
        }))
        return
    vs = None
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            ref = json.load(f).get("cpu_reference_rirs_per_sec")
        if ref:
            vs = value / ref
    record = {
        "metric": "RIR synthesis throughput (U-Net fwd + iSTFT fused, batch %d)" % batch,
        "value": round(value, 2),
        "unit": "rirs/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    if ladder_result["degraded_capture"]:
        # A fallback batch was recorded: say so in the artifact instead of
        # leaving the headline hostage to capture weather (VERDICT r4 #5).
        record["degraded_capture"] = True
        record["attempted_batches"] = ladder_result["attempted_batches"]
    # Only attempt the secondary train bench when the tunnel is healthy
    # right now (a trivial-op readback in seconds, not minutes): a degraded
    # transport would burn the remaining time for nothing.
    if _tunnel_healthy():
        record.update(bench_train())
    else:
        print("# train bench skipped: tunnel degraded (trivial-op probe slow)",
              flush=True)
    print(json.dumps(record))


def _tunnel_healthy(threshold_s: float = 20.0) -> bool:
    import jax
    import jax.numpy as jnp

    try:
        with _deadline(threshold_s * 2 + 40):
            # Untimed warm-up: the FIRST trivial op on a cold process pays
            # backend init + compile through the tunnel, which would
            # misclassify a healthy-but-cold start as degraded (round-2
            # advisor finding). The timed probe reuses the compiled program.
            assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]) == 8.0
            t0 = time.perf_counter()
            assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]) == 8.0
            return time.perf_counter() - t0 < threshold_s
    except (Exception, _Deadline):
        return False


if __name__ == "__main__":
    main()
