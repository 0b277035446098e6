"""bench.py fallback-ladder policy tests (VERDICT r4 #5).

The ladder logic is pure control flow around the (monkeypatched here)
device-bench call, so it tests without a TPU: a failed headline attempt
must trigger one recovery-wait + headline retry before descending, and a
recorded fallback batch must be self-described as a degraded capture.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _ladder():
    # Tiny budgets: every fake bench_fn returns/raises immediately.
    return ((128, 5), (64, 5), (32, 5))


def test_ladder_headline_first_try():
    calls = []

    def ok(batch):
        calls.append(batch)
        return 1000.0 * batch

    r = bench.run_ladder(bench_fn=ok, wait_fn=lambda: None, ladder=_ladder())
    assert r["value"] == 128000.0 and r["batch"] == 128
    assert r["attempted_batches"] == [128]
    assert r["degraded_capture"] is False
    assert calls == [128]


def test_ladder_retries_headline_after_recovery_wait():
    """One failed headline attempt -> wait_fn, then retry the SAME batch
    before descending (the BENCH_r04 failure mode)."""
    calls, waits = [], []

    def flaky(batch):
        calls.append(batch)
        if len(calls) == 1:
            raise RuntimeError("degraded window")
        return 94.0 * batch

    r = bench.run_ladder(bench_fn=flaky, wait_fn=lambda: waits.append(1),
                         ladder=_ladder())
    assert calls == [128, 128]
    assert waits == [1]  # exactly one recovery wait
    assert r["batch"] == 128 and r["value"] == 94.0 * 128
    assert r["attempted_batches"] == [128, 128]
    assert r["degraded_capture"] is False  # headline recovered: not degraded


def test_ladder_descends_after_two_headline_failures():
    calls = []

    def twice_bad(batch):
        calls.append(batch)
        if batch == 128:
            raise RuntimeError("still degraded")
        return 94.0 * batch

    r = bench.run_ladder(bench_fn=twice_bad, wait_fn=lambda: None,
                         ladder=_ladder())
    assert calls == [128, 128, 64]
    assert r["batch"] == 64
    assert r["attempted_batches"] == [128, 128, 64]
    assert r["degraded_capture"] is True  # fallback batch recorded


def test_ladder_all_fail():
    def bad(batch):
        raise RuntimeError("dead tunnel")

    r = bench.run_ladder(bench_fn=bad, wait_fn=lambda: None, ladder=_ladder())
    assert r["value"] is None and r["batch"] is None
    assert r["attempted_batches"] == [128, 128, 64, 32]
    assert r["degraded_capture"] is True


def test_ladder_deadline_interrupts_slow_attempt():
    """The SIGALRM deadline converts a slow-but-returning attempt into a
    ladder step (the observed tunnel failure mode)."""
    import time

    calls = []

    def slow_then_ok(batch):
        calls.append(batch)
        if len(calls) == 1:
            time.sleep(10)  # > the 1 s budget below
        return 94.0 * batch

    r = bench.run_ladder(bench_fn=slow_then_ok, wait_fn=lambda: None,
                         ladder=((128, 1), (64, 5)))
    assert r["batch"] == 128 and calls == [128, 128]
