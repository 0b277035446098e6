"""Measure U-Net train-step throughput and MFU on the real TPU chip.

The reference times whole training epochs with wall-clock prints
(/root/reference/main_training.py:335-339, 366); this tool produces the
TPU-native equivalent with a tunnel-safe method:

* Steps are chained ON DEVICE through the fused lax.scan epoch
  (train.make_train_epoch) so the host dispatches once; completion is
  forced by the scalar metric readback.
* steps/sec comes from the *difference* of two chained step counts,
  cancelling the fixed dispatch + tunnel readback latency (same method as
  bench.py, validated against a known-TFLOP matmul).
* FLOPs/step are taken from XLA's compiled cost analysis of the single
  train step (forward + backward + optimizer); MFU = flops_per_step *
  steps_per_sec / chip peak. Peak defaults to v5e bf16 (197 TFLOP/s);
  pass --peak-tflops for other chips or f32 runs.

Usage:
  python tools/measure_train_mfu.py [--batch 64] [--bf16] [--filters 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
K_SMALL, K_LARGE = 2, 8


def step_flops(model, optimizer, loss_cfg, batch, variables,
               accum_steps: int = 1) -> float | None:
    """FLOPs of one compiled train step (fwd+bwd+opt) via XLA cost analysis.

    Always compiled WITHOUT remat: rematerialization recomputes the forward
    in the backward pass, and counting those replayed FLOPs as useful work
    would inflate MFU — the honest numerator is the math the model needs,
    the honest denominator is however long the (possibly remat) run took."""
    import jax

    from unet_rir_tpu import train

    step = train.make_train_step(model, optimizer, loss_cfg,
                                 accum_steps=accum_steps)
    state = train.TrainState.create(variables, optimizer)
    try:
        compiled = step.lower(state, batch, jax.random.key(0), 1e-4).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"# cost_analysis unavailable: {e!r}")
        return None


def measure(batch_size: int, bf16: bool, filters: int, peak_tflops: float,
            loss_family: str = "blend", remat: bool = False,
            accum_steps: int = 1, pad_stem_to: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from unet_rir_tpu import models, train
    from unet_rir_tpu.train.losses import LossConfig

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = models.UNet(number_filters_0=filters, dtype=dtype)
    if pad_stem_to:
        # Architectural lever (VERDICT r4 item 4): the stem conv contracts
        # only 2*k*k = 18 input values per output — a tiny K dim for the
        # 128-wide MXU. Zero-padding the input to `pad_stem_to` channels
        # inside the model is mathematically a no-op for the whole training
        # trajectory (zero inputs give zero activations AND zero gradients
        # for the extra kernel columns), but changes how XLA can tile the
        # stem. MFU numerator stays the UNPADDED step's FLOPs (the useful
        # math) — see step_flops usage below.
        import flax.linen as nn

        class PaddedStemUNet(models.UNet):
            pad_to: int = pad_stem_to

            @nn.compact
            def __call__(self, spec, emb, *, training: bool = False):
                pad = self.pad_to - spec.shape[-1]
                if pad > 0:
                    spec = jnp.pad(spec, ((0, 0), (0, 0), (0, 0), (0, pad)))
                return models.UNet.__call__(self, spec, emb, training=training)

        timed_model = PaddedStemUNet(number_filters_0=filters, dtype=dtype)
    else:
        timed_model = model
    rng = np.random.default_rng(0)
    # A batch-sized "corpus" reused every chained step: the gather is the
    # same work the real epoch does, with O(batch) memory.
    features = jnp.asarray(rng.uniform(0, 1, (batch_size, 144, 160, 2)).astype(np.float32))
    embeddings = jnp.asarray(rng.integers(0, 1500, (batch_size, 16)).astype(np.int32))
    emb2 = jnp.stack([embeddings, embeddings], axis=1)
    batch = (features, emb2, features)

    loss_cfg = LossConfig(family=loss_family)
    opt = train.build_optimizer("adam", 1e-4)
    # FLOPs always from the UNPADDED model (the useful math); time from the
    # padded variant when --pad-stem is set.
    flops = step_flops(model, opt, loss_cfg, batch,
                       train.init_model(model, batch), accum_steps)
    variables = train.init_model(timed_model, batch)

    epoch_fn = train.make_train_epoch(timed_model, opt, loss_cfg, remat=remat,
                                      accum_steps=accum_steps)

    def run(k: int) -> float:
        state = train.TrainState.create(
            jax.tree.map(jnp.copy, variables), opt)
        idx = jnp.tile(jnp.arange(batch_size, dtype=jnp.int32), (k, 1))
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state, features, embeddings, idx, idx,
                                  jax.random.key(0), 1e-4)
        loss = float(metrics["loss"])  # scalar readback = completion barrier
        assert np.isfinite(loss), loss
        return time.perf_counter() - t0

    run(K_SMALL)  # compile
    run(K_LARGE)
    # Three INDEPENDENT per-step estimates: the tunnel adds minute-scale
    # drift between samples (RESULTS.md documents a 42.9-48.0% MFU band at
    # batch 256), so one sample reads as a regression across rounds. Report
    # best-of-3 plus the spread so drivers can tell variance from change
    # (VERDICT r2 weak #5).
    smalls, larges, estimates = [], [], []
    for _ in range(3):
        t_small = min(run(K_SMALL) for _ in range(2))
        t_large = min(run(K_LARGE) for _ in range(2))
        smalls.append(t_small)
        larges.append(t_large)
        estimates.append((t_large - t_small) / (K_LARGE - K_SMALL))
    # Headline = min of each LEG across all repeats, not min of the three
    # differences: a repeat whose small leg stalled (tunnel degradation)
    # but whose large leg ran clean yields a too-small — even negative —
    # difference, and min-of-differences would select exactly that
    # artifact. min-of-legs only pairs clean runs with clean runs.
    per_step = (min(larges) - min(smalls)) / (K_LARGE - K_SMALL)
    assert per_step > 0, (smalls, larges)
    spread_pct = round(
        100.0 * (max(estimates) - min(estimates)) / per_step, 1)
    samples_per_sec = batch_size / per_step
    out = {
        "batch_size": batch_size,
        "dtype": "bfloat16" if bf16 else "float32",
        "filters": filters,
        "remat": remat,
        "accum_steps": accum_steps,
        "pad_stem_to": pad_stem_to,
        "step_time_s": round(per_step, 6),
        "train_samples_per_sec": round(samples_per_sec, 1),
        "train_spread_pct": spread_pct,
        "method": "chained lax.scan steps, two-count difference, scalar "
                  "readback; best of 3 independent estimates",
    }
    if flops is not None:
        out["flops_per_step"] = flops
        out["mfu_pct"] = round(100.0 * flops / per_step / peak_tflops, 2)
        out["mfu_pct_worst"] = round(
            100.0 * flops / max(estimates) / peak_tflops, 2)
        out["peak_tflops"] = peak_tflops / 1e12
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--peak-tflops", type=float, default=V5E_BF16_PEAK / 1e12)
    p.add_argument("--loss-family", default="blend")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forward in backward (MFU numerator "
                        "stays the no-remat FLOPs — see step_flops)")
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--pad-stem", type=int, default=0,
                   help="zero-pad the model input to N channels inside the "
                        "model (function-identical; tests whether a wider "
                        "stem contraction tiles the MXU better — MFU "
                        "numerator stays the unpadded FLOPs)")
    args = p.parse_args()
    result = measure(args.batch, args.bf16, args.filters,
                     args.peak_tflops * 1e12, args.loss_family,
                     remat=args.remat, accum_steps=args.accum_steps,
                     pad_stem_to=args.pad_stem)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
