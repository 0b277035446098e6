"""Attribute train-step device time to U-Net stages (VERDICT r4 item 4).

RESULTS.md asserts that "the wide, shallow stem/head stages are the
structural reason" the train step plateaus at ~40-42% MFU, but no
measurement backed it. This tool produces that evidence:

1. Compile the batch-`--batch` train step (same construction as
   tools/measure_train_mfu.py) and parse `compiled.as_text()`: every HLO
   instruction carries `metadata={op_name="jit(..)/.../UNet/<module>/..."}`,
   and fusions list their fused computations — giving a map
   {hlo instruction name -> set of UNet module scopes}.
2. Run a few steps under `jax.profiler.trace(..., create_perfetto_trace=
   True)` and parse the perfetto JSON: TPU-track slice names are HLO
   instruction names, durations are device time.
3. Join the two: per-module device time, bucketed into architectural
   stages (stem/down1-4+bottleneck/up0-3/head/loss+opt). A fusion spanning
   k stages is split evenly across them (the `mixed_*` column reports how
   much time needed splitting, so the table is honest about attribution
   resolution).

The flagship UNet (mode 0) calls its mode blocks in a fixed order, so the
auto-numbered ConvBNRelu_i submodules map deterministically onto stages
(encoder 0-4, decoder skip-fusion+feature pairs 5-12 — models/unet.py:54-80).

Usage (real chip):
  python tools/profile_train_stages.py --batch 256 --bf16 [--steps 4]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# UNet (mode 0) module -> stage bucket. ConvBNRelu auto-numbering follows
# call order in models/unet.py: encoder blocks 0-4, then per decoder stage
# a skip-fusion block and a feature block (5-12).
STAGE_OF_MODULE = {
    "reg_down_0": "stem 144x160@32", "ConvBNRelu_0": "stem 144x160@32",
    "reg_down_1": "down1 72x80@64", "ConvBNRelu_1": "down1 72x80@64",
    "reg_down_2": "down2 36x40@128", "ConvBNRelu_2": "down2 36x40@128",
    "reg_down_3": "down3 18x20@256", "ConvBNRelu_3": "down3 18x20@256",
    "reg_down_4": "bottleneck 9x10@512", "ConvBNRelu_4": "bottleneck 9x10@512",
    "VectorEmbed_0": "bottleneck 9x10@512", "vector_proj": "bottleneck 9x10@512",
    "reg_up_0": "up0 18x20@256", "ConvBNRelu_5": "up0 18x20@256",
    "ConvBNRelu_6": "up0 18x20@256",
    "reg_up_1": "up1 36x40@128", "ConvBNRelu_7": "up1 36x40@128",
    "ConvBNRelu_8": "up1 36x40@128",
    "reg_up_2": "up2 72x80@64", "ConvBNRelu_9": "up2 72x80@64",
    "ConvBNRelu_10": "up2 72x80@64",
    "reg_up_3": "up3 144x160@32", "ConvBNRelu_11": "up3 144x160@32",
    "ConvBNRelu_12": "up3 144x160@32",
    "head": "head 144x160@2",
}
_MODULE_RE = re.compile(
    r"/(reg_down_\d|reg_up_\d|ConvBNRelu_\d+|VectorEmbed_\d|vector_proj|head)/"
)


def build_step(batch_size: int, bf16: bool, filters: int):
    import jax
    import jax.numpy as jnp

    from unet_rir_tpu import models, train
    from unet_rir_tpu.train.losses import LossConfig

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = models.UNet(number_filters_0=filters, dtype=dtype)
    rng = np.random.default_rng(0)
    features = jnp.asarray(
        rng.uniform(0, 1, (batch_size, 144, 160, 2)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (batch_size, 16)).astype(np.int32))
    emb2 = jnp.stack([emb, emb], axis=1)
    batch = (features, emb2, features)
    opt = train.build_optimizer("adam", 1e-4)
    variables = train.init_model(model, batch)
    state = train.TrainState.create(variables, opt)
    step = train.make_train_step(model, opt, LossConfig(family="blend"))
    compiled = step.lower(state, batch, jax.random.key(0), 1e-4).compile()
    return compiled, state, batch


def hlo_scope_map(hlo_text: str) -> dict[str, set[str]]:
    """{instruction name -> UNet module scopes it computes}.

    Two passes: collect each named computation's per-instruction scopes,
    then give every fusion instruction the union of its called
    computation's scopes (fusion bodies live in separate computations
    whose roots the fusion instruction references via calls=...).
    """
    comp_scopes: dict[str, set[str]] = collections.defaultdict(set)
    instr_scopes: dict[str, set[str]] = {}
    instr_calls: dict[str, list[str]] = {}
    current = None
    instr_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
    comp_re = re.compile(r"^\s*%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*\{\s*$|^\s*ENTRY\s+%?([\w.\-]+)")
    calls_re = re.compile(r"(?:calls|to_apply|body|condition)=%?([\w.\-]+)")
    for line in hlo_text.splitlines():
        mc = comp_re.match(line)
        if mc and "{" in line:
            current = mc.group(1) or mc.group(2)
            continue
        mi = instr_re.match(line)
        if not mi or current is None:
            continue
        name = mi.group(1)
        scopes = set(_MODULE_RE.findall(line))
        if scopes:
            comp_scopes[current] |= scopes
            instr_scopes[name] = instr_scopes.get(name, set()) | scopes
        for callee in calls_re.findall(line):
            instr_calls.setdefault(name, []).append(callee)
    # Resolve call graphs (fusion -> computation -> nested calls).
    def resolve(comp: str, seen: frozenset = frozenset()) -> set[str]:
        if comp in seen:
            return set()
        out = set(comp_scopes.get(comp, ()))
        return out
    for name, callees in instr_calls.items():
        s = instr_scopes.get(name, set())
        for c in callees:
            s |= resolve(c)
        if s:
            instr_scopes[name] = s
    return instr_scopes


def parse_perfetto(trace_dir: str) -> dict[str, float]:
    """Sum device-track slice durations (us) by HLO instruction name."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.gz"),
                             recursive=True))
    paths = [p for p in paths if "perfetto" in p or "trace.json" in p]
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # Identify TPU/device process ids from metadata events.
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = (e.get("args") or {}).get("name", "")
            if re.search(r"TPU|/device:|XLA Op|Device", pname, re.I):
                device_pids.add(e.get("pid"))
    durs: dict[str, float] = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        durs[e["name"]] += e["dur"]
    return durs


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--out", default="/tmp/trace_stages")
    p.add_argument("--dump-top", type=int, default=0,
                   help="also print the top-N device slices raw (debugging "
                        "the attribution itself)")
    args = p.parse_args()

    import jax

    compiled, state, batch = build_step(args.batch, args.bf16, args.filters)
    scope_map = hlo_scope_map(compiled.as_text())
    print(f"# HLO instructions with UNet scopes: {len(scope_map)}")

    from unet_rir_tpu.utils.profiling import sync

    key = jax.random.key(0)
    state, _ = compiled(state, batch, key, 1e-4)  # warm-up outside trace
    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out, create_perfetto_trace=True)
    for _ in range(args.steps):
        state, metrics = compiled(state, batch, key, 1e-4)
    sync(metrics["loss"])
    jax.profiler.stop_trace()

    durs = parse_perfetto(args.out)
    if args.dump_top:
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:args.dump_top]:
            print(f"#   {d/args.steps:10.1f} us  {name}  "
                  f"scopes={sorted(scope_map.get(name.split('.(')[0], []))}")

    stage_us: dict[str, float] = collections.defaultdict(float)
    mixed_us = 0.0
    total_us = 0.0
    for name, d in durs.items():
        base = name.split(".(")[0]  # perfetto may suffix "(N)" occurrences
        scopes = scope_map.get(base) or scope_map.get(name) or set()
        stages = {STAGE_OF_MODULE.get(m, m) for m in scopes}
        total_us += d
        if not stages:
            stage_us["(loss/opt/data/other)"] += d
        else:
            if len(stages) > 1:
                mixed_us += d
            for s in stages:
                stage_us[s] += d / len(stages)

    per_step = {k: v / args.steps for k, v in stage_us.items()}
    out = {
        "batch": args.batch,
        "steps_traced": args.steps,
        "device_total_us_per_step": round(total_us / args.steps, 1),
        "mixed_fusion_us_per_step": round(mixed_us / args.steps, 1),
        "stages_us_per_step": {k: round(v, 1) for k, v in sorted(
            per_step.items(), key=lambda kv: -kv[1])},
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
