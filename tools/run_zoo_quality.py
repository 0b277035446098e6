"""Model-zoo quality sweep: train + evaluate every generative zoo model
on one shared corpus and emit a single ranking CSV.

The reference thesis's central experiment is a ranking of its model
families on the same data (u_net.py vs autoencoder/res_ae/vae/diff_* —
/root/reference/main_training.py:119-161 trains them one at a time with
hand-edited constants; no runner exists). This tool reproduces that
comparison end-to-end through the two CLIs, serialized (one TPU, one CPU
— see CLAUDE.md), on a shared featurized-corpus cache so every model
sees identical data and splits:

  for each model: cli.train (60 epochs, reference loss knobs per family)
                  cli.generate (--parity-metrics; --diff-gen for diff_*)
  then: collect each run's <name>_parity.csv + <name>_losses.csv medians
        into zoo_quality.csv, ranked by gated log-spectral distance.

Ranking is by gated LSD, not T60: T60 alone is gameable — a model that
emits near-constant average-decay spectra scores a deceptively good T60
median while its spectra are garbage (measured: diffvae hit 7.5% T60
median at 54 dB gated LSD on this sweep). Spectral fidelity is the
robust fidelity axis; the T60 columns are still reported.

Diff-family models train with --diff-loss and evaluate with --diff-gen
(the reference pairs diff models with diff generation,
rir_generation.py:76-123). The flagship unet row doubles as a
reproduction check against RESULTS.md's round-1/2 numbers.

Usage:
  python tools/run_zoo_quality.py --out /tmp/zoo [--models unet diffunet ae vae]
  python tools/run_zoo_quality.py --dry-run      # print the commands only
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys

# (model, extra train flags, extra eval flags) — loss knobs follow the
# reference pairings; everything else is the shared round-1-scale recipe.
ZOO = {
    "unet": (["--sigmoid-loss", "--diff-loss"], ["--diff-gen"]),
    "diffunet": (["--sigmoid-loss", "--diff-loss"], ["--diff-gen"]),
    "ae": ([], []),
    "resae": ([], []),
    "vae": ([], []),
    "vqvae": ([], []),
    "diffvae": (["--diff-loss"], ["--diff-gen"]),
    "aenet": ([], []),
}


def build_commands(args):
    """Yield (kind, model, argv) for the full sweep."""
    cache = os.path.join(args.out, "cache")
    for name in args.models:
        train_extra, eval_extra = ZOO[name]
        results = os.path.join(args.out, name)
        yield "train", name, [
            sys.executable, "-m", "unet_rir_tpu.cli.train",
            "--name", name,
            "--synthetic", str(args.n_per_room),
            "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--lr", str(args.lr),
            "--bf16",
            "--results-dir", results,
            "--cache-dir", cache,
            *train_extra,
            *(args.extra_train_arg or []),
        ]
        yield "eval", name, [
            sys.executable, "-m", "unet_rir_tpu.cli.generate",
            "--models", name,
            "--models-folder", results,
            "--saving-path", os.path.join(results, "generated"),
            "--synthetic", str(args.n_per_room),
            "--cache-dir", cache,
            "--batch-size", str(args.batch_size),
            "--parity-metrics",
            "--plot-every", "0",
            *(["--use-best"] if args.use_best else []),
            *eval_extra,
            *(args.extra_eval_arg or []),
        ]


def collect(args) -> list[dict]:
    """Read each model's parity + losses CSVs into ranking rows."""
    rows = []
    for name in args.models:
        gen = os.path.join(args.out, name, "generated", f"{name}_ph")
        parity = os.path.join(gen, f"{name}_parity.csv")
        losses = os.path.join(gen, f"{name}_losses.csv")
        row = {"model": name}
        if os.path.exists(parity):
            with open(parity) as f:
                for r in csv.DictReader(f):
                    if r["room"] == "Global":
                        row.update({
                            "lsd_median_db": r["LSD median (dB)"],
                            "lsd_gated_median_db": r["LSD gated median (dB)"],
                            "t60_rel_err_median": r["T60 rel err median"],
                            "t60_rel_err_mean": r["T60 rel err mean"],
                        })
                    elif r["room"] == "Reverberant":
                        # The honest T60 aggregate: excludes the rooms at
                        # the Schroeder estimator's resolution floor whose
                        # "error" measures the estimator, not the model
                        # (report.py Reverberant row; VERDICT r4 weak #6 —
                        # the Global mean is HemiAnechoic-floor-poisoned).
                        row.update({
                            "t60_rev_rel_err_median": r["T60 rel err median"],
                            "t60_rev_rel_err_mean": r["T60 rel err mean"],
                        })
        if os.path.exists(losses):
            with open(losses) as f:
                for r in csv.DictReader(f):
                    if r["room"] == "Global":
                        row["mse_spectrogram"] = r["MSE spectrogram"]
                        row["misalignment_waveform_db"] = r["Misalignment waveform"]
        rows.append(row)
    rows.sort(key=lambda r: float(r.get("lsd_gated_median_db", "inf") or "inf"))
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/zoo")
    p.add_argument("--models", nargs="+", default=list(ZOO),
                   choices=list(ZOO))
    p.add_argument("--n-per-room", type=int, default=64)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--timeout", type=int, default=1800,
                   help="per-command timeout (s)")
    p.add_argument("--extra-train-arg", action="append", default=None,
                   help="extra argv token appended to every train command "
                        "(repeatable; use --extra-train-arg=--flag=value). "
                        "E.g. --diffuse-tail, or --local-device-count=1 for "
                        "a CPU rehearsal of the sweep")
    p.add_argument("--extra-eval-arg", action="append", default=None,
                   help="extra argv token appended to every eval command "
                        "(repeatable)")
    p.add_argument("--use-best", action="store_true",
                   help="evaluate each family's best-val export instead of "
                        "its latest checkpoint — at small corpus scale the "
                        "late-epoch val loss oscillates ~2x between saves, "
                        "so latest-restore rankings carry a per-model "
                        "checkpoint-draw noise term (RESULTS.md zoo section)")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--collect-only", action="store_true",
                   help="skip running; just aggregate existing CSVs")
    args = p.parse_args(argv)

    if not args.collect_only:
        for kind, name, argv_ in build_commands(args):
            print(f"[{kind}:{name}] {' '.join(argv_)}", flush=True)
            if args.dry_run:
                continue
            try:
                r = subprocess.run(argv_, timeout=args.timeout)
                code = r.returncode
            except subprocess.TimeoutExpired:
                code = "timeout"  # training resumes from ckpt on a rerun
            if code != 0:
                print(f"[{kind}:{name}] FAILED ({code}) — "
                      f"continuing with the rest of the zoo", flush=True)
    if args.dry_run:
        return 0

    rows = collect(args)
    out_csv = os.path.join(args.out, "zoo_quality.csv")
    keys = ["model", "mse_spectrogram", "misalignment_waveform_db",
            "lsd_median_db", "lsd_gated_median_db",
            "t60_rel_err_median", "t60_rel_err_mean",
            "t60_rev_rel_err_median", "t60_rev_rel_err_mean"]
    os.makedirs(args.out, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        w.writerows(rows)
    print(json.dumps({"zoo_quality_csv": out_csv, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
