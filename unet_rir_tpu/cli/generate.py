"""Inference + evaluation entry point — the rir_generation.py equivalent.

Restores the latest checkpoint for each requested model, generates the
full test split (batched, fused forward+postprocess on device), computes
the metric suite, and writes the reference-schema CSV/txt reports
(rir_generation.py:43-532). Fixes the reference's IndentationError at
line 63 and its `algorithm is 'gl'` identity check by construction.

Usage:
  python -m unet_rir_tpu.cli.generate --models unet --synthetic 64 \
      --models-folder results --saving-path generated_rir
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from unet_rir_tpu import models
from unet_rir_tpu.data.corpus import Corpus
from unet_rir_tpu.eval import EvalConfig, evaluate, write_reports
from unet_rir_tpu.train import CheckpointManager, LossConfig, TrainState, build_optimizer, init_model


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # Reference knobs (rir_generation.py:45-63).
    p.add_argument("--models", nargs="+", default=["unet"])
    p.add_argument("--models-folder", default="results")
    p.add_argument("--saving-path", default="generated_rir")
    p.add_argument("--algorithm", choices=["ph", "gl"], default="ph")
    p.add_argument("--gl-iters", type=int, default=32,
                   help="Griffin-Lim iterations for --algorithm gl "
                        "(reference librosa n_iter default: 32)")
    p.add_argument("--diff-gen", action="store_true")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--rooms", nargs="*", default=["All"])
    p.add_argument("--arrays", nargs="*", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--dataset-name", default="room_impulse")
    p.add_argument("--extract", action="store_true",
                   help="unpack per-array .zip archives in place first")
    p.add_argument("--debugging", action="store_true",
                   help="quick-load: stop after the first array folder "
                        "(reference Dataset(debugging=True))")
    p.add_argument("--compile-cache-dir", default=None,
                   help="persistent XLA compilation cache (skip first-compile "
                        "cost on re-runs; shareable across entry points)")
    p.add_argument("--cache-dir", default=None,
                   help="persist the featurized corpus here; later runs "
                        "load it instead of re-decoding every wav")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--duration", type=float, default=0.2,
                   help="RIR window in seconds (synthetic AND measured)")
    p.add_argument("--pad-short-wavs", action="store_true",
                   help="zero-pad measured wavs shorter than --duration "
                        "instead of erroring")
    p.add_argument("--diffuse-tail", action="store_true",
                   help="synthetic corpus: Sabine-decay noise tail past the "
                        "mixing time (must match the training corpus flag)")
    p.add_argument("--save-wavs", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="whole-split lax.scan evaluation (3 device dispatches "
                        "per window) — the fast path for remote/tunneled hosts")
    p.add_argument("--fused-window", type=int, default=2048,
                   help="max samples materialized on device at once in "
                        "--fused mode (bounds HBM for huge splits)")
    p.add_argument("--parity-metrics", action="store_true",
                   help="additionally compute the north-star parity columns "
                        "(LSD, energy-gated LSD, T60 relative error) per "
                        "sample and write <name>_parity.csv")
    p.add_argument("--t60-noise-comp", action="store_true",
                   help="Chu/ISO-3382 noise-floor compensation in the T60 "
                        "fit — use only when the window extends well past "
                        "the decay (see eval.metrics.t60_estimate)")
    p.add_argument("--lsd-gate-db", type=float, default=40.0,
                   help="energy gate (dB below the loudest frame) for the "
                        "gated LSD column; 40 excludes the amplitude-"
                        "normalization floor residual (~-56 dB energy) and "
                        "matches the 0.2 s window's energy content — see "
                        "eval.metrics.log_spectral_distance_gated")
    p.add_argument("--plot-every", type=int, default=640,
                   help="save 4 diagnostic PNGs every N samples (reference "
                        "default, rir_generation.py:295-308); 0 disables")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--optimizer", default="adam",
                   help="optimizer the checkpoint was trained with (restore template)")
    p.add_argument("--use-best", action="store_true",
                   help="evaluate the best-val export (<models-folder>/<name>/best, "
                        "written by BestCheckpoint during training) instead of the "
                        "latest checkpoint. The reference always evaluates the "
                        "end-of-training weights; latest-restore reproduces that and "
                        "stays the default — but at small corpus scale the late-epoch "
                        "val loss oscillates ~2x between checkpoint saves, so the "
                        "restored quality is a draw (measured: RESULTS.md zoo "
                        "section); rankings are stabler on the best-val weights")
    p.add_argument("--filters", type=int, default=None,
                   help="override number_filters_0 for UNet-family models")
    p.add_argument("--local-device-count", type=int, default=None,
                   help="force the CPU platform with N virtual devices "
                        "(same semantics as cli.train; CPU rehearsal/tests "
                        "only — real TPUs are auto-detected)")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    if args.local_device_count:
        # Must run before any computation initializes the backend (the
        # session sitecustomize pins JAX_PLATFORMS, so env vars don't stick
        # — CLAUDE.md gotcha; config wins).
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.local_device_count)
    if args.compile_cache_dir:
        from unet_rir_tpu.utils import enable_compilation_cache

        enable_compilation_cache(args.compile_cache_dir)
    if args.synthetic:
        corpus = Corpus.synthetic(n_per_room=args.synthetic, room=args.rooms,
                                  duration=args.duration,
                                  diffuse_tail=args.diffuse_tail,
                                  cache_dir=args.cache_dir)
    elif args.data_dir:
        corpus = Corpus.from_directory(args.data_dir, args.dataset_name,
                                       room=args.rooms, array=args.arrays,
                                       extract=args.extract,
                                       debugging=args.debugging,
                                       cache_dir=args.cache_dir,
                                       duration=args.duration,
                                       strict_duration=not args.pad_short_wavs)
    else:
        raise SystemExit("Provide --data-dir or --synthetic N")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    for name in args.models:
        print(f"Generating with {name}")
        overrides = {"dtype": dtype}
        if args.filters:
            overrides["number_filters_0"] = args.filters
        model = models.build_model(name, **overrides)
        sample = (corpus.features[:1], corpus.embeddings[:1][:, None, :].repeat(2, 1))
        variables = init_model(model, sample)

        ckpt_dir = os.path.join(args.models_folder, name, "ckpt")
        best_dir = os.path.join(args.models_folder, name, "best")
        if args.use_best and os.path.isdir(best_dir):
            model, variables = models.load_pretrained(best_dir)
            print(f"Loaded best-val export from {best_dir}")
        elif args.use_best:
            raise SystemExit(
                f"--use-best: no best-val export at {best_dir} (training "
                f"writes it via BestCheckpoint when val improves); rerun "
                f"without --use-best to evaluate the latest checkpoint."
            )
        elif os.path.isdir(ckpt_dir):
            opt = build_optimizer(args.optimizer)
            mgr = CheckpointManager(ckpt_dir)
            try:
                state, step = mgr.restore_latest(TrainState.create(variables, opt))
            except Exception as e:
                raise SystemExit(
                    f"Checkpoint restore failed for {ckpt_dir}: {e}\n"
                    f"If the model was trained with a different optimizer, pass "
                    f"--optimizer <name> so the restore template matches."
                )
            finally:
                mgr.close()
            if step is not None:
                print(f"Restored from {ckpt_dir} (epoch {step})")
                variables = state.variables()
            else:
                print("Initializing from scratch.")
        elif os.path.isdir(best_dir):
            model, variables = models.load_pretrained(best_dir)
            print(f"Loaded best-val export from {best_dir}")
        else:
            print("Initializing from scratch.")

        cfg = EvalConfig(
            algorithm=args.algorithm,
            gl_iters=args.gl_iters,
            diff_gen=args.diff_gen,
            batch_size=args.batch_size,
            save_wavs=args.save_wavs,
            out_dir=args.saving_path,
            name=name,
            plot_every=args.plot_every,
            fused=args.fused,
            fused_window=args.fused_window,
            parity_metrics=args.parity_metrics,
            t60_noise_comp=args.t60_noise_comp,
            lsd_gate_db=args.lsd_gate_db,
        )
        result = evaluate(model, variables, corpus, cfg)
        folder = write_reports(result, args.saving_path, name, args.algorithm)
        rows = result.room_means()
        print(f"Reports in {folder}")
        print(f"  Global MSE spectrogram: {rows['Global']['mse_spectrogram']:.4g}, "
              f"misalignment wav: {rows['Global']['misalignment_waveform_db']:.4g} dB")
        if args.parity_metrics:
            import numpy as np

            ps = result.per_sample
            print(f"  LSD median: {np.median(ps['lsd_db']):.4g} dB "
                  f"(gated {np.median(ps['lsd_gated_db']):.4g} dB), "
                  f"T60 rel err median: {100 * np.median(ps['t60_rel_err']):.4g}% "
                  f"mean: {100 * np.mean(ps['t60_rel_err']):.4g}% "
                  f"(table: {name}_parity.csv)")
        print(f"  t_inference/batch: {result.timing['t_model_inference_avg']:.5f}s, "
              f"t_postprocess/sample: {result.timing['t_postprocess']:.5f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
