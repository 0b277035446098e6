"""Tests for the repo-root measurement/orchestration tools (tools/).

These scripts are the reproducibility surface for RESULTS.md's tables;
the aggregation logic must parse the exact report schemas eval.report
writes (tools themselves run on hardware and are exercised there)."""

import csv
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRunZooQuality:
    def _write_reports(self, out, name, t60_median, gated_lsd=9.5):
        gen = os.path.join(out, name, "generated", f"{name}_ph")
        os.makedirs(gen, exist_ok=True)
        with open(os.path.join(gen, f"{name}_parity.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["room", "n samples", "LSD median (dB)",
                        "LSD gated median (dB)", "T60 rel err median",
                        "T60 rel err mean", "T60 true median (s)",
                        "T60 pred median (s)"])
            w.writerow(["Global", 32, "9.9", str(gated_lsd), str(t60_median),
                        str(t60_median * 2), "0.6", "0.55"])
            # The floor-free aggregate row (report.py Reverberant): its T60
            # columns must reach the ranking CSV (VERDICT r4 weak #6).
            w.writerow(["Reverberant", 26, "9.7", str(gated_lsd),
                        str(t60_median / 2), str(t60_median), "0.6", "0.58"])
        with open(os.path.join(gen, f"{name}_losses.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["room", "n samples", "MSE spectrogram", "MSE magnitude",
                        "1-cos(y-y_) phase", "MSE waveform", "MSE waveform 50ms",
                        "Misalignment magnitude", "Misalignment waveform"])
            w.writerow(["Global", 32, "0.002", "0.001", "0.7",
                        "1.e-09", "5.e-09", "-1.e+00", "-0.6"])

    def test_collect_ranks_by_gated_lsd(self, tmp_path):
        """Ranking is by spectral fidelity (gated LSD), NOT T60 — a model
        emitting average-decay constants can top the T60 column while its
        spectra are garbage (measured: diffvae, RESULTS.md zoo table)."""
        zoo = _load("run_zoo_quality")
        out = str(tmp_path)
        # ae has the better (lower) gated LSD despite the worse T60.
        self._write_reports(out, "unet", 0.05, gated_lsd=12.0)
        self._write_reports(out, "ae", 0.40, gated_lsd=9.5)

        class A:
            pass

        args = A()
        args.out, args.models = out, ["unet", "ae"]
        rows = zoo.collect(args)
        assert [r["model"] for r in rows] == ["ae", "unet"]
        assert rows[0]["lsd_gated_median_db"] == "9.5"
        assert rows[0]["mse_spectrogram"] == "0.002"
        assert rows[0]["misalignment_waveform_db"] == "-0.6"
        # Reverberant (estimator-floor-free) T60 aggregate is collected.
        assert rows[0]["t60_rev_rel_err_median"] == "0.2"
        assert rows[0]["t60_rev_rel_err_mean"] == "0.4"

    def test_collect_tolerates_missing_model(self, tmp_path):
        """A failed zoo member (no reports) must not sink the aggregation —
        the runner explicitly continues past per-model failures."""
        zoo = _load("run_zoo_quality")
        self._write_reports(str(tmp_path), "unet", 0.1)

        class A:
            pass

        args = A()
        args.out, args.models = str(tmp_path), ["unet", "vae"]
        rows = zoo.collect(args)
        assert [r["model"] for r in rows] == ["unet", "vae"]  # inf sorts last
        assert "lsd_median_db" not in rows[1]

    def test_dry_run_emits_reference_loss_pairings(self, capsys):
        """diff-family models must train with --diff-loss and evaluate with
        --diff-gen (rir_generation.py:76-123 pairing)."""
        zoo = _load("run_zoo_quality")
        assert zoo.main(["--dry-run", "--models", "diffunet", "ae",
                         "--out", "/tmp/zoo_dry"]) == 0
        out = capsys.readouterr().out
        lines = out.strip().splitlines()
        assert any("--diff-loss" in l for l in lines if l.startswith("[train:diffunet]"))
        assert any("--diff-gen" in l for l in lines if l.startswith("[eval:diffunet]"))
        assert not any("--diff-gen" in l for l in lines if l.startswith("[eval:ae]"))
        assert all(sys.executable in l for l in lines)

    def test_dry_run_use_best_reaches_eval_commands(self, capsys):
        """--use-best flows to every eval command (and only eval) so the
        ranking scores best-val exports, not latest-checkpoint draws."""
        zoo = _load("run_zoo_quality")
        assert zoo.main(["--dry-run", "--use-best", "--models", "unet", "ae",
                         "--out", "/tmp/zoo_dry"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        evals = [l for l in lines if l.startswith("[eval:")]
        trains = [l for l in lines if l.startswith("[train:")]
        assert evals and all("--use-best" in l for l in evals)
        assert trains and not any("--use-best" in l for l in trains)

    def test_zoo_runner_end_to_end_with_timeout_resume(self, tmp_path, capfd,
                                                       monkeypatch):
        """VERDICT r3 #2: the runner's REAL subprocess + timeout-resume +
        CSV-collect path, executed. Phase A force-kills training via the
        per-command timeout (after cadence checkpoints exist); phase B reruns
        the same command and training RESUMES from the checkpoint; a second
        model then runs to completion and the collected zoo_quality.csv
        carries both ranked rows (the orchestration surface of
        rir_generation.py:72-123)."""
        zoo = _load("run_zoo_quality")
        out = str(tmp_path / "zoo")
        ckpt = os.path.join(out, "unet", "unet", "ckpt")
        # Children force CPU themselves (--local-device-count=1); the
        # suite's 8-device flags must not leak into them.
        monkeypatch.delenv("XLA_FLAGS", raising=False)
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        cc = str(tmp_path / "xla_cache")
        common = [
            "--out", out, "--n-per-room", "4", "--batch-size", "2",
            "--lr", "1e-3",
            "--extra-train-arg=--local-device-count=1",
            "--extra-train-arg=--filters=2",
            f"--extra-train-arg=--compile-cache-dir={cc}",
            "--extra-eval-arg=--local-device-count=1",
            "--extra-eval-arg=--filters=2",
            f"--extra-eval-arg=--compile-cache-dir={cc}",
        ]

        # Phase A: epochs far beyond what the timeout allows -> the train
        # child is KILLED mid-run, after the every-2-epoch checkpoint
        # cadence has saved at least once. Retry with the (now warm)
        # compile cache if the kill landed before the first save.
        for _ in range(3):
            assert zoo.main(common + ["--models", "unet",
                                      "--epochs", "4000",
                                      "--timeout", "75"]) == 0
            if os.path.isdir(ckpt) and any(
                    d.isdigit() for d in os.listdir(ckpt)):
                break
        saved = max(int(d) for d in os.listdir(ckpt) if d.isdigit())
        out_a = capfd.readouterr().out
        assert "[train:unet] FAILED (timeout)" in out_a

        # Phase B: rerun to a target a few epochs past the kill point —
        # training must RESUME from the checkpoint, not start over.
        assert zoo.main(common + ["--models", "unet",
                                  "--epochs", str(saved + 4),
                                  "--timeout", "600"]) == 0
        out_b = capfd.readouterr().out
        assert "Restored checkpoint at epoch" in out_b
        assert "FAILED" not in out_b

        # Second model (diffunet exercises the --diff-loss/--diff-gen
        # pairing through the real CLIs), then aggregate both rows.
        assert zoo.main(common + ["--models", "diffunet",
                                  "--epochs", "4", "--timeout", "600"]) == 0
        assert zoo.main(common + ["--models", "unet", "diffunet",
                                  "--collect-only"]) == 0
        csv_path = os.path.join(out, "zoo_quality.csv")
        assert os.path.exists(csv_path)
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert {r["model"] for r in rows} == {"unet", "diffunet"}
        gated = [float(r["lsd_gated_median_db"]) for r in rows]
        assert all(g > 0 for g in gated)
        assert gated == sorted(gated)  # ranked by gated LSD

    def test_zoo_covers_every_generative_family(self):
        """The sweep must include every generative zoo model the CLIs
        support (main_training.py:119-161 trains each of these by hand);
        cnn_clas is a classifier, not a generative family, and is out."""
        zoo = _load("run_zoo_quality")
        assert set(zoo.ZOO) == {
            "unet", "diffunet", "ae", "resae", "vae", "vqvae", "diffvae",
            "aenet"}
        # diff-family pairing: diff targets in training, diff reassembly
        # in generation (rir_generation.py:173-178).
        for name in ("diffunet", "diffvae"):
            train_extra, eval_extra = zoo.ZOO[name]
            assert "--diff-loss" in train_extra
            assert "--diff-gen" in eval_extra
