"""CLI tests: reference-default parity of the knob sets + end-to-end runs
on the CPU mesh + determinism."""

import json
import os

import numpy as np
import pytest

from unet_rir_tpu.cli import generate as gen_cli
from unet_rir_tpu.cli import train as train_cli


class TestTrainArgs:
    def test_reference_defaults(self):
        """Defaults must equal main_training.py:27-50 constants."""
        args = train_cli.build_argparser().parse_args([])
        assert args.name == "unet"
        assert args.alpha == 0.9
        assert args.sigmoid_loss is False
        assert args.diff_loss is False
        assert args.beta == 0.5
        assert args.epochs == 500
        assert args.lr == 5e-7
        assert args.batch_size == 16
        assert args.optimizer == "adam"
        assert args.lr_decay_start == 80
        assert args.rooms == ["All"]
        assert args.loss_family == "blend"

    def test_loss_family_choices(self):
        with pytest.raises(SystemExit):
            train_cli.build_argparser().parse_args(["--loss-family", "nope"])

    def test_recon_weight_defaults_to_model_declaration(self):
        """DiffVAE's loss must reproduce the reference's
        `100000 * recon + kl` balance (diff_vae.py:68, :184-195); every
        other family trains unweighted (vae_trainer.py:84-87). At weight 1
        the DiffVAE posterior collapses (measured: 63 dB gated LSD on the
        round-4 zoo sweep), so this default is quality-critical."""
        from unet_rir_tpu import models

        assert train_cli.build_argparser().parse_args([]).recon_weight is None
        diffvae = models.build_model("diffvae")
        assert getattr(type(diffvae), "RECON_WEIGHT") == 100000.0
        for name in ("unet", "vae", "vqvae", "ae", "aenet"):
            m = models.build_model(name)
            assert getattr(type(m), "RECON_WEIGHT", 1.0) == 1.0

    def test_process_topology_without_coordinator_refused(self, tmp_path):
        """--num-processes/--process-id without --coordinator-address must
        refuse, not degrade to N independent full trainings racing on the
        results dir."""
        with pytest.raises(SystemExit, match="coordinator-address"):
            train_cli.main([
                "--name", "unet", "--synthetic", "4", "--epochs", "1",
                "--results-dir", str(tmp_path),
                "--num-processes", "2", "--process-id", "0",
            ])


class TestGenerateArgs:
    def test_reference_defaults(self):
        """Defaults must equal rir_generation.py:45-63 constants."""
        args = gen_cli.build_argparser().parse_args([])
        assert args.batch_size == 4
        assert args.algorithm == "ph"
        assert args.diff_gen is False
        assert args.rooms == ["All"]

    def test_algorithm_choices(self):
        with pytest.raises(SystemExit):
            gen_cli.build_argparser().parse_args(["--algorithm", "xx"])



class TestEndToEnd:
    def test_train_then_generate(self, tmp_path):
        """Smallest full loop through both CLIs on the CPU mesh."""
        rc = train_cli.main([
            "--name", "unet", "--synthetic", "6", "--epochs", "1",
            "--batch-size", "2", "--lr", "1e-4", "--filters", "2",
            "--results-dir", str(tmp_path / "res"),
        ])
        assert rc == 0
        assert os.path.exists(str(tmp_path / "res" / "unet" / "hiperparametros.json"))
        assert os.path.exists(str(tmp_path / "res" / "unet" / "export" / "weights.npz"))

        rc = gen_cli.main([
            "--models", "unet", "--models-folder", str(tmp_path / "res"),
            "--saving-path", str(tmp_path / "gen"), "--synthetic", "6",
            "--batch-size", "2", "--filters", "2",
        ])
        assert rc == 0
        assert os.path.exists(str(tmp_path / "gen" / "unet_ph" / "unet_losses.csv"))

    def test_generate_use_best(self, tmp_path, capsys):
        """--use-best evaluates the BestCheckpoint export, not the latest
        checkpoint (late-epoch val oscillation makes latest a lottery draw
        at small corpus scale — RESULTS.md zoo section); a missing best/
        export is a loud error, never a silent latest fallback.

        Under the conftest 8-device mesh the global batch is
        --batch-size x 8, so --synthetic 16 (80 RIRs, 16-sample val split)
        gives exactly one val batch — the minimum for BestCheckpoint to
        fire. The tiny-corpus leg below pins the opposite: zero val
        batches must WARN and skip the best export, not NaN silently."""
        rc = train_cli.main([
            "--name", "unet", "--synthetic", "16", "--epochs", "1",
            "--batch-size", "2", "--lr", "1e-4", "--filters", "2",
            "--results-dir", str(tmp_path / "res"),
        ])
        assert rc == 0
        assert os.path.isdir(str(tmp_path / "res" / "unet" / "best"))

        rc = gen_cli.main([
            "--models", "unet", "--models-folder", str(tmp_path / "res"),
            "--saving-path", str(tmp_path / "gen_best"), "--synthetic", "16",
            "--batch-size", "2", "--filters", "2", "--use-best",
        ])
        assert rc == 0
        assert "Loaded best-val export" in capsys.readouterr().out
        assert os.path.exists(str(tmp_path / "gen_best" / "unet_ph" / "unet_losses.csv"))

        # Tiny corpus: val split (6) < global batch (16) -> loud warning,
        # no best export, and --use-best refuses rather than silently
        # falling back to the latest checkpoint.
        rc = train_cli.main([
            "--name", "unet", "--synthetic", "6", "--epochs", "1",
            "--batch-size", "2", "--lr", "1e-4", "--filters", "2",
            "--results-dir", str(tmp_path / "res_tiny"),
        ])
        assert rc == 0
        assert "WARNING: validation disabled" in capsys.readouterr().out
        assert not os.path.isdir(str(tmp_path / "res_tiny" / "unet" / "best"))
        with pytest.raises(SystemExit, match="no best-val export"):
            gen_cli.main([
                "--models", "unet", "--models-folder", str(tmp_path / "res_tiny"),
                "--saving-path", str(tmp_path / "gen_err"), "--synthetic", "6",
                "--batch-size", "2", "--filters", "2", "--use-best",
            ])

    def test_compile_cache_dir_persists_executables(self, tmp_path):
        """--compile-cache-dir fills a persistent XLA cache (warm restarts
        skip first-compile); the flag exists on all three CLIs."""
        import jax

        cache = tmp_path / "xla_cache"
        try:
            rc = train_cli.main([
                "--name", "unet", "--synthetic", "6", "--epochs", "1",
                "--batch-size", "2", "--lr", "1e-4", "--filters", "2",
                "--results-dir", str(tmp_path / "res"),
                "--compile-cache-dir", str(cache),
            ])
        finally:  # the cache dir is process-global jax config: unset it
            jax.config.update("jax_compilation_cache_dir", None)
        assert rc == 0
        assert any(cache.iterdir()), "compilation cache is empty"
        from unet_rir_tpu.cli import serve as serve_cli

        for parser in (gen_cli.build_argparser(), serve_cli.build_argparser()):
            assert parser.get_default("compile_cache_dir") is None

    def test_training_deterministic(self, tmp_path):
        """Same seed -> byte-identical first-epoch history (SURVEY §5.2)."""

        def run(tag):
            rc = train_cli.main([
                "--name", "unet", "--synthetic", "6", "--epochs", "1",
                "--batch-size", "2", "--lr", "1e-4", "--seed", "3",
                "--filters", "2", "--results-dir", str(tmp_path / tag),
            ])
            assert rc == 0
            with open(str(tmp_path / tag / "unet" / "unet.log")) as f:
                return f.read().splitlines()

        a = run("a")
        b = run("b")
        # Compare loss columns (drop epoch_time wall-clock column).
        pick = lambda line: line.split(",")[:-1]
        assert [pick(l) for l in a[1:]] == [pick(l) for l in b[1:]]


def test_train_empty_train_split_errors(tmp_path):
    """A train split smaller than the global batch is a loud SystemExit
    before any compile — not a 0-step 'success' with NaN metrics."""
    with pytest.raises(SystemExit, match="Nothing to train"):
        train_cli.main([
            "--name", "unet", "--synthetic", "2", "--epochs", "1",
            "--batch-size", "8", "--lr", "1e-4", "--filters", "2",
            "--results-dir", str(tmp_path / "res"),
        ])


class TestMeasuredLayoutDressRehearsal:
    """Full measured-corpus path (VERDICT r1 item 10): a tiny on-disk UTS
    directory tree — one array folder shipped as a .zip — driven through
    cli.train --data-dir (with --extract) and cli.generate --data-dir,
    proving dataset.py:93-182 semantics beyond unit level."""

    def _build_tree(self, root, rng, n_samples=9600):
        import zipfile

        import numpy as np
        import scipy.io.wavfile

        base = root / "room_impulse"
        specs = [
            ("ShoeBoxRoom", "ZoneA", "PlanarMicrophoneArray", 12),
            ("SmallMeetingRoom", "ZoneB", "PlanarMicrophoneArray", 12),
        ]
        for room, zone, arr, n in specs:
            d = base / room / zone / arr
            os.makedirs(d)
            t = np.arange(n_samples) / 48000.0
            for m in range(1, n + 1):
                wav = (rng.standard_normal(n_samples) * np.exp(-t / 0.05)).astype(np.float32)
                wav[100] = 0.9
                scipy.io.wavfile.write(
                    str(d / f"{room}_{zone}_{arr}_L1_M{m}.wav"), 48000, wav)
        # Ship the second room's array folder as a zip (dataset.py:93-115).
        arr_dir = base / "SmallMeetingRoom" / "ZoneB" / "PlanarMicrophoneArray"
        zpath = base / "SmallMeetingRoom" / "ZoneB" / "PlanarMicrophoneArray.zip"
        with zipfile.ZipFile(str(zpath), "w") as zf:
            for f in sorted(os.listdir(arr_dir)):
                zf.write(str(arr_dir / f), f"PlanarMicrophoneArray/{f}")
        import shutil

        shutil.rmtree(str(arr_dir))
        return str(root)

    def test_train_then_generate_measured(self, tmp_path, rng):
        data_dir = self._build_tree(tmp_path / "data", rng)
        assert not os.path.isdir(os.path.join(
            data_dir, "room_impulse", "SmallMeetingRoom", "ZoneB",
            "PlanarMicrophoneArray"))

        rc = train_cli.main([
            "--name", "unet", "--data-dir", data_dir, "--extract",
            "--epochs", "1", "--batch-size", "2", "--lr", "1e-4",
            "--filters", "2", "--mesh-data", "1",
            "--results-dir", str(tmp_path / "res"),
        ])
        assert rc == 0
        # zip was unpacked in place and removed
        assert os.path.isdir(os.path.join(
            data_dir, "room_impulse", "SmallMeetingRoom", "ZoneB",
            "PlanarMicrophoneArray"))
        assert not os.path.exists(os.path.join(
            data_dir, "room_impulse", "SmallMeetingRoom", "ZoneB",
            "PlanarMicrophoneArray.zip"))
        assert os.path.exists(str(tmp_path / "res" / "unet" / "export" / "weights.npz"))

        rc = gen_cli.main([
            "--models", "unet", "--models-folder", str(tmp_path / "res"),
            "--saving-path", str(tmp_path / "gen"), "--data-dir", data_dir,
            "--batch-size", "2", "--filters", "2", "--save-wavs",
        ])
        assert rc == 0
        out = str(tmp_path / "gen" / "unet_ph")
        assert os.path.exists(os.path.join(out, "unet_losses.csv"))
        assert os.path.exists(os.path.join(out, "unet_infer_time.csv"))
        wavs = os.listdir(os.path.join(out, "rir"))
        assert len(wavs) >= 2 and all(w.endswith(".wav") for w in wavs)

    def test_train_then_generate_measured_0p4s(self, tmp_path, rng):
        """VERDICT r2 item 2 done-criterion: the best-quality 0.4 s config
        is reproducible on a MEASURED-layout tree end-to-end through both
        CLIs (duration wired through from_directory; 19200-sample wavs kept
        at full length — no silent 0.2 s crop)."""
        import warnings

        data_dir = self._build_tree(tmp_path / "data", rng, n_samples=19200)

        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            rc = train_cli.main([
                "--name", "unet", "--data-dir", data_dir, "--duration", "0.4",
                "--extract", "--epochs", "1", "--batch-size", "2",
                "--lr", "1e-4", "--filters", "2", "--mesh-data", "1",
                "--results-dir", str(tmp_path / "res"),
            ])
        assert rc == 0
        # Exact-duration load: no truncation/padding warnings fired.
        assert not [w for w in caught
                    if "TRUNCATED" in str(w.message)
                    or "zero-padded" in str(w.message)], caught

        rc = gen_cli.main([
            "--models", "unet", "--models-folder", str(tmp_path / "res"),
            "--saving-path", str(tmp_path / "gen"), "--data-dir", data_dir,
            "--duration", "0.4", "--batch-size", "2", "--filters", "2",
            "--save-wavs",
        ])
        assert rc == 0
        out = str(tmp_path / "gen" / "unet_ph")
        assert os.path.exists(os.path.join(out, "unet_losses.csv"))
        wavs = os.listdir(os.path.join(out, "rir"))
        assert len(wavs) >= 2
        # Generated wavs carry the full 0.4 s length.
        from unet_rir_tpu.data.wav_io import wav_frames

        frames, sr = wav_frames(os.path.join(out, "rir", wavs[0]))
        assert (frames, sr) == (19200, 48000)


def test_train_profile_dir_writes_trace(tmp_path):
    """--profile-dir traces one warm-up epoch to a TensorBoard profile dir."""
    prof = tmp_path / "prof"
    rc = train_cli.main([
        "--name", "unet", "--synthetic", "8", "--epochs", "1",
        "--batch-size", "4", "--filters", "2", "--lr", "1e-3",
        "--results-dir", str(tmp_path / "res"), "--mesh-data", "1",
        "--profile-dir", str(prof),
    ])
    assert rc == 0
    files = [f for _, _, fs in os.walk(str(prof)) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in files), files
