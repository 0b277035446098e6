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
