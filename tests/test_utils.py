"""Tests for the cross-cutting utils: visualize, profiling, debug."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_rir_tpu import utils
from unet_rir_tpu.utils import visualize as viz


class TestVisualize:
    def test_diagnostic_plots_write_files(self, rng, tmp_path):
        stft = rng.uniform(0, 1, (129, 151)).astype(np.float32)
        wav = rng.standard_normal(9600).astype(np.float32)
        chars = ["ShoeBoxRoom", "A", "Planar", "1", "1"]
        paths = {
            "a": str(tmp_path / "spec_vs_wav.png"),
            "b": str(tmp_path / "spec_vs_spec.png"),
            "c": str(tmp_path / "phase.png"),
            "d": str(tmp_path / "wav.png"),
        }
        viz.plot_feature_vs_wav(stft, wav, "m", chars, paths["a"])
        viz.plot_feature_vs_feature_wav(wav, stft, stft, "m", chars, paths["b"])
        viz.plot_phase_vs_phase(stft, stft, "m", chars, paths["c"])
        viz.plot_wav_vs_wav(wav, wav, "m", chars, paths["d"])
        for p in paths.values():
            assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_3d_channel_squeeze(self, rng, tmp_path):
        stft = rng.uniform(0, 1, (129, 151, 1)).astype(np.float32)
        p = str(tmp_path / "s.png")
        viz.plot_spec(stft, p)
        assert os.path.exists(p)


class TestProfiling:
    def test_phase_timer_warmup_exclusion(self):
        t = utils.PhaseTimer()
        import time

        # Wide warm-up/steady separation so the assertion is robust to
        # scheduler jitter on a loaded machine (a 3x-inflated 0.01 s sleep
        # must still sit far below half the 0.5 s warm-up).
        for d in (0.5, 0.01, 0.01):
            with t.span("x"):
                time.sleep(d)
        assert t.mean("x") < 0.25  # warm-up 0.5 dropped
        assert "x" in t.summary()

    def test_sync(self):
        utils.sync(jnp.ones((4, 4)))  # must not raise

    def test_memory_stats(self):
        stats = utils.device_memory_stats()
        assert len(stats) == 8  # virtual CPU mesh


class TestDebug:
    def test_assert_finite_raises(self):
        bad = {"a": {"w": jnp.array([1.0, np.nan])}}
        with pytest.raises(FloatingPointError, match="a/w"):
            utils.assert_finite(bad)
        utils.assert_finite({"a": {"w": jnp.ones(3)}})  # clean

    def test_check_deterministic(self):
        fn = lambda key: jax.random.normal(key, (8,))
        assert utils.check_deterministic(fn)

    def test_nan_debugging_context(self):
        with utils.nan_debugging(True):
            with pytest.raises(FloatingPointError):
                jnp.log(jnp.zeros(2) - 1.0).block_until_ready()
        # restored after context
        _ = jnp.log(jnp.zeros(2) - 1.0)


def test_eval_plot_every(tmp_path):
    """evaluate() writes the 4 diagnostic PNGs when plot_every triggers."""
    from unet_rir_tpu import eval as eval_mod
    from unet_rir_tpu import models, train
    from unet_rir_tpu.data.corpus import Corpus

    corpus = Corpus.synthetic(n_per_room=8, max_order=2)
    model = models.UNet(number_filters_0=4)
    spec = corpus.features[:2]
    emb = jnp.stack([corpus.embeddings[:2]] * 2, axis=1)
    variables = train.init_model(model, (spec, emb))
    cfg = eval_mod.EvalConfig(batch_size=2, name="p", out_dir=str(tmp_path), plot_every=2)
    eval_mod.evaluate(model, variables, corpus, cfg)
    png_dir = os.path.join(str(tmp_path), "p_ph", "png")
    assert os.path.isdir(png_dir)
    names = sorted(os.listdir(png_dir))
    assert any(n.startswith("spec_vs_wav") for n in names)
    assert any(n.startswith("phase_vs_phase") for n in names)
