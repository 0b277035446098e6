"""Eval-harness tests: metric definitions, generation loop, report schema."""

import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from unet_rir_tpu import eval as eval_mod
from unet_rir_tpu import models, train
from unet_rir_tpu.data.corpus import Corpus
from unet_rir_tpu.postprocess import PostProcess


@pytest.fixture(scope="module")
def corpus():
    return Corpus.synthetic(n_per_room=8, max_order=3)


class TestMetrics:
    def test_spectrogram_metrics_zero_at_identity(self, rng):
        spec = jnp.asarray(rng.uniform(0, 1, (3, 144, 160, 2)).astype(np.float32))
        m = eval_mod.spectrogram_metrics(spec, spec)
        np.testing.assert_allclose(np.asarray(m["mse_spectrogram"]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m["phase_1mcos"]), 0.0, atol=1e-6)
        assert np.all(np.asarray(m["misalignment_magnitude_db"]) < -100)

    def test_misalignment_formula(self, rng):
        t = rng.uniform(0, 1, (1, 144, 160, 2)).astype(np.float32)
        p = t.copy()
        p[..., 0] *= 1.1  # 10% amplitude error
        m = eval_mod.spectrogram_metrics(jnp.asarray(t), jnp.asarray(p))
        expected = 20 * math.log10(
            np.linalg.norm(p[..., 0] - t[..., 0]) / np.linalg.norm(t[..., 0])
        )
        np.testing.assert_allclose(float(m["misalignment_magnitude_db"][0]), expected, rtol=1e-3)

    def test_waveform_metrics(self, rng):
        w = rng.standard_normal((2, 9600)).astype(np.float32)
        m = eval_mod.waveform_metrics(jnp.asarray(w), jnp.asarray(w * 0.5))
        expected_mse = np.mean((w - 0.5 * w) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(m["mse_waveform"]), expected_mse, rtol=1e-4)
        # |0.5w - w| / |w| = 0.5 -> -6.02 dB
        np.testing.assert_allclose(np.asarray(m["misalignment_waveform_db"]), -6.0206, atol=0.01)

    def test_t60_estimate_monotonic(self):
        fs = 48000
        t = np.arange(9600) / fs
        rng = np.random.default_rng(3)

        def decay(t60):
            return (rng.standard_normal(9600) * np.exp(-6.9078 * t / t60)).astype(np.float32)

        est = eval_mod.t60_estimate(jnp.asarray(np.stack([decay(0.1), decay(0.3)])))
        e = np.asarray(est)
        assert e[0] < e[1]
        assert 0.05 < e[0] < 0.2, e

    def test_lsd_zero_at_identity(self, rng):
        amp = jnp.asarray(np.abs(rng.standard_normal((2, 129, 151))).astype(np.float32) + 0.01)
        np.testing.assert_allclose(np.asarray(eval_mod.log_spectral_distance(amp, amp)), 0.0, atol=1e-5)

    def test_lsd_gated_huge_gate_recovers_plain(self, rng):
        """gate_db=200 admits every frame -> gated LSD == plain LSD."""
        amp_t = jnp.asarray(np.abs(rng.standard_normal((2, 129, 151))).astype(np.float32) + 0.01)
        amp_p = jnp.asarray(np.abs(rng.standard_normal((2, 129, 151))).astype(np.float32) + 0.01)
        plain = np.asarray(eval_mod.log_spectral_distance(amp_t, amp_p))
        gated = np.asarray(eval_mod.log_spectral_distance_gated(amp_t, amp_p, gate_db=200.0))
        np.testing.assert_allclose(gated, plain, rtol=1e-5)

    def test_lsd_gated_excludes_silent_frames(self, rng):
        """Frames whose TRUE energy is far below the gate must not count:
        a prediction that is perfect on the loud frames and garbage on
        near-silent ones scores ~0 gated (the 1.3 s-window comparability
        rationale, RESULTS.md)."""
        F, T = 65, 40
        amp_t = np.full((1, F, T), 1e-6, np.float32)
        amp_t[:, :, :8] = 1.0  # 8 loud frames, rest ~-120 dB
        amp_p = amp_t.copy()
        amp_p[:, :, 8:] = 0.5  # wildly wrong only where it's silent
        gated = float(eval_mod.log_spectral_distance_gated(
            jnp.asarray(amp_t), jnp.asarray(amp_p), gate_db=60.0)[0])
        plain = float(eval_mod.log_spectral_distance(
            jnp.asarray(amp_t), jnp.asarray(amp_p))[0])
        assert gated < 1e-4, gated
        assert plain > 10.0, plain  # un-gated is dominated by the silent tail

    def test_lsd_default_gate_excludes_normalization_floor_residual(self):
        """The reason the default gate is 40 dB, not 60: frames at the
        amplitude-normalization floor denormalize to a small residual
        (denormalize_amp is exactly 0 only at amp_norm==0) whose frame
        energy sits ~55-58 dB below a realistic loudest frame — inside a
        60 dB gate, outside 40. Measured failure: at a 1.3 s window a
        60 dB gate left gated == plain LSD for every mid-T60 room
        (RESULTS.md '1.3 s window')."""
        from unet_rir_tpu.ops.normalize import denormalize_amp

        F, T = 129, 60
        spec = np.zeros((1, F, T), np.float32)
        spec[:, :, :6] = 0.45   # realistic loudest frames (norm scale)
        spec[:, :, 6:] = 0.02   # near-floor saturated tail (~ -56 dB energy)
        amp_t = denormalize_amp(jnp.asarray(spec))
        amp_p = jnp.asarray(np.asarray(amp_t))
        # corrupt the prediction ONLY on the tail frames
        amp_p = amp_p.at[:, :, 6:].multiply(30.0)
        g40 = float(eval_mod.log_spectral_distance_gated(amp_t, amp_p)[0])
        g60 = float(eval_mod.log_spectral_distance_gated(amp_t, amp_p, gate_db=60.0)[0])
        plain = float(eval_mod.log_spectral_distance(amp_t, amp_p)[0])
        assert g40 < 1e-4, g40             # default gate drops the floor tail
        assert abs(g60 - plain) / plain < 0.15, (g60, plain)  # 60 dB barely gates

    def test_t60_noise_compensation(self):
        """Chu noise-floor compensation (ISO 3382, opt-in): a -40 dB floor
        under a short decay inside a wide window must not inflate the
        estimate — the failure mode that wrecked the near-anechoic room's
        error at a 1.3 s window with the uncompensated estimator. Default
        is OFF (the 0.2 s contract regime, where the decay fills the
        window and the tail is signal, not noise)."""
        fs = 48000
        T = 62400
        t = np.arange(T) / fs
        rng = np.random.default_rng(0)
        clean = rng.standard_normal(T) * 10 ** (-3 * t / 0.05)
        noisy = (clean + 1e-2 * rng.standard_normal(T)).astype(np.float32)

        comp = float(eval_mod.t60_estimate(jnp.asarray(noisy[None]),
                                           noise_comp=True)[0])
        default = float(eval_mod.t60_estimate(jnp.asarray(noisy[None]))[0])
        assert abs(comp - 0.05) < 0.01, comp       # tracks the true decay
        assert default > 1.0, default              # the documented bias
        # Clean long decays are unaffected by the correction.
        long_ = (rng.standard_normal(T) * 10 ** (-3 * t / 1.28)).astype(np.float32)
        a = float(eval_mod.t60_estimate(jnp.asarray(long_[None]),
                                        noise_comp=True)[0])
        b = float(eval_mod.t60_estimate(jnp.asarray(long_[None]))[0])
        assert abs(a - b) < 0.01 and abs(a - 1.28) < 0.07


class TestGeneration:
    def test_assemble_diff(self, rng):
        spec_in = jnp.asarray(rng.uniform(0, 1, (2, 4, 4, 2)).astype(np.float32))
        pred = jnp.asarray(rng.uniform(0, 1, (2, 4, 4, 2)).astype(np.float32))
        out = eval_mod.assemble_prediction(spec_in, pred, True)
        np.testing.assert_allclose(
            np.asarray(out[..., 1]), np.asarray(pred[..., 1] + spec_in[..., 1]), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(pred[..., 0]))
        out2 = eval_mod.assemble_prediction(spec_in, pred, False)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(pred))

    def test_evaluate_end_to_end(self, corpus, tmp_path):
        model = models.UNet(number_filters_0=4)
        sample = (corpus.features[:2], jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
        variables = train.init_model(model, sample)
        cfg = eval_mod.EvalConfig(batch_size=2, name="tiny", out_dir=str(tmp_path))
        result = eval_mod.evaluate(model, variables, corpus, cfg)
        assert result.n_samples == len(result.rooms) == 4  # 10% of 40 pairs
        for key in ("mse_spectrogram", "mse_magnitude", "phase_1mcos",
                    "mse_waveform", "mse_waveform_50ms",
                    "misalignment_magnitude_db", "misalignment_waveform_db"):
            assert key in result.per_sample
            assert np.all(np.isfinite(result.per_sample[key]))
        rows = result.room_means()
        assert set(rows) == set(eval_mod.REPORT_ROOMS)
        assert rows["Global"]["n_samples"] == 4

        folder = eval_mod.write_reports(result, str(tmp_path), "tiny")
        for suffix in ("_infer_time.csv", "_losses.csv", "_results_inference.txt"):
            assert os.path.exists(os.path.join(folder, "tiny" + suffix))
        # CSV schema check
        import pandas as pd

        losses = pd.read_csv(os.path.join(folder, "tiny_losses.csv"))
        assert list(losses.columns) == [
            "room", "n samples", "MSE spectrogram", "MSE magnitude",
            "1-cos(y-y_) phase", "MSE waveform", "MSE waveform 50ms",
            "Misalignment magnitude", "Misalignment waveform",
        ]
        assert list(losses["room"]) == ["Global", "HemiAnechoic", "Large", "Medium", "Shoe", "Small"]
        times = pd.read_csv(os.path.join(folder, "tiny_infer_time.csv"))
        assert list(times.columns) == [
            "n_samples", "t_model_inference_avg", "batch_size",
            "t_postprocess", "t_loss_calc", "t_global",
        ]

    def test_generate_fn_fused(self, corpus):
        model = models.UNet(number_filters_0=4)
        spec = corpus.features[:2]
        emb = jnp.stack([corpus.embeddings[:2]] * 2, axis=1)
        variables = train.init_model(model, (spec, emb))
        generate = eval_mod.make_generate_fn(model)
        assembled, wav = generate(variables, spec, emb)
        assert assembled.shape == (2, 144, 160, 2)
        assert wav.shape == (2, 9600)
        assert np.all(np.isfinite(np.asarray(wav)))


class TestPostProcess:
    def test_roundtrip_file_outputs(self, corpus, tmp_path):
        pp = PostProcess("m", algorithm="ph", out_dir=str(tmp_path))
        feature = np.asarray(corpus.features[0])
        vector = np.asarray(corpus.embeddings[0])
        wav = pp.post_process(feature, vector)
        assert wav.shape == (9600,)
        assert os.path.exists(os.path.join(str(tmp_path), "m_ph", "rir", pp.wav_name + ".wav"))
        assert os.path.exists(os.path.join(str(tmp_path), "m_ph", "stft", pp.wav_name + ".npy"))

    def test_gl_algorithm(self, corpus, tmp_path):
        pp = PostProcess("m", algorithm="gl", out_dir=str(tmp_path), save=False)
        wav = pp.post_process(np.asarray(corpus.features[0]), [1, 2, 3])
        assert wav.shape == (9600,) and np.all(np.isfinite(wav))

    def test_gl_iters_knob(self, corpus):
        """gl_iters threads through EvalConfig -> defeaturize: more
        projections change (and, from a magnitude-only start, refine) the
        reconstruction; both settings stay finite."""
        from unet_rir_tpu.ops.features import defeaturize

        feat = corpus.features[:2]
        w4 = np.asarray(defeaturize(feat, algorithm="gl", gl_iters=4))
        w64 = np.asarray(defeaturize(feat, algorithm="gl", gl_iters=64))
        assert np.all(np.isfinite(w4)) and np.all(np.isfinite(w64))
        assert not np.allclose(w4, w64)
        model = models.UNet(number_filters_0=4)
        sample = (corpus.features[:2],
                  jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
        variables = train.init_model(model, sample)
        r = eval_mod.evaluate(
            model, variables, corpus,
            eval_mod.EvalConfig(batch_size=2, algorithm="gl", gl_iters=4))
        assert np.all(np.isfinite(r.per_sample["mse_waveform"]))


def test_evaluate_empty_partition_raises(corpus):
    """Partitions smaller than batch_size fail loudly, not with NaN reports."""
    model = models.UNet(number_filters_0=4)
    sample = (corpus.features[:2], jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
    variables = train.init_model(model, sample)
    cfg = eval_mod.EvalConfig(batch_size=1000, name="big")
    with pytest.raises(ValueError, match="fewer than"):
        eval_mod.evaluate(model, variables, corpus, cfg)


def test_evaluate_long_duration(tmp_path):
    """0.4 s corpus: eval crops/synthesizes at the wide grid end-to-end."""
    corpus04 = Corpus.synthetic(n_per_room=6, max_order=2, duration=0.4)
    assert corpus04.stft_shape == (129, 301)
    model = models.UNet(number_filters_0=2)
    sample = (corpus04.features[:2], jnp.stack([corpus04.embeddings[:2]] * 2, axis=1))
    variables = train.init_model(model, sample)
    cfg = eval_mod.EvalConfig(batch_size=2, name="long", out_dir=str(tmp_path))
    result = eval_mod.evaluate(model, variables, corpus04, cfg)
    assert np.all(np.isfinite(result.per_sample["mse_waveform"]))
    # wav metrics computed at the 0.4 s length (19200 samples)
    assert result.n_samples == 2


def test_evaluate_saves_wavs_and_stfts(corpus, tmp_path):
    """save_wavs exports per-sample wav AND generated-STFT .npy, named by
    conditioning vector (reference postprocess.py:135-159)."""
    model = models.UNet(number_filters_0=4)
    sample = (corpus.features[:2], jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
    variables = train.init_model(model, sample)
    cfg = eval_mod.EvalConfig(batch_size=2, name="tiny", out_dir=str(tmp_path),
                              save_wavs=True)
    result = eval_mod.evaluate(model, variables, corpus, cfg)
    rir_dir = os.path.join(str(tmp_path), "tiny_ph", "rir")
    stft_dir = os.path.join(str(tmp_path), "tiny_ph", "stft")
    wavs = sorted(os.listdir(rir_dir))
    npys = sorted(os.listdir(stft_dir))
    assert len(wavs) == len(npys) == result.n_samples
    assert all(w.startswith("RIR-") and w.endswith(".wav") for w in wavs)
    spec = np.load(os.path.join(stft_dir, npys[0]))
    assert spec.shape == (144, 160, 2) and np.all(np.isfinite(spec))


class TestFusedEvaluate:
    """EvalConfig(fused=True): whole-split scan phases == per-batch loop."""

    def _setup(self, corpus):
        model = models.UNet(number_filters_0=4)
        sample = (corpus.features[:2],
                  jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
        variables = train.init_model(model, sample)
        return model, variables

    def test_fused_matches_loop(self, corpus):
        model, variables = self._setup(corpus)
        r_loop = eval_mod.evaluate(model, variables, corpus,
                                   eval_mod.EvalConfig(batch_size=2))
        r_fused = eval_mod.evaluate(model, variables, corpus,
                                    eval_mod.EvalConfig(batch_size=2, fused=True))
        assert r_loop.n_samples == r_fused.n_samples
        assert r_loop.rooms == r_fused.rooms
        for k in r_loop.per_sample:
            np.testing.assert_allclose(r_fused.per_sample[k],
                                       r_loop.per_sample[k],
                                       rtol=1e-4, atol=1e-6, err_msg=k)
        for k in ("t_model_inference_avg", "t_postprocess", "t_loss_calc",
                  "t_global"):
            assert r_fused.timing[k] >= 0.0

    def test_fused_diff_gen_matches_loop(self, corpus):
        model, variables = self._setup(corpus)
        cfg = dict(batch_size=2, diff_gen=True)
        r_loop = eval_mod.evaluate(model, variables, corpus,
                                   eval_mod.EvalConfig(**cfg))
        r_fused = eval_mod.evaluate(model, variables, corpus,
                                    eval_mod.EvalConfig(fused=True, **cfg))
        for k in r_loop.per_sample:
            np.testing.assert_allclose(r_fused.per_sample[k],
                                       r_loop.per_sample[k],
                                       rtol=1e-4, atol=1e-6, err_msg=k)

    def test_diff_gen_mse_spectrogram_scores_raw_prediction(self, corpus,
                                                            tmp_path):
        """Semantic pin of the diff-gen metric split (rir_generation.py:
        184-197): the whole-spectrogram MSE column scores the RAW model
        output (its phase channel is the Δphase prediction in diff mode,
        line 197 uses `spec_generated`), while the phase-loss column scores
        the diff-REASSEMBLED phase (lines 190-196). Hand-computes both from
        an independent forward pass and checks them through to the
        losses-CSV Global row (VERDICT r4 items 2+8)."""
        import pandas as pd

        from unet_rir_tpu.data.pipeline import DataGenerator

        model, variables = self._setup(corpus)
        cfg = eval_mod.EvalConfig(batch_size=2, diff_gen=True, name="diffsem",
                                  out_dir=str(tmp_path))
        result = eval_mod.evaluate(model, variables, corpus, cfg)

        gen = DataGenerator(corpus, batch_size=2, partition="test",
                            shuffle=False, characteristics=False)
        forward = train.make_forward(model)
        exp_mse_spec, exp_phase = [], []
        for i in range(len(gen)):
            spec_in, emb, spec_out = gen[i]
            pred = np.asarray(forward(variables, spec_in, emb))
            spec_in, spec_out = np.asarray(spec_in), np.asarray(spec_out)
            # mse_spectrogram: RAW prediction, full tensor (ref line 197).
            exp_mse_spec.append(np.mean((spec_out - pred) ** 2, axis=(1, 2, 3)))
            # phase loss: ASSEMBLED phase = pred + input (ref lines 190-196),
            # denormalized to radians.
            phase_assembled = pred[..., 1] + spec_in[..., 1]
            t = spec_out[..., 1] * (2 * math.pi) - math.pi
            p = phase_assembled * (2 * math.pi) - math.pi
            exp_phase.append(np.mean(1.0 - np.cos(t - p), axis=(1, 2)))
        exp_mse_spec = np.concatenate(exp_mse_spec)
        exp_phase = np.concatenate(exp_phase)

        np.testing.assert_allclose(result.per_sample["mse_spectrogram"],
                                   exp_mse_spec, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(result.per_sample["phase_1mcos"],
                                   exp_phase, rtol=1e-4, atol=1e-6)
        # The two semantics genuinely differ on this model (sigmoid head:
        # raw phase in [0,1], assembled in [0,2]) — the column split is
        # load-bearing, not vacuous.
        assembled_mse = np.asarray(
            eval_mod.spectrogram_metrics(
                jnp.asarray(np.concatenate([np.asarray(gen[i][2])
                                            for i in range(len(gen))])),
                jnp.asarray(np.concatenate([
                    np.asarray(eval_mod.assemble_prediction(
                        gen[i][0],
                        forward(variables, gen[i][0], gen[i][1]), True))
                    for i in range(len(gen))])),
            )["mse_spectrogram"])
        assert not np.allclose(assembled_mse, exp_mse_spec, rtol=1e-3)

        # ...and the CSV Global row carries the raw-scored value.
        folder = eval_mod.write_reports(result, str(tmp_path), "diffsem")
        losses = pd.read_csv(os.path.join(folder, "diffsem_losses.csv"))
        csv_val = float(losses.loc[losses["room"] == "Global",
                                   "MSE spectrogram"].iloc[0])
        np.testing.assert_allclose(csv_val, float(np.mean(exp_mse_spec)),
                                   rtol=1e-3)

    def test_fused_save_wavs(self, corpus, tmp_path):
        model, variables = self._setup(corpus)
        cfg = eval_mod.EvalConfig(batch_size=2, fused=True, save_wavs=True,
                                  name="fused", out_dir=str(tmp_path))
        result = eval_mod.evaluate(model, variables, corpus, cfg)
        wavs = os.listdir(os.path.join(str(tmp_path), "fused_ph", "rir"))
        npys = os.listdir(os.path.join(str(tmp_path), "fused_ph", "stft"))
        assert len(wavs) == len(npys) == result.n_samples

    def test_fused_windowed_matches_loop(self, corpus):
        """fused_window smaller than the split -> several windows, same
        metrics (the HBM-bounding path)."""
        model, variables = self._setup(corpus)
        r_loop = eval_mod.evaluate(model, variables, corpus,
                                   eval_mod.EvalConfig(batch_size=2))
        r_win = eval_mod.evaluate(
            model, variables, corpus,
            eval_mod.EvalConfig(batch_size=2, fused=True, fused_window=2))
        assert r_win.n_samples == r_loop.n_samples
        for k in r_loop.per_sample:
            np.testing.assert_allclose(r_win.per_sample[k],
                                       r_loop.per_sample[k],
                                       rtol=1e-4, atol=1e-6, err_msg=k)


def test_loop_and_fused_timing_columns_comparable(corpus):
    """VERDICT r2 weak #2 done-criterion: the per-phase `*_infer_time.csv`
    columns must mean the same thing (compute, not transport) in loop and
    fused modes. Both paths probe the per-readback constant and subtract
    it per span, so on CPU (readback ~0) the columns should agree within
    generous noise bounds — a 0.7 s-scale readback distortion would blow
    far past them."""
    model = models.UNet(number_filters_0=4)
    sample = (corpus.features[:2],
              jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
    variables = train.init_model(model, sample)

    r_loop = eval_mod.evaluate(model, variables, corpus,
                               eval_mod.EvalConfig(batch_size=2))
    r_fused = eval_mod.evaluate(model, variables, corpus,
                                eval_mod.EvalConfig(batch_size=2, fused=True))
    for k in ("t_model_inference_avg", "t_postprocess", "t_loss_calc"):
        lo, fu = r_loop.timing[k], r_fused.timing[k]
        assert fu <= lo * 5.0 + 0.05, (k, lo, fu)
        assert lo <= fu * 5.0 + 0.05, (k, lo, fu)
    assert "transport constant subtracted" in r_loop.timing_method
    assert "transport constant subtracted" in r_fused.timing_method
    # Both paths surface the probed-constant audit trail (VERDICT r3 #7).
    for r in (r_loop, r_fused):
        for k in ("readback_probe_last_s", "readback_probe_min_s",
                  "readback_probe_max_s", "readback_n_probes"):
            assert k in r.timing and r.timing[k] >= 0.0, (k, r.timing)
        assert r.timing["readback_n_probes"] >= 1


def test_readback_correction_tracks_transport_drift(corpus, monkeypatch):
    """VERDICT r3 #7 done-criterion: the timing columns stay stable when the
    per-readback transport cost DRIFTS mid-eval (the tunnel's 30-60 min
    oscillation, CLAUDE.md). The tracker re-probes every
    `readback_probe_every` batches, so the subtracted constant follows the
    drift; with a single stale early probe the post-drift spans would carry
    the full transport jump."""
    import time as time_mod

    from unet_rir_tpu.eval import generation as gen_mod

    model = models.UNet(number_filters_0=2)
    sample = (corpus.features[:2],
              jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
    variables = train.init_model(model, sample)

    real_sync = gen_mod.sync
    jump_s = 0.15

    def run(probe_every):
        # Synthetic transport: ~0 for the first few sync calls (covering
        # the warm-up batch and the FIRST probe), then a step-function
        # degradation of `jump_s` per readback — so a stale early probe
        # under-corrects every measured batch while re-probing recovers.
        state = {"n": 0}

        def drifting_sync(x):
            state["n"] += 1
            if state["n"] > 5:
                time_mod.sleep(jump_s)
            return real_sync(x)

        monkeypatch.setattr(gen_mod, "sync", drifting_sync)
        try:
            cfg = eval_mod.EvalConfig(batch_size=4, name="drift",
                                      readback_probe_every=probe_every)
            # 'train' partition: 28 samples -> 7 batches, enough to drift.
            return eval_mod.evaluate(model, variables, corpus, cfg,
                                     partition="train")
        finally:
            monkeypatch.setattr(gen_mod, "sync", real_sync)

    tracked = run(probe_every=1)
    stale = run(probe_every=10**9)  # effectively the old single early probe

    # The tracker saw the jump (audit trail), the stale run could not.
    assert tracked.timing["readback_n_probes"] >= 4
    assert tracked.timing["readback_probe_max_s"] >= jump_s * 0.8
    assert stale.timing["readback_n_probes"] == 1
    assert stale.timing["readback_probe_last_s"] < jump_s * 0.5
    # Drift-proof columns: the stale-probe run's inference column absorbs
    # the transport jump that re-probing subtracts out.
    diff = (stale.timing["t_model_inference_avg"]
            - tracked.timing["t_model_inference_avg"])
    assert diff > jump_s * 0.3, (stale.timing, tracked.timing)


class TestParityMetrics:
    """North-star parity columns: LSD (+energy gate) and T60
    (EvalConfig(parity_metrics=True), eval.metrics.parity_metrics)."""

    def test_gated_lsd_ignores_silent_tail(self, rng):
        """Corrupting only near-silent late frames blows up plain LSD but
        not the gated one — the motivating wide-window saturation case."""
        B, F, T = 2, 129, 100
        amp_true = np.full((B, F, T), 1e-9, np.float32)
        amp_true[:, :, :30] = rng.uniform(0.1, 1.0, (B, F, 30))
        amp_pred = amp_true.copy()
        amp_pred[:, :, 30:] = 1e-3  # wrong, but only where true is silent
        plain = np.asarray(eval_mod.log_spectral_distance(
            jnp.asarray(amp_true), jnp.asarray(amp_pred)))
        gated = np.asarray(eval_mod.log_spectral_distance_gated(
            jnp.asarray(amp_true), jnp.asarray(amp_pred), 60.0))
        assert np.all(plain > 20.0)
        assert np.all(gated < 1e-3)

    def test_huge_gate_recovers_plain_lsd(self, rng):
        amp_t = rng.uniform(0.01, 1.0, (3, 129, 151)).astype(np.float32)
        amp_p = rng.uniform(0.01, 1.0, (3, 129, 151)).astype(np.float32)
        plain = np.asarray(eval_mod.log_spectral_distance(
            jnp.asarray(amp_t), jnp.asarray(amp_p)))
        wide = np.asarray(eval_mod.log_spectral_distance_gated(
            jnp.asarray(amp_t), jnp.asarray(amp_p), 1e9))
        np.testing.assert_allclose(wide, plain, rtol=1e-5)

    def test_gated_lsd_zero_at_identity(self, rng):
        amp = rng.uniform(0.01, 1.0, (2, 129, 151)).astype(np.float32)
        g = np.asarray(eval_mod.log_spectral_distance_gated(
            jnp.asarray(amp), jnp.asarray(amp)))
        np.testing.assert_allclose(g, 0.0, atol=1e-5)

    def test_evaluate_parity_loop_fused_match(self, corpus, tmp_path):
        """parity_metrics=True adds the columns in BOTH eval paths with
        equal values, and write_reports emits <name>_parity.csv."""
        model = models.UNet(number_filters_0=4)
        sample = (corpus.features[:2],
                  jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
        variables = train.init_model(model, sample)
        keys = ("lsd_db", "lsd_gated_db", "t60_true_s", "t60_pred_s",
                "t60_rel_err")

        r_loop = eval_mod.evaluate(
            model, variables, corpus,
            eval_mod.EvalConfig(batch_size=2, parity_metrics=True))
        r_fused = eval_mod.evaluate(
            model, variables, corpus,
            eval_mod.EvalConfig(batch_size=2, parity_metrics=True, fused=True))
        for k in keys:
            assert k in r_loop.per_sample
            np.testing.assert_allclose(r_fused.per_sample[k],
                                       r_loop.per_sample[k],
                                       rtol=1e-4, atol=1e-6, err_msg=k)
        # gated <= plain + eps (dropping floor-saturated frames cannot
        # raise the average above the plain metric here: tails are silent)
        assert np.median(r_loop.per_sample["lsd_gated_db"]) <= (
            np.median(r_loop.per_sample["lsd_db"]) + 1e-3)

        folder = eval_mod.write_reports(r_loop, str(tmp_path), "unet", "ph")
        parity_csv = os.path.join(folder, "unet_parity.csv")
        assert os.path.exists(parity_csv)
        import pandas as pd

        df = pd.read_csv(parity_csv)
        assert list(df["room"])[0] == "Global"
        assert "T60 rel err median" in df.columns

    def test_parity_csv_reverberant_aggregate_row(self, tmp_path):
        """VERDICT r3 #8 done-criterion: the honest T60 aggregate (excluding
        the estimator-floor HemiAnechoic room) is a machine-readable CSV row,
        not prose. Construct a result where HemiAnechoic carries a huge
        estimator-floor error and check the Reverberant row excludes it."""
        import pandas as pd

        rooms = (["HemiAnechoicRoom"] * 2 + ["LargeMeetingRoom"] * 2
                 + ["MediumMeetingRoom"] * 2 + ["ShoeBoxRoom"] * 2
                 + ["SmallMeetingRoom"] * 2)
        n = len(rooms)
        t60_err = np.full(n, 0.04, np.float32)
        t60_err[:2] = 0.9  # the estimator floor (68-91% on TRUE wavs)
        per_sample = {
            "lsd_db": np.full(n, 10.0, np.float32),
            "lsd_gated_db": np.full(n, 7.0, np.float32),
            "t60_rel_err": t60_err,
            "t60_true_s": np.full(n, 0.5, np.float32),
            "t60_pred_s": np.full(n, 0.5, np.float32),
        }
        result = eval_mod.EvalResult(
            per_sample=per_sample, rooms=rooms,
            timing={"t_model_inference_avg": 0.0, "t_postprocess": 0.0,
                    "t_loss_calc": 0.0, "t_global": 0.0},
            n_samples=n, batch_size=2)
        # room_means needs the reference metric keys too
        for k in ("mse_spectrogram", "mse_magnitude", "phase_1mcos",
                  "mse_waveform", "mse_waveform_50ms",
                  "misalignment_magnitude_db", "misalignment_waveform_db"):
            per_sample[k] = np.zeros(n, np.float32)

        folder = eval_mod.write_reports(result, str(tmp_path), "agg", "ph")
        df = pd.read_csv(os.path.join(folder, "agg_parity.csv"))
        assert list(df["room"])[:2] == ["Global", "Reverberant"]
        assert "T60 estimator floor" in df.columns
        by_room = df.set_index("room")
        assert by_room.loc["HemiAnechoic", "T60 estimator floor"] == "yes"
        assert by_room.loc["Reverberant", "T60 estimator floor"] == "no"
        assert by_room.loc["Global", "T60 estimator floor"] == "mixed"
        assert int(by_room.loc["Reverberant", "n samples"]) == 8
        # The honest aggregate excludes the floor samples entirely.
        assert float(by_room.loc["Reverberant", "T60 rel err mean"]) == (
            pytest.approx(0.04, rel=1e-3))
        assert float(by_room.loc["Global", "T60 rel err mean"]) == (
            pytest.approx((0.9 * 2 + 0.04 * 8) / 10, rel=1e-3))

    def test_default_eval_has_no_parity_columns(self, corpus):
        """Off by default: the reference metric schema stays untouched."""
        model = models.UNet(number_filters_0=4)
        sample = (corpus.features[:2],
                  jnp.stack([corpus.embeddings[:2]] * 2, axis=1))
        variables = train.init_model(model, sample)
        r = eval_mod.evaluate(model, variables, corpus,
                              eval_mod.EvalConfig(batch_size=2))
        assert "lsd_db" not in r.per_sample
