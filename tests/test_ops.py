"""Unit tests for the L1 signal ops: golden STFT vs scipy, round-trips.

Covers the invariants implicit in the reference's preprocess.py __main__
smoke block (preprocess.py:124-207): shapes (129,151)->(144,160),
normalize∘denormalize = id, pad∘unpad = id, STFT→iSTFT misalignment below
threshold, Griffin-Lim convergence.
"""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from unet_rir_tpu import ops


def _rir_like(rng, n=ops.N_SAMPLES):
    """Synthetic exponentially-decaying noise burst resembling an RIR."""
    t = np.arange(n) / ops.SAMPLE_RATE
    x = rng.standard_normal(n) * np.exp(-t / 0.05)
    x[:64] = 0.0
    x[100] = 1.0  # direct path spike
    return x.astype(np.float32)


def _scipy_stft(x, pad_mode="reflect"):
    """librosa-convention STFT built from scipy primitives (golden model)."""
    n_fft, win, hop = ops.N_FFT, ops.WIN_LENGTH, ops.HOP_LENGTH
    w = scipy.signal.get_window("hann", win, fftbins=True)
    lpad = (n_fft - win) // 2
    w = np.pad(w, (lpad, n_fft - win - lpad))
    xp = np.pad(x, (n_fft // 2, n_fft // 2), mode=pad_mode)
    n_frames = 1 + (len(xp) - n_fft) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.fft.rfft(frames * w, n=n_fft).T


class TestSTFT:
    def test_shape(self, rng):
        x = _rir_like(rng)
        spec = ops.stft(jnp.asarray(x))
        assert spec.shape == (ops.N_BINS, ops.N_FRAMES) == (129, 151)

    def test_matches_scipy_golden(self, rng):
        x = _rir_like(rng)
        ours = np.asarray(ops.stft(jnp.asarray(x)))
        golden = _scipy_stft(x)
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)

    def test_batched(self, rng):
        x = rng.standard_normal((3, ops.N_SAMPLES)).astype(np.float32)
        spec = ops.stft(jnp.asarray(x))
        assert spec.shape == (3, 129, 151)
        single = ops.stft(jnp.asarray(x[1]))
        np.testing.assert_allclose(np.asarray(spec[1]), np.asarray(single), rtol=1e-5, atol=1e-6)

    def test_istft_roundtrip_misalignment_db(self, rng):
        """STFT -> iSTFT reconstruction must be far below -40 dB misalignment."""
        x = _rir_like(rng)
        spec = ops.stft(jnp.asarray(x))
        y = np.asarray(ops.istft(spec, length=ops.N_SAMPLES))
        num = np.linalg.norm(y - x)
        den = np.linalg.norm(x)
        misalignment_db = 20 * np.log10(num / den)
        assert misalignment_db < -60, misalignment_db

    def test_istft_output_length(self, rng):
        x = _rir_like(rng)
        y = ops.istft(ops.stft(jnp.asarray(x)))
        assert y.shape[-1] == ops.HOP_LENGTH * (ops.N_FRAMES - 1) == ops.N_SAMPLES

    def test_griffin_lim_reduces_spectral_error(self, rng):
        x = _rir_like(rng)
        amp = jnp.abs(ops.stft(jnp.asarray(x)))
        y = np.asarray(ops.griffin_lim(amp, n_iter=16))
        amp_y = np.abs(np.asarray(ops.stft(jnp.asarray(y))))
        rel = np.linalg.norm(amp_y - np.asarray(amp)) / np.linalg.norm(np.asarray(amp))
        assert rel < 0.35, rel  # GL converges toward the target magnitude


class TestNormalize:
    def test_formulas(self, rng):
        amp = np.abs(rng.standard_normal((129, 151))).astype(np.float32)
        phase = rng.uniform(-np.pi, np.pi, (129, 151)).astype(np.float32)
        a, p = ops.normalize(jnp.asarray(amp), jnp.asarray(phase))
        # Exact reference formulas (preprocess.py:26-32)
        a_ref = (20 * np.log10(amp / 128 + 1e-5) + 100) / 100
        p_ref = (phase + np.pi) / (2 * np.pi)
        np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-4, atol=1e-6)

    def test_roundtrip(self, rng):
        amp = np.abs(rng.standard_normal((129, 151))).astype(np.float64) + 1e-3
        phase = rng.uniform(-np.pi, np.pi - 1e-6, (129, 151))
        a, p = ops.normalize(jnp.asarray(amp), jnp.asarray(phase))
        a2, p2 = ops.denormalize(a, p)
        np.testing.assert_allclose(np.asarray(a2), amp, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(p2), phase, rtol=1e-4, atol=1e-6)

    def test_range(self, rng):
        x = _rir_like(rng)
        amp, phase = ops.stft_amp_phase(jnp.asarray(x))
        a, p = ops.normalize(amp, phase)
        assert float(jnp.min(p)) >= 0.0 and float(jnp.max(p)) <= 1.0
        assert float(jnp.max(a)) <= 1.5  # typical RIRs stay near [0, 1]


class TestPad:
    def test_pad_unpad_roundtrip(self, rng):
        amp = rng.standard_normal((129, 151)).astype(np.float32)
        phase = rng.standard_normal((129, 151)).astype(np.float32)
        ap, pp = ops.pad_amp_phase(jnp.asarray(amp), jnp.asarray(phase))
        assert ap.shape == pp.shape == (144, 160)
        au, pu = ops.un_pad(ap, pp)
        np.testing.assert_array_equal(np.asarray(au), amp)
        np.testing.assert_array_equal(np.asarray(pu), phase)

    def test_pad_is_zeros(self, rng):
        amp = jnp.ones((129, 151))
        padded = ops.pad_to(amp)
        assert float(jnp.sum(padded)) == 129 * 151
        assert float(jnp.sum(padded[129:, :])) == 0.0
        assert float(jnp.sum(padded[:, 151:])) == 0.0

    def test_batched_channels(self, rng):
        x = rng.standard_normal((4, 129, 151)).astype(np.float32)
        padded = ops.pad_to(jnp.asarray(x))
        assert padded.shape == (4, 144, 160)


class TestSigmoidMask:
    def test_matches_reference_formula(self):
        beta, h, w = 0.5, 144, 160
        mask = np.asarray(ops.sigmoid_mask(beta, (h, w)))
        x = np.linspace(-10, 10, w)
        z = np.flip(1 / (1 + np.exp(-(x + 5) * beta)))
        np.testing.assert_allclose(mask, np.tile(z, (h, 1)), rtol=1e-6)
        assert mask.shape == (h, w)
        # Early frames weighted ~1, late frames ~0
        assert mask[0, 0] > 0.99 and mask[0, -1] < 0.1


class TestFeaturize:
    def test_featurize_shape_and_inverse(self, rng):
        x = _rir_like(rng)
        feat = ops.featurize(jnp.asarray(x))
        assert feat.shape == (144, 160, 2)
        wav = np.asarray(ops.defeaturize(feat))
        assert wav.shape == (ops.N_SAMPLES,)
        xc = x - x.mean()
        mis_db = 20 * np.log10(np.linalg.norm(wav - xc) / np.linalg.norm(xc))
        assert mis_db < -30, mis_db  # float32 log-domain round-trip

    def test_featurize_batched(self, rng):
        x = rng.standard_normal((5, ops.N_SAMPLES)).astype(np.float32)
        feat = ops.featurize(jnp.asarray(x))
        assert feat.shape == (5, 144, 160, 2)

    def test_defeaturize_gl(self, rng):
        x = _rir_like(rng)
        feat = ops.featurize(jnp.asarray(x))
        wav = np.asarray(ops.defeaturize(feat, algorithm="gl"))
        assert wav.shape == (ops.N_SAMPLES,)
        assert np.all(np.isfinite(wav))


class TestMatmulTransforms:
    """The matmul-DFT method (TPU MXU path) must match the FFT method."""

    def test_stft_matmul_matches_fft(self, rng):
        x = jnp.asarray(_rir_like(rng))
        a = np.asarray(ops.stft(x, method="fft"))
        b = np.asarray(ops.stft(x, method="matmul"))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)

    def test_istft_matmul_matches_fft(self, rng):
        x = jnp.asarray(_rir_like(rng))
        spec = ops.stft(x, method="fft")
        a = np.asarray(ops.istft(spec, method="fft"))
        b = np.asarray(ops.istft(spec, method="matmul"))
        np.testing.assert_allclose(b, a, atol=2e-5)

    def test_griffin_lim_matmul(self, rng):
        x = _rir_like(rng)
        amp = jnp.abs(ops.stft(jnp.asarray(x), method="fft"))
        y = np.asarray(ops.griffin_lim(amp, n_iter=8, method="matmul"))
        assert np.all(np.isfinite(y)) and y.shape == (ops.N_SAMPLES,)


class TestVariableDuration:
    """Long-RIR support: wider frame axis, /16 grids, exact round-trip
    (SURVEY.md §5.7 scaling path)."""

    def test_model_shape_for(self):
        from unet_rir_tpu.ops.pad import model_shape_for

        assert model_shape_for((129, 151)) == (144, 160)
        assert model_shape_for((129, 301)) == (144, 304)
        assert model_shape_for((144, 160)) == (144, 160)

    def test_featurize_04s_roundtrip(self, rng):
        n = 19200  # 0.4 s
        t = np.arange(n) / ops.SAMPLE_RATE
        x = (rng.standard_normal((2, n)) * np.exp(-t / 0.1)).astype(np.float32)
        x -= x.mean(axis=-1, keepdims=True)
        feat = ops.featurize(jnp.asarray(x))
        assert feat.shape == (2, 144, 304, 2)
        wav = np.asarray(ops.defeaturize(feat, stft_shape=(129, 301)))
        assert wav.shape == (2, n)
        mis = 20 * np.log10(np.linalg.norm(wav - x, axis=-1) / np.linalg.norm(x, axis=-1))
        assert mis.max() < -30, mis

    def test_unet_forward_wide_grid(self, rng):
        """The zoo runs on any /16 grid — long-RIR width 304."""
        from unet_rir_tpu import models, train

        model = models.UNet(number_filters_0=2)
        spec = jnp.asarray(rng.uniform(0, 1, (1, 144, 304, 2)).astype(np.float32))
        emb = jnp.asarray(rng.integers(0, 1500, (1, 2, 16)).astype(np.int32))
        variables = train.init_model(model, (spec, emb))
        out = model.apply(variables, spec, emb, training=False)
        assert out.shape == (1, 144, 304, 2)

    def test_synthetic_corpus_04s(self):
        from unet_rir_tpu.data.corpus import Corpus

        corpus = Corpus.synthetic(n_per_room=2, max_order=2, duration=0.4)
        assert corpus.features.shape == (10, 144, 304, 2)
        assert corpus.wavs.shape == (10, 19200)
