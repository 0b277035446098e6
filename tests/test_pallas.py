"""Pallas kernel parity tests (interpret mode on the CPU mesh).

The kernel must match the pure-jnp ops pipeline within float32
matmul-DFT tolerance; the jnp ops are themselves golden-tested against
scipy in test_ops.py, so agreement here certifies the kernel.

Only the featurize kernel remains (VERDICT r2 item 8): the defeaturize
twin lost to the XLA matmul-DFT path in every measured cell and was
removed — PARITY.md "Pallas kernels" records the decision. featurize
auto-dispatches to the kernel on TPU at wide grids (F >= 301 frames).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unet_rir_tpu import ops
from unet_rir_tpu.ops.pallas import featurize_pallas


def _rir_batch(rng, b=3):
    t = np.arange(ops.N_SAMPLES) / ops.SAMPLE_RATE
    x = rng.standard_normal((b, ops.N_SAMPLES)) * np.exp(-t / 0.05)
    x[:, 100] = 1.0
    return x.astype(np.float32)


class TestFeaturizePallas:
    def test_matches_jnp_featurize(self, rng):
        wav = jnp.asarray(_rir_batch(rng))
        golden = np.asarray(ops.featurize(wav))
        kernel = np.asarray(featurize_pallas(wav, interpret=True))
        assert kernel.shape == golden.shape == (3, 144, 160, 2)
        # amplitude channel: dB-domain, tight
        np.testing.assert_allclose(kernel[..., 0], golden[..., 0], atol=2e-4)
        # phase channel: compare on the valid (unpadded) grid via wrapped
        # distance (atan2 vs fft angle can differ by 2pi at +-pi)
        pk = kernel[:, :129, :151, 1] * 2 * np.pi - np.pi
        pg = golden[:, :129, :151, 1] * 2 * np.pi - np.pi
        d = np.angle(np.exp(1j * (pk - pg)))
        assert np.abs(d).max() < 2e-3
        # padding stays zero
        assert np.abs(kernel[:, 129:, :, :]).max() == 0.0
        assert np.abs(kernel[:, :, 151:, :]).max() == 0.0

    def test_roundtrip_misalignment(self, rng):
        x = _rir_batch(rng)
        x -= x.mean(axis=-1, keepdims=True)
        y = np.asarray(ops.defeaturize(
            featurize_pallas(jnp.asarray(x), interpret=True)))
        mis = 20 * np.log10(np.linalg.norm(y - x, axis=-1) / np.linalg.norm(x, axis=-1))
        assert mis.max() < -35, mis


class TestPerDurationGrids:
    """Duration-parametric kernel (VERDICT r1 item 6): a second, longer
    grid keeps the fused fast path and full parity with the jnp ops."""

    N04 = 19200  # 0.4 s at 48 kHz -> F=301, grid (144, 304)

    def _rir_04(self, rng, b=2):
        t = np.arange(self.N04) / ops.SAMPLE_RATE
        x = rng.standard_normal((b, self.N04)) * np.exp(-t / 0.1)
        x[:, 100] = 1.0
        return x.astype(np.float32)

    def test_featurize_04s_matches_jnp(self, rng):
        wav = jnp.asarray(self._rir_04(rng))
        golden = np.asarray(ops.featurize(wav, use_pallas=False))
        kernel = np.asarray(featurize_pallas(wav, interpret=True))
        assert kernel.shape == golden.shape == (2, 144, 304, 2)
        np.testing.assert_allclose(kernel[..., 0], golden[..., 0], atol=2e-4)
        pk = kernel[:, :129, :301, 1] * 2 * np.pi - np.pi
        pg = golden[:, :129, :301, 1] * 2 * np.pi - np.pi
        assert np.abs(np.angle(np.exp(1j * (pk - pg)))).max() < 2e-3
        assert np.abs(kernel[:, 129:, :, :]).max() == 0.0
        assert np.abs(kernel[:, :, 301:, :]).max() == 0.0

    def test_featurize_13s_matches_jnp(self, rng):
        """The Large-room window (1.3 s -> F=976, grid (144, 976)) — the
        widest production grid; the auto-dispatch threshold routes TPU
        corpus builds at this width through the kernel."""
        n = 62400
        t = np.arange(n) / ops.SAMPLE_RATE
        x = (rng.standard_normal((1, n)) * np.exp(-t / 0.3)).astype(np.float32)
        x[:, 100] = 1.0
        wav = jnp.asarray(x)
        golden = np.asarray(ops.featurize(wav, use_pallas=False))
        kernel = np.asarray(featurize_pallas(wav, interpret=True))
        assert kernel.shape == golden.shape == (1, 144, 976, 2)
        np.testing.assert_allclose(kernel[..., 0], golden[..., 0], atol=2e-4)

    def test_features_dispatch_covers_hop_aligned(self):
        """featurize routes hop-aligned non-default durations through the
        kernel when forced; outputs line up through the public API."""
        wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 12032)).astype(np.float32))
        f_p = np.asarray(ops.featurize(wav, use_pallas=True))
        f_j = np.asarray(ops.featurize(wav, use_pallas=False))
        assert f_p.shape == f_j.shape == (1, 144, 192, 2)
        np.testing.assert_allclose(f_p[..., 0], f_j[..., 0], atol=2e-4)

    def test_auto_dispatch_threshold(self):
        """use_pallas=None picks the jnp path off-TPU regardless of width
        (this suite runs on the CPU mesh), and the forced kernel equals it."""
        from unet_rir_tpu.ops.features import _PALLAS_MIN_FRAMES

        assert _PALLAS_MIN_FRAMES == 301  # the measured 0.4 s crossover
        n = (301 - 1) * ops.HOP_LENGTH
        wav = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, n)).astype(np.float32))
        auto = np.asarray(ops.featurize(wav))
        forced = np.asarray(ops.featurize(wav, use_pallas=False))
        np.testing.assert_array_equal(auto, forced)
