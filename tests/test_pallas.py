"""Pallas kernel parity tests (interpret mode on the CPU mesh).

The kernels must match the pure-jnp ops pipelines within float32
matmul-DFT tolerance; the jnp ops are themselves golden-tested against
scipy in test_ops.py, so agreement here certifies the kernels.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unet_rir_tpu import ops
from unet_rir_tpu.ops.pallas import defeaturize_pallas, featurize_pallas


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


class TestDefeaturizePallas:
    def test_matches_jnp_defeaturize(self, rng):
        wav = jnp.asarray(_rir_batch(rng))
        feat = ops.featurize(wav)
        golden = np.asarray(ops.defeaturize(feat))
        kernel = np.asarray(defeaturize_pallas(feat, interpret=True))
        assert kernel.shape == golden.shape == (3, ops.N_SAMPLES)
        scale = np.abs(golden).max()
        np.testing.assert_allclose(kernel, golden, atol=2e-4 * scale)

    def test_roundtrip_misalignment(self, rng):
        x = _rir_batch(rng)
        x -= x.mean(axis=-1, keepdims=True)
        y = np.asarray(defeaturize_pallas(featurize_pallas(jnp.asarray(x), interpret=True), interpret=True))
        mis = 20 * np.log10(np.linalg.norm(y - x, axis=-1) / np.linalg.norm(x, axis=-1))
        assert mis.max() < -35, mis
