"""Pallas TPU kernels for the hot signal-processing paths.

jnp fallbacks with identical semantics live in unet_rir_tpu.ops; kernels
run interpreted on CPU for tests.
"""

from unet_rir_tpu.ops.pallas.stft_pallas import featurize_pallas

__all__ = ["featurize_pallas"]
