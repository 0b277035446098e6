"""Conditional conv model zoo (flax.linen, NHWC, TPU-first)."""

from unet_rir_tpu.models.unet import UNet
from unet_rir_tpu.models.io import save_pretrained, load_pretrained, param_count
from unet_rir_tpu.models.registry import MODEL_CLASSES, MODEL_FACTORIES, build_model

__all__ = [
    "UNet",
    "save_pretrained",
    "load_pretrained",
    "param_count",
    "MODEL_CLASSES",
    "MODEL_FACTORIES",
    "build_model",
]
