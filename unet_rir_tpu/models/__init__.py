"""Conditional conv model zoo (flax.linen, NHWC, TPU-first)."""

from unet_rir_tpu.models.unet import UNet
from unet_rir_tpu.models.autoencoder import Autoencoder
from unet_rir_tpu.models.res_ae import ResAE
from unet_rir_tpu.models.vae import VAE, DiffVAE
from unet_rir_tpu.models.vqvae import VQVAE, VectorQuantizer
from unet_rir_tpu.models.diff_unet import DiffUNet
from unet_rir_tpu.models.ae_net import AENet
from unet_rir_tpu.models.cnn_clas import DeepCNN
from unet_rir_tpu.models.io import save_pretrained, load_pretrained, param_count, predict_stft, summary
from unet_rir_tpu.models.registry import MODEL_CLASSES, MODEL_FACTORIES, build_model

__all__ = [
    "UNet",
    "Autoencoder",
    "ResAE",
    "VAE",
    "DiffVAE",
    "VQVAE",
    "VectorQuantizer",
    "DiffUNet",
    "AENet",
    "DeepCNN",
    "save_pretrained",
    "load_pretrained",
    "param_count",
    "predict_stft",
    "summary",
    "MODEL_CLASSES",
    "MODEL_FACTORIES",
    "build_model",
]
