"""Model registry: name -> flax Module factory.

Replaces the reference's if/elif dispatch blocks (main_training.py:119-161,
rir_generation.py:76-123) with one table. Short config names and their
default hyperparameters match the reference's entry-point constructors.
Dispatch follows the reference's substring semantics ('vae' in name etc.),
with longest-key-first matching so 'vqvae'/'diffvae' beat 'vae' and
'resae' beats 'ae'.
"""

from __future__ import annotations

from typing import Any, Callable

from unet_rir_tpu.models.ae_net import AENet
from unet_rir_tpu.models.autoencoder import Autoencoder
from unet_rir_tpu.models.cnn_clas import DeepCNN
from unet_rir_tpu.models.diff_unet import DiffUNet
from unet_rir_tpu.models.res_ae import ResAE
from unet_rir_tpu.models.unet import UNet
from unet_rir_tpu.models.vae import VAE, DiffVAE
from unet_rir_tpu.models.vqvae import VQVAE

MODEL_CLASSES: dict[str, Any] = {
    cls.__name__: cls
    for cls in (UNet, Autoencoder, ResAE, VAE, DiffVAE, VQVAE, DiffUNet, AENet, DeepCNN)
}

def _factory(cls, **defaults):
    """Factory with entry-point defaults; caller kwargs win."""
    return lambda **kw: cls(**{**defaults, **kw})


# Default constructor args per entry-point name (main_training.py:119-161).
MODEL_FACTORIES: dict[str, Callable[..., Any]] = {
    "unet": _factory(UNet, number_filters_0=32, kernels=3, mode=0),
    "diffunet": _factory(DiffUNet, number_filters_0=32, mode=0),
    "ae": _factory(
        Autoencoder, conv_filters=(64, 128, 256, 512), conv_kernels=(3, 3, 3, 3),
        conv_strides=(2, 2, 2, 2), latent_space_dim=64, n_neurons=32 * 64),
    "resae": _factory(
        ResAE, conv_filters=(32, 64, 128, 256), conv_kernels=(3, 3, 3, 3),
        conv_strides=(2, 2, 2, 2), latent_space_dim=32, n_neurons=16 * 64),
    "vae": _factory(
        VAE, conv_filters=(64, 128, 256, 512), conv_kernels=(3, 3, 3, 3),
        conv_strides=(2, 2, 2, 2), latent_space_dim=64, n_neurons=32 * 64),
    "diffvae": _factory(
        DiffVAE, conv_filters=(64, 128, 256, 512), conv_kernels=(3, 3, 3, 3),
        conv_strides=(2, 2, 2, 2), latent_space_dim=64, n_neurons=32 * 64),
    "vqvae": _factory(
        VQVAE, conv_filters=(32, 64, 128, 256), conv_kernels=(3, 3, 3, 3),
        conv_strides=(2, 2, 2, 2), latent_space_dim=16, n_neurons=320),
    "aenet": _factory(AENet, number_filters_0=32, mode=0),
    "cnn": _factory(DeepCNN),
}


def register(short_name: str, cls, factory=None):
    MODEL_CLASSES[cls.__name__] = cls
    MODEL_FACTORIES[short_name] = factory or (lambda **kw: cls(**kw))


def build_model(name: str, **overrides):
    """Construct a model by config name, reference substring dispatch."""
    if name in MODEL_FACTORIES:
        return MODEL_FACTORIES[name](**overrides)
    for key in sorted(MODEL_FACTORIES, key=len, reverse=True):
        if key in name:
            return MODEL_FACTORIES[key](**overrides)
    raise KeyError(f"unknown model name {name!r}; known: {sorted(MODEL_FACTORIES)}")


__all__ = ["MODEL_CLASSES", "MODEL_FACTORIES", "register", "build_model"]
