"""unet_rir_tpu — TPU-native room-impulse-response synthesis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``igmsalinas/unet-rir`` codebase (see /root/reference): STFT amplitude/phase
featurization, a conditional conv encoder-decoder model zoo (U-Net, AE,
ResAE, VAE, VQ-VAE, diff variants, AENet, CNN classifier), amp/phase blended
training losses, data-parallel training over a device mesh, and an on-device
inference + post-processing (iSTFT / Griffin-Lim) pipeline emitting RIR
waveforms.

Public flat names mirror the reference API surface (SURVEY.md §2 note):
``Dataset``, ``DataGenerator``, ``PostProcess``, model classes.
"""

from unet_rir_tpu import ops, rooms
from unet_rir_tpu.rooms import UTSRoom, return_room, ROOMS
from unet_rir_tpu.data import Corpus, Dataset, DataGenerator
from unet_rir_tpu.postprocess import PostProcess

__version__ = "0.1.0"

__all__ = [
    "ops",
    "rooms",
    "UTSRoom",
    "return_room",
    "ROOMS",
    "Corpus",
    "Dataset",
    "DataGenerator",
    "PostProcess",
]
