"""Data layer: corpus discovery, device-resident batching, synthetic RIR gen."""

from unet_rir_tpu.data.corpus import Corpus, Dataset, Sample, SEED
from unet_rir_tpu.data.pipeline import DataGenerator, SPLITS
from unet_rir_tpu.data.wav_io import read_wav, write_wav, Loader
from unet_rir_tpu.data.simulator import simulate_rir, simulate_rir_batch, room_to_shoebox

__all__ = [
    "Corpus",
    "Dataset",
    "Sample",
    "SEED",
    "DataGenerator",
    "SPLITS",
    "read_wav",
    "write_wav",
    "Loader",
    "simulate_rir",
    "simulate_rir_batch",
    "room_to_shoebox",
]
