"""PostProcess — reference-parity single-sample post-processing facade.

API-compatible with the reference PostProcess
(/root/reference/postprocess.py:25-159): unpad -> denormalize -> iSTFT (or
Griffin-Lim) -> write wav + .npy STFT, with the RIR filename derived from
the conditioning vector. The compute runs on device through
ops.defeaturize; only the file writes touch host.

The batched, fused path for throughput is eval.make_generate_fn — this
class exists for drop-in per-sample usage parity.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from unet_rir_tpu.data.wav_io import write_wav
from unet_rir_tpu.ops.features import defeaturize
from unet_rir_tpu.ops.pad import STFT_SHAPE
from unet_rir_tpu.ops.stft import SAMPLE_RATE


class PostProcess:
    def __init__(self, folder: str, algorithm: str | None = None,
                 out_dir: str = "generated_rir", save: bool = True,
                 stft_shape: tuple[int, int] = STFT_SHAPE):
        # Reference quirk fixed: it used `algorithm is 'gl'` (identity check,
        # postprocess.py:47); equality intended.
        self.algorithm = "gl" if algorithm == "gl" else "ph"
        self.wav_path = os.path.join(out_dir, f"{folder}_{self.algorithm}")
        self.save = save
        # Unpadded STFT grid; pass the model's (n_bins, n_frames) for
        # non-default durations so the crop keeps the full RIR tail.
        self.stft_shape = tuple(stft_shape)
        self.waveform: np.ndarray | None = None
        self.wav_name: str | None = None

    def post_process(self, feature, vector, sr: int = SAMPLE_RATE) -> np.ndarray:
        """feature (144,160,2) normalized -> RIR waveform; writes artifacts."""
        wav = defeaturize(jnp.asarray(feature), algorithm=self.algorithm,
                          stft_shape=self.stft_shape)
        self.waveform = np.asarray(wav)
        self.wav_name = "RIR" + "".join(f"-{int(v)}" for v in np.asarray(vector).ravel())
        if self.save:
            self.save_wav(sr)
            self.save_stft(feature)
        return self.waveform

    def save_wav(self, sr: int = SAMPLE_RATE) -> None:
        folder = os.path.join(self.wav_path, "rir")
        os.makedirs(folder, exist_ok=True)
        write_wav(os.path.join(folder, self.wav_name + ".wav"), self.waveform, sr)

    def save_stft(self, feature) -> None:
        folder = os.path.join(self.wav_path, "stft")
        os.makedirs(folder, exist_ok=True)
        np.save(os.path.join(folder, self.wav_name + ".npy"), np.asarray(feature))


__all__ = ["PostProcess"]
