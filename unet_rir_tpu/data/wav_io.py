"""Host-side wav read/write (librosa/soundfile-free).

The reference loads via librosa (preprocess.py:51-57: resample to 48 kHz,
0.2 s duration, mono, then DC removal) and writes via scipy
(postprocess.py:135-149). librosa is not a dependency here: reading uses
scipy.io.wavfile + polyphase resampling, which reproduces the same
contract (48 kHz mono float32, fixed 9600 samples).
"""

from __future__ import annotations

import numpy as np
import scipy.io.wavfile
import scipy.signal

from unet_rir_tpu.ops.stft import N_SAMPLES, SAMPLE_RATE


def read_wav(
    path: str,
    sample_rate: int = SAMPLE_RATE,
    duration: float | None = 0.2,
    mono: bool = True,
) -> np.ndarray:
    """Load a wav as float32 at `sample_rate`, trimmed/padded to duration."""
    sr, data = scipy.io.wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if mono and data.ndim > 1:
        data = data.mean(axis=1)
    if sr != sample_rate:
        g = np.gcd(int(sample_rate), int(sr))
        data = scipy.signal.resample_poly(data, sample_rate // g, sr // g).astype(np.float32)
    if duration is not None:
        n = int(round(duration * sample_rate))
        if len(data) >= n:
            data = data[:n]
        else:
            data = np.pad(data, (0, n - len(data)))
    return data.astype(np.float32)


def wav_frames(path: str) -> tuple[int, int]:
    """(n_frames, sample_rate) from the RIFF header alone — no sample data
    is read, so scanning a whole corpus for duration mismatches is cheap
    (used by Corpus.from_directory's loud-truncation contract)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE file: {path}")
        sr = block_align = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], int.from_bytes(hdr[4:8], "little")
            if cid == b"fmt ":
                fmt = f.read(size + (size & 1))
                sr = int.from_bytes(fmt[4:8], "little")
                block_align = int.from_bytes(fmt[12:14], "little")
            elif cid == b"data":
                if not sr or not block_align:
                    raise ValueError(f"data chunk before fmt in {path}")
                return size // block_align, sr
            else:
                f.seek(size + (size & 1), 1)
    raise ValueError(f"no data chunk in {path}")


def write_wav(path: str, wav: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    """Write float32 wav (scipy, as the reference does in postprocess.py:149)."""
    scipy.io.wavfile.write(path, sample_rate, np.asarray(wav, dtype=np.float32))


class Loader:
    """Object API parity with reference preprocess.Loader (incl. DC removal)."""

    def __init__(self, sample_rate=SAMPLE_RATE, duration=0.2, mono=True):
        self.sample_rate = sample_rate
        self.duration = duration
        self.mono = mono

    def load(self, file_path: str) -> np.ndarray:
        signal = read_wav(file_path, self.sample_rate, self.duration, self.mono)
        return signal - signal.mean()


__all__ = ["read_wav", "wav_frames", "write_wav", "Loader", "N_SAMPLES",
           "SAMPLE_RATE"]
