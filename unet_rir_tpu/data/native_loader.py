"""ctypes binding to the native corpus-ingest library (native/ririo.cc).

Decodes a whole wav corpus in parallel C++ threads into one float32
(N, n_samples) buffer — the host-side hot path when building a measured
corpus (the reference decodes serially via librosa,
dataset.py:123-182 + preprocess.py:51-57). Auto-builds the shared library
with the repo Makefile on first use; callers fall back to the pure-Python
scipy path when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from unet_rir_tpu.ops.stft import N_SAMPLES, SAMPLE_RATE

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libririo.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> ctypes.CDLL | None:
    """Load (building if needed) libririo.so; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        # Always run make: it is an mtime no-op when libririo.so is current
        # and rebuilds it when ririo.cc changed (a stale .so would silently
        # miss newer symbols like rir_write_wav_batch).
        if not _build() and not os.path.exists(_LIB_PATH):
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rir_version.restype = ctypes.c_int
            lib.rir_read_wav.restype = ctypes.c_int
            lib.rir_read_wav.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.rir_read_wav_batch.restype = ctypes.c_int
            lib.rir_read_wav_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            if hasattr(lib, "rir_write_wav_batch"):
                lib.rir_write_wav.restype = ctypes.c_int
                lib.rir_write_wav.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int, ctypes.c_int,
                ]
                lib.rir_write_wav_batch.restype = ctypes.c_int
                lib.rir_write_wav_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                ]
            assert lib.rir_version() >= 1
            _lib = lib
        except Exception:
            _load_failed = True
        return _lib


def available() -> bool:
    return load_library() is not None


def read_wav_batch(
    paths: list[str],
    n_samples: int = N_SAMPLES,
    sample_rate: int = SAMPLE_RATE,
    n_threads: int = 0,
    strict: bool = True,
) -> np.ndarray | None:
    """Parallel-decode paths -> (N, n_samples) float32 (DC-removed).

    Returns None when the native library is unavailable (caller falls back
    to the scipy loader). strict=True (default) raises if any file fails
    to decode — silently training on zero-filled rows would poison the
    corpus; strict=False keeps the zero-filled rows with a warning.
    """
    lib = load_library()
    if lib is None or not paths:
        return None
    out = np.zeros((len(paths), n_samples), dtype=np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = lib.rir_read_wav_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_samples, sample_rate, n_threads,
    )
    if failures:
        bad = [p for p, row in zip(paths, out) if not row.any()]
        msg = (f"native loader: {failures}/{len(paths)} wavs failed to decode "
               f"(first: {bad[:3]})")
        if strict:
            raise IOError(msg)
        import warnings

        warnings.warn(msg)
    return out


def write_wav_batch(
    paths: list[str],
    wavs: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_threads: int = 0,
) -> bool:
    """Parallel-write (N, n_samples) float32 rows as mono IEEE-float WAVs
    (byte-identical to scipy.io.wavfile.write with float32 input, the
    reference's writer — postprocess.py:149).

    Returns False when the native library is unavailable or lacks the
    writer (caller falls back to the scipy loop); raises on write errors.
    """
    lib = load_library()
    if lib is None or not hasattr(lib, "rir_write_wav_batch") or not paths:
        return False
    wavs = np.ascontiguousarray(wavs, dtype=np.float32)
    assert wavs.shape[0] == len(paths)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = lib.rir_write_wav_batch(
        arr, len(paths), wavs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wavs.shape[1], sample_rate, n_threads,
    )
    if failures:
        raise IOError(f"native writer: {failures}/{len(paths)} wavs failed")
    return True


__all__ = ["available", "load_library", "read_wav_batch", "write_wav_batch"]
