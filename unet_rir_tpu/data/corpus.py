"""RIR corpus: host-side discovery + device-side featurization (layer L2).

Re-designs the reference Dataset (/root/reference/dataset.py:11-244) for
TPU throughput:

* Host does only what hosts must: walk
  ``<dir>/<name>/<Room>/<Zone>/<Array>/*.wav``, parse
  ``Room_ZoneX_ArrayY_Lk_Mj.wav`` names (dataset.py:146-154), decode wavs.
* Featurization (STFT -> normalize -> pad) runs **batched on device** via
  ops.featurize — the reference runs librosa per file on host.
* The full featurized corpus lives as one (N, 144, 160, 2) HBM array;
  batching is an index gather, eliminating the Python-per-batch generator
  the reference bottlenecks on (SURVEY.md §7 hard part 7).
* Position pairing reproduces the reference semantics exactly: per-room
  index lists in discovery order; ``index_in`` = concatenation in room
  order hemi/large/medium/small/shoe; each room list shuffled with
  random.Random(seed=500); ``index_out`` = concatenation of the shuffled
  lists (dataset.py:173-182). Anechoic entries get embeddings but are not
  paired — same as the reference.

A synthetic path (`Corpus.synthetic`) generates the same structure from
the on-device image-source simulator, so training/eval run end-to-end
without the (unshippable) measured UTS dataset.
"""

from __future__ import annotations

import dataclasses
import os
import random
import re
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unet_rir_tpu import rooms as rooms_mod
from unet_rir_tpu.data import simulator, wav_io
from unet_rir_tpu.ops.features import featurize
from unet_rir_tpu.ops.stft import HOP_LENGTH, N_BINS, N_SAMPLES, SAMPLE_RATE

SEED = 500  # reference split/pairing seed (dataset.py:76)

# Room order used to build pairing lists (dataset.py:174).
_PAIRING_ORDER = (
    "HemiAnechoicRoom",
    "LargeMeetingRoom",
    "MediumMeetingRoom",
    "SmallMeetingRoom",
    "ShoeBoxRoom",
)

_DEFAULT_ROOMS = (
    "HemiAnechoicRoom",
    "LargeMeetingRoom",
    "MediumMeetingRoom",
    "ShoeBoxRoom",
    "SmallMeetingRoom",
)
_DEFAULT_ARRAYS = ("PlanarMicrophoneArray", "CircularMicrophoneArray")

_FNAME_RE = re.compile(
    r"^(?P<room>[A-Za-z]+)_Zone(?P<zone>[A-E])_(?P<array>[A-Za-z]+)MicrophoneArray_"
    r"L(?P<l>\d+)_M(?P<m>\d+)\.wav$"
)


@dataclasses.dataclass
class Sample:
    room: str
    zone: str
    array: str  # 'Planar' | 'Circular'
    l: int
    m: int

    @property
    def characteristics(self) -> list:
        """[room, zone, array, l, m] as the reference parses them."""
        return [self.room, self.zone, self.array, str(self.l), str(self.m)]


class Corpus:
    """Featurized RIR corpus resident in device memory.

    Attributes:
      features: (N, 144, 160, 2) float32 device array.
      embeddings: (N, 16) int32 device array.
      samples: list[Sample] metadata (host).
      index_in / index_out: reference-compatible paired index lists.
    """

    def __init__(
        self,
        features: jnp.ndarray,
        embeddings: jnp.ndarray,
        samples: list[Sample],
        seed: int = SEED,
        wavs: jnp.ndarray | None = None,
    ):
        self.features = features
        self.embeddings = embeddings
        self.samples = samples
        self.seed = seed
        # Raw waveforms kept for ground-truth waveform metrics
        # (the reference reloads them from disk per sample,
        # rir_generation.py:210-213; we keep them HBM-resident).
        self.wavs = wavs
        # Unpadded STFT grid for this corpus's duration ((129, 151) at 0.2 s);
        # consumed by the eval/defeaturize crop.
        n_samples = int(wavs.shape[-1]) if wavs is not None and wavs.ndim else N_SAMPLES
        self.stft_shape = (N_BINS, 1 + n_samples // HOP_LENGTH)
        self.index_in, self.index_out = self._pair_indices()

    # -- construction ------------------------------------------------------

    @classmethod
    def from_directory(
        cls,
        dir_dataset: str,
        dataset_name: str = "room_impulse",
        room: Sequence[str] | None = None,
        array: Sequence[str] | None = None,
        seed: int = SEED,
        feature_chunk: int = 256,
        extract: bool = False,
        debugging: bool = False,
        cache_dir: str | None = None,
        duration: float = 0.2,
        strict_duration: bool = True,
    ) -> "Corpus":
        """Walk the measured-dataset layout and featurize on device.

        extract=True first unpacks per-array .zip archives in place
        (reference Dataset.extract_files, dataset.py:93-115).
        debugging=True stops after the first array folder that yields
        samples — the reference's quick-load flag (dataset.py:24,127-170).
        cache_dir: persist the decoded+featurized corpus as one .npz keyed
        by the matched file list (path/mtime/size) and the duration; later
        runs load the arrays straight to device instead of re-decoding
        every wav (the reference re-featurizes the whole corpus on every
        start, dataset.py:123-182 — a multi-minute host cost at full scale).
        duration: RIR window in seconds (hop-aligned; reference contract is
        the fixed 0.2 s of preprocess.py:51-57 — here it is a knob, so
        longer measured RIRs train at full length, SURVEY §5.7).
        strict_duration=True raises when any matched wav is SHORTER than
        the requested window (zero-pad would silently dilute the corpus);
        wavs LONGER than the window always produce a loud truncation
        warning naming the fix (never the silent 0.2 s crop of round 2).
        """
        if extract:
            extract_zips(os.path.join(dir_dataset, dataset_name))
        sel_rooms = tuple(room) if room and list(room) != ["All"] else _DEFAULT_ROOMS
        sel_arrays = tuple(array) if array else _DEFAULT_ARRAYS

        base = os.path.join(dir_dataset, dataset_name)
        paths, samples = [], []
        done = False
        for room_folder in sorted(os.listdir(base)):
            if done:
                break
            room_path = os.path.join(base, room_folder)
            if not os.path.isdir(room_path):
                continue
            for zone_folder in sorted(os.listdir(room_path)):
                if done:
                    break
                zone_path = os.path.join(room_path, zone_folder)
                if not os.path.isdir(zone_path):
                    continue
                for array_folder in sorted(os.listdir(zone_path)):
                    if done:
                        break
                    array_path = os.path.join(zone_path, array_folder)
                    if not os.path.isdir(array_path):
                        continue
                    n_before = len(paths)
                    for fname in sorted(os.listdir(array_path)):
                        match = _FNAME_RE.match(fname)
                        if not match:
                            continue
                        g = match.groupdict()
                        full_array = g["array"] + "MicrophoneArray"
                        if g["room"] not in sel_rooms or full_array not in sel_arrays:
                            continue
                        paths.append(os.path.join(array_path, fname))
                        samples.append(
                            Sample(g["room"], g["zone"], g["array"], int(g["l"]), int(g["m"]))
                        )
                    if debugging and len(paths) > n_before:
                        done = True

        n_samples = _hop_aligned_samples(duration)
        _check_durations(paths, n_samples, strict=strict_duration)

        cache_path = None
        if cache_dir:
            cache_path = _cache_path(cache_dir, paths, n_samples)
            cached = _load_cache(cache_path)
            if cached is not None:
                features, wavs_a, embeddings, cached_samples = cached
                return cls(jnp.asarray(features), jnp.asarray(embeddings),
                           cached_samples, seed, wavs=jnp.asarray(wavs_a))

        wavs = _decode_paths(paths, n_samples)
        features = _featurize_chunked(wavs, feature_chunk)
        embeddings = _embed_samples(samples)
        if cache_path:
            _save_cache(cache_path, np.asarray(features), wavs,
                        np.asarray(embeddings), samples)
        return cls(features, embeddings, samples, seed, wavs=jnp.asarray(wavs))

    @classmethod
    def synthetic(
        cls,
        n_per_room: int = 32,
        room: Sequence[str] | None = None,
        seed: int = SEED,
        max_order: int = 6,
        duration: float = 0.2,
        diffuse_tail: bool = False,
        cache_dir: str | None = None,
    ) -> "Corpus":
        """Generate a corpus from the on-device image-source simulator.

        Speaker/mic indices are drawn round-robin over the real grids so
        embeddings are in-distribution; source/mic geometry comes from the
        room's shoebox approximation. `duration` (s) controls the RIR
        length; longer durations widen the spectrogram frame axis
        (SURVEY.md §5.7 long-RIR scaling). `diffuse_tail` crossfades the
        truncated image lattice into a Sabine-decay noise tail
        (simulator._diffuse_tail) so long-T60 rooms exhibit their real
        decay at wide windows — required for honest T60 means at ≥1.3 s.
        cache_dir persists the generated corpus keyed by the full
        generation config (deterministic), so resumed/chunked training
        runs skip the simulate+featurize build entirely.
        """
        sel_rooms = tuple(room) if room and list(room) != ["All"] else _DEFAULT_ROOMS
        cache_path = None
        if cache_dir:
            import hashlib

            key = (f"v{_CACHE_VERSION}|synth|n{n_per_room}"
                   f"|r{','.join(sel_rooms)}|s{seed}|o{max_order}"
                   f"|ns{_hop_aligned_samples(duration)}|dt{int(diffuse_tail)}")
            cache_path = os.path.join(
                cache_dir, f"corpus-{hashlib.sha1(key.encode()).hexdigest()[:16]}.npz")
            cached = _load_cache(cache_path)
            if cached is not None:
                features, wavs_a, embeddings, cached_samples = cached
                return cls(jnp.asarray(features), jnp.asarray(embeddings),
                           cached_samples, seed, wavs=jnp.asarray(wavs_a))
        samples: list[Sample] = []
        dims_l, src_l, mic_l, rt60_l = [], [], [], []
        zones = "ABCDE"
        arrays = ("Planar", "Circular")
        for rname in sel_rooms:
            spec = rooms_mod.ROOMS[rname]
            dims_m, rt60_s = simulator.room_to_shoebox(spec)
            for i in range(n_per_room):
                zone = zones[i % 5]
                arr = arrays[(i // 5) % 2]
                l = 1 + (i * 7) % 30
                m = 1 + (i * 11) % (64 if arr == "Planar" else 60)
                samples.append(Sample(rname, zone, arr, l, m))
                xl, yl, zl = spec.speaker_position(l)
                xm, ym, zm = spec.mic_position(zone, arr, m)
                # cm -> m; clamp into the shoebox with a 10 cm margin.
                src = np.clip(np.array([xl, yl, zl]) / 100.0, 0.1, dims_m - 0.1)
                mic = np.clip(np.array([xm, ym, zm]) / 100.0, 0.1, dims_m - 0.1)
                dims_l.append(dims_m)
                src_l.append(src)
                mic_l.append(mic)
                rt60_l.append(rt60_s)

        rirs = simulator.simulate_rir_batch(
            jnp.asarray(np.stack(dims_l), jnp.float32),
            jnp.asarray(np.stack(src_l), jnp.float32),
            jnp.asarray(np.stack(mic_l), jnp.float32),
            jnp.asarray(np.array(rt60_l), jnp.float32),
            n_samples=_hop_aligned_samples(duration),
            max_order=max_order,
            diffuse_tail=diffuse_tail,
            keys=(jax.random.split(jax.random.key(seed), len(samples))
                  if diffuse_tail else None),
        )
        rirs = rirs - jnp.mean(rirs, axis=-1, keepdims=True)
        features = featurize(rirs)
        embeddings = _embed_samples(samples)
        if cache_path:
            _save_cache(cache_path, np.asarray(features), np.asarray(rirs),
                        np.asarray(embeddings), samples)
        return cls(features, embeddings, samples, seed, wavs=rirs)

    # -- pairing (reference dataset.py:173-182) ------------------------------

    def _pair_indices(self) -> tuple[list[int], list[int]]:
        by_room: dict[str, list[int]] = {name: [] for name in _PAIRING_ORDER}
        for i, s in enumerate(self.samples):
            if s.room in by_room:
                by_room[s.room].append(i)
        index_in = [i for name in _PAIRING_ORDER for i in by_room[name]]
        shuffled = {}
        for name in _PAIRING_ORDER:
            lst = list(by_room[name])
            random.Random(self.seed).shuffle(lst)
            shuffled[name] = lst
        index_out = [i for name in _PAIRING_ORDER for i in shuffled[name]]
        return index_in, index_out

    # -- reference Dataset API parity ---------------------------------------

    def __len__(self) -> int:
        return int(self.features.shape[0])

    def __getitem__(self, index: int):
        feat = self.features[index]
        return feat[..., 0], feat[..., 1], self.embeddings[index]

    def return_characteristics(self):
        return [s.characteristics for s in self.samples]


def extract_zips(dataset_path: str) -> int:
    """Unpack <Room>/<Zone>/<Array>.zip archives in place; returns count
    (reference dataset.py:93-115 semantics: extract next to the zip, then
    delete the archive)."""
    import zipfile

    n = 0
    for root, _dirs, files in os.walk(dataset_path):
        for fname in files:
            if not fname.endswith(".zip"):
                continue
            full = os.path.join(root, fname)
            with zipfile.ZipFile(full) as zf:
                zf.extractall(root)
            os.remove(full)
            n += 1
    return n


_CACHE_VERSION = 1  # bump when the featurization pipeline changes


def _cache_path(cache_dir: str, paths: list[str], n_samples: int = N_SAMPLES) -> str:
    """Deterministic cache key over the matched file list: path + mtime +
    size + window length, so edits/additions/removals (and a different
    --duration) invalidate automatically."""
    import hashlib

    h = hashlib.sha1(f"v{_CACHE_VERSION}|n{n_samples}".encode())
    for p in paths:
        st = os.stat(p)
        h.update(f"{p}|{st.st_mtime_ns}|{st.st_size}\n".encode())
    return os.path.join(cache_dir, f"corpus-{h.hexdigest()[:16]}.npz")


def _load_cache(path: str):
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path, allow_pickle=False)
        samples = [
            Sample(str(r), str(zn), str(a), int(l), int(m))
            for r, zn, a, l, m in zip(z["rooms"], z["zones"], z["arrays"],
                                      z["ls"], z["ms"])
        ]
        return z["features"], z["wavs"], z["embeddings"], samples
    except Exception:
        return None  # corrupt/partial cache: fall through to a fresh build


def _save_cache(path: str, features, wavs, embeddings, samples: list["Sample"]):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # Writer-unique tmp name: concurrent writers (e.g. every process of a
    # multi-host launch missing the same cache key) must not truncate each
    # other's half-written archive; each publishes atomically and the last
    # os.replace wins with identical content.
    tmp = f"{path}.tmp.{os.getpid()}.npz"  # savez appends .npz only when missing
    np.savez(
        tmp,
        features=features,
        wavs=wavs,
        embeddings=embeddings,
        rooms=np.array([s.room for s in samples]),
        zones=np.array([s.zone for s in samples]),
        arrays=np.array([s.array for s in samples]),
        ls=np.array([s.l for s in samples], np.int32),
        ms=np.array([s.m for s in samples], np.int32),
    )
    os.replace(tmp, path)  # atomic publish: readers never see partial files


def _decode_paths(paths: list[str], n_samples: int = N_SAMPLES) -> np.ndarray:
    """Decode wavs to (N, n_samples) float32 with DC removed: native C++
    batch loader when available (data/native_loader.py), scipy fallback."""
    if not paths:
        return np.zeros((0, n_samples), np.float32)
    from unet_rir_tpu.data import native_loader

    wavs = native_loader.read_wav_batch(paths, n_samples=n_samples)
    if wavs is None:
        wavs = np.stack([
            wav_io.read_wav(p, duration=n_samples / SAMPLE_RATE)
            for p in paths
        ])
        wavs = wavs - wavs.mean(axis=-1, keepdims=True)
    return wavs


def _check_durations(paths: list[str], n_samples: int, strict: bool = True):
    """Loud duration contract for measured corpora (VERDICT r2 weak #3).

    Compares every wav's header length (resampled to the pipeline rate)
    against the requested window. Longer files => truncation WARNING naming
    the --duration fix; shorter files => error (strict) or padding warning.
    Header-only scan: no sample data is read.
    """
    import warnings

    shorter, longer = [], []
    max_len = 0
    for p in paths:
        frames, sr = wav_io.wav_frames(p)
        resampled = int(round(frames * SAMPLE_RATE / sr))
        max_len = max(max_len, resampled)
        if resampled < n_samples:
            shorter.append((p, resampled))
        elif resampled > n_samples:
            longer.append((p, resampled))
    if longer:
        warnings.warn(
            f"{len(longer)}/{len(paths)} wavs are longer than the requested "
            f"{n_samples / SAMPLE_RATE:.3g} s window (up to "
            f"{max_len / SAMPLE_RATE:.3g} s) and will be TRUNCATED; pass "
            f"duration={max_len / SAMPLE_RATE:.3g} (CLI: --duration) to keep "
            f"full length. First: {longer[0][0]}",
            stacklevel=3,
        )
    if shorter:
        msg = (
            f"{len(shorter)}/{len(paths)} wavs are shorter than the "
            f"requested {n_samples / SAMPLE_RATE:.3g} s window (min "
            f"{min(r for _, r in shorter) / SAMPLE_RATE:.3g} s); they would "
            f"be zero-padded. Pass a smaller duration, or "
            f"strict_duration=False to pad anyway. First: {shorter[0][0]}"
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=3)


def _hop_aligned_samples(duration: float) -> int:
    """Round duration*fs to a hop multiple so the STFT frame grid is exact
    (otherwise synthesized wavs would be hop-truncated vs the stored wavs)."""
    n = int(round(duration * SAMPLE_RATE / HOP_LENGTH)) * HOP_LENGTH
    return max(n, HOP_LENGTH)


def _embed_samples(samples: list[Sample]) -> jnp.ndarray:
    if not samples:
        return jnp.zeros((0, 16), jnp.int32)
    return jnp.asarray(
        rooms_mod.embed_descriptors([(s.room, s.zone, s.array, s.l, s.m) for s in samples])
    )


def _featurize_chunked(wavs: np.ndarray, chunk: int) -> jnp.ndarray:
    if wavs.shape[0] == 0:
        return jnp.zeros((0, 144, 160, 2), jnp.float32)
    outs = []
    for i in range(0, wavs.shape[0], chunk):
        outs.append(featurize(jnp.asarray(wavs[i : i + chunk])))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


# Flat public alias for reference-API parity (`Dataset`).
Dataset = Corpus

__all__ = ["Corpus", "Dataset", "Sample", "SEED"]
