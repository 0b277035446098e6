"""Data-layer tests: pairing/split determinism, batch shapes, simulator."""

import os
import random

import numpy as np
import pytest

import jax.numpy as jnp

from unet_rir_tpu import data, rooms
from unet_rir_tpu.data.corpus import Corpus, Sample


@pytest.fixture(scope="module")
def corpus():
    return Corpus.synthetic(n_per_room=8, max_order=3)


class TestSimulator:
    def test_rir_shape_and_energy(self):
        dims = jnp.array([5.0, 4.0, 3.0])
        src = jnp.array([1.0, 1.0, 1.5])
        mic = jnp.array([3.5, 2.5, 1.5])
        rir = np.asarray(data.simulate_rir(dims, src, mic, jnp.asarray(0.4), max_order=5))
        assert rir.shape == (9600,)
        assert np.all(np.isfinite(rir))
        # Direct path arrives at d/c*fs
        d = np.linalg.norm(np.array([3.5, 2.5, 1.5]) - np.array([1.0, 1.0, 1.5]))
        t0 = int(d / 343.0 * 48000)
        assert np.abs(rir[: max(t0 - 2, 0)]).max() == 0.0
        assert np.abs(rir[t0 : t0 + 2]).max() > 0
        # Energy decays over time for a reverberant room
        early = np.sum(rir[:2400] ** 2)
        late = np.sum(rir[7200:] ** 2)
        assert early > late

    def test_longer_rt60_more_tail_energy(self):
        dims = jnp.array([5.0, 4.0, 3.0])
        src = jnp.array([1.0, 1.0, 1.5])
        mic = jnp.array([3.5, 2.5, 1.5])
        short = np.asarray(data.simulate_rir(dims, src, mic, jnp.asarray(0.2), max_order=6))
        long_ = np.asarray(data.simulate_rir(dims, src, mic, jnp.asarray(1.2), max_order=6))
        assert np.sum(long_[4800:] ** 2) > np.sum(short[4800:] ** 2)

    def test_batch(self):
        b = 4
        dims = jnp.tile(jnp.array([[5.0, 4.0, 3.0]]), (b, 1))
        src = jnp.tile(jnp.array([[1.0, 1.0, 1.5]]), (b, 1))
        mic = jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.5, (b, 3)).astype(np.float32))
        rirs = data.simulate_rir_batch(dims, src, mic, jnp.full((b,), 0.5), max_order=3)
        assert rirs.shape == (b, 9600)


class TestDiffuseTail:
    """Hybrid ISM + Sabine-decay noise tail (simulator._diffuse_tail).

    The order-6 image lattice cannot cover the Large room's 1.281 s T60
    (arrivals die at ~0.53 s; Schroeder fits read ~0.9 s). With the tail,
    the estimated T60 must track the nominal room T60 at a 1.3 s window."""

    def _large_room(self):
        import jax

        from unet_rir_tpu.data import simulator

        spec = rooms.ROOMS["LargeMeetingRoom"]
        dims, rt60 = simulator.room_to_shoebox(spec)
        src = np.clip(np.array([1.0, 1.0, 1.2]), 0.1, dims - 0.1)
        mic = np.clip(dims / 2, 0.1, dims - 0.1)
        return (jnp.asarray(dims, jnp.float32), jnp.asarray(src, jnp.float32),
                jnp.asarray(mic, jnp.float32), jnp.asarray(rt60, jnp.float32),
                rt60, jax.random.key(7))

    def test_large_room_t60_tracks_nominal_at_1p3s(self):
        from unet_rir_tpu.data import simulator
        from unet_rir_tpu.eval.metrics import t60_estimate

        d, s, m, r, rt60, key = self._large_room()
        pure = simulator.simulate_rir(d, s, m, r, n_samples=62400, max_order=6)
        tail = simulator.simulate_rir(d, s, m, r, n_samples=62400, max_order=6,
                                      diffuse_tail=True, key=key)
        est_pure = float(t60_estimate(pure[None])[0])
        est_tail = float(t60_estimate(tail[None])[0])
        assert abs(est_pure - rt60) / rt60 > 0.20  # the truncation problem
        assert abs(est_tail - rt60) / rt60 < 0.05  # the hybrid fix

    def test_deterministic_and_optin(self):
        from unet_rir_tpu.data import simulator

        d, s, m, r, _, key = self._large_room()
        a = simulator.simulate_rir(d, s, m, r, n_samples=9600, max_order=4,
                                   diffuse_tail=True, key=key)
        b = simulator.simulate_rir(d, s, m, r, n_samples=9600, max_order=4,
                                   diffuse_tail=True, key=key)
        assert jnp.array_equal(a, b)
        # Default (no tail) is the pure ISM — earlier results reproduce.
        plain = simulator.simulate_rir(d, s, m, r, n_samples=9600, max_order=4)
        with_tail_off = simulator.simulate_rir_batch(
            d[None], s[None], m[None], r[None], n_samples=9600, max_order=4)
        np.testing.assert_array_equal(np.asarray(plain),
                                      np.asarray(with_tail_off[0]))
        assert not np.array_equal(np.asarray(a), np.asarray(plain))

    def test_corpus_synthetic_diffuse_tail_seeded(self):
        c1 = Corpus.synthetic(n_per_room=2, max_order=2, diffuse_tail=True)
        c2 = Corpus.synthetic(n_per_room=2, max_order=2, diffuse_tail=True)
        np.testing.assert_array_equal(np.asarray(c1.wavs), np.asarray(c2.wavs))
        plain = Corpus.synthetic(n_per_room=2, max_order=2)
        assert not np.array_equal(np.asarray(c1.wavs), np.asarray(plain.wavs))


class TestCorpus:
    def test_synthetic_shapes(self, corpus):
        n = len(corpus)
        assert n == 5 * 8
        assert corpus.features.shape == (n, 144, 160, 2)
        assert corpus.embeddings.shape == (n, 16)
        assert corpus.embeddings.dtype == jnp.int32

    def test_pairing_within_room(self, corpus):
        """index_in[i] and index_out[i] must belong to the same room."""
        for a, b in zip(corpus.index_in, corpus.index_out):
            assert corpus.samples[a].room == corpus.samples[b].room

    def test_pairing_matches_reference_semantics(self, corpus):
        """Per-room lists shuffled with random.Random(500) in room order."""
        order = ["HemiAnechoicRoom", "LargeMeetingRoom", "MediumMeetingRoom",
                 "SmallMeetingRoom", "ShoeBoxRoom"]
        by_room = {name: [] for name in order}
        for i, s in enumerate(corpus.samples):
            if s.room in by_room:
                by_room[s.room].append(i)
        expected_out = []
        for name in order:
            lst = list(by_room[name])
            random.Random(500).shuffle(lst)
            expected_out.extend(lst)
        assert corpus.index_out == expected_out

    def test_embeddings_match_scalar_path(self, corpus):
        for i in (0, 7, 23):
            s = corpus.samples[i]
            scalar = rooms.ROOMS[s.room].return_embedding(s.characteristics)
            np.testing.assert_array_equal(np.asarray(corpus.embeddings[i]), scalar)


class TestDataGenerator:
    def test_split_sizes(self, corpus):
        n = len(corpus.index_in)
        train = data.DataGenerator(corpus, batch_size=4, partition="train")
        val = data.DataGenerator(corpus, batch_size=4, partition="val")
        test = data.DataGenerator(corpus, batch_size=4, partition="test")
        assert len(train._pairs) == int(0.7 * n)
        assert len(val._pairs) == int(0.9 * n) - int(0.7 * n)
        assert len(test._pairs) == n - int(0.9 * n)

    def test_batch_shapes(self, corpus):
        gen = data.DataGenerator(corpus, batch_size=4, partition="train")
        spec_in, emb, spec_out = gen[0]
        assert spec_in.shape == (4, 144, 160, 2)
        assert emb.shape == (4, 2, 16)
        assert spec_out.shape == (4, 144, 160, 2)
        assert emb.dtype == jnp.int32

    def test_deterministic_split(self, corpus):
        g1 = data.DataGenerator(corpus, batch_size=4, partition="test", shuffle=False)
        g2 = data.DataGenerator(corpus, batch_size=4, partition="test", shuffle=False)
        assert g1._pairs == g2._pairs

    def test_emb_stacks_in_and_out(self, corpus):
        gen = data.DataGenerator(corpus, batch_size=2, partition="train", shuffle=False)
        idx_in, idx_out = gen.batch_indices(0)
        _, emb, _ = gen[0]
        np.testing.assert_array_equal(np.asarray(emb[0, 0]), np.asarray(corpus.embeddings[idx_in[0]]))
        np.testing.assert_array_equal(np.asarray(emb[0, 1]), np.asarray(corpus.embeddings[idx_out[0]]))

    def test_characteristics(self, corpus):
        gen = data.DataGenerator(corpus, batch_size=2, partition="test",
                                 shuffle=False, characteristics=True)
        out = gen[0]
        assert len(out) == 4
        assert out[3].shape == (2, 5, 2)


class TestWavIO:
    def test_roundtrip(self, tmp_path, rng):
        wav = rng.standard_normal(9600).astype(np.float32) * 0.1
        p = str(tmp_path / "x.wav")
        data.write_wav(p, wav)
        back = data.read_wav(p)
        np.testing.assert_allclose(back, wav, atol=1e-6)

    def test_resample_and_trim(self, tmp_path, rng):
        import scipy.io.wavfile

        wav = rng.standard_normal(24000).astype(np.float32) * 0.1
        p = str(tmp_path / "y.wav")
        scipy.io.wavfile.write(p, 24000, wav)
        back = data.read_wav(p)  # 1 s at 24 kHz -> 0.2 s at 48 kHz
        assert back.shape == (9600,)


def test_duration_hop_alignment():
    """Non-hop-multiple durations round to the hop grid (no wav/STFT length
    mismatch in eval)."""
    c = Corpus.synthetic(n_per_room=2, max_order=2, duration=0.25)
    # 12000 samples is already a hop multiple of 64? 12000/64=187.5 -> rounds to 187*64=11968 or 188*64=12032
    n = c.wavs.shape[-1]
    assert n % 64 == 0
    assert c.stft_shape == (129, 1 + n // 64)
    # defeaturize length identity
    import unet_rir_tpu.ops.features as F

    wav = F.defeaturize(c.features[:1], stft_shape=c.stft_shape)
    assert wav.shape[-1] == n


def test_from_directory_debugging_flag(tmp_path, rng):
    """debugging=True loads only the first array folder that yields samples
    (reference dataset.py:24,127-170 quick-load semantics)."""
    import os

    import scipy.io.wavfile

    base = tmp_path / "ds" / "room_impulse"
    for room, zone, arr, n in [
        ("ShoeBoxRoom", "ZoneA", "CircularMicrophoneArray", 3),
        ("ShoeBoxRoom", "ZoneA", "PlanarMicrophoneArray", 2),
        ("SmallMeetingRoom", "ZoneB", "PlanarMicrophoneArray", 4),
    ]:
        d = base / room / zone / arr
        os.makedirs(d)
        for m in range(1, n + 1):
            wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
            scipy.io.wavfile.write(
                str(d / f"{room}_{zone}_{arr}_L1_M{m}.wav"), 48000, wav)

    quick = Corpus.from_directory(str(tmp_path / "ds"), debugging=True)
    # sorted walk order: ShoeBoxRoom/ZoneA/CircularMicrophoneArray first
    assert len(quick) == 3
    assert {s.array for s in quick.samples} == {"Circular"}
    full = Corpus.from_directory(str(tmp_path / "ds"))
    assert len(full) == 9


def test_from_directory_cache_roundtrip(tmp_path, rng):
    """cache_dir: second load comes from the .npz with identical arrays;
    touching a wav invalidates the key."""
    import os
    import time

    import scipy.io.wavfile

    base = tmp_path / "ds" / "room_impulse"
    d = base / "ShoeBoxRoom" / "ZoneA" / "PlanarMicrophoneArray"
    os.makedirs(d)
    for m in range(1, 5):
        wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
        scipy.io.wavfile.write(
            str(d / f"ShoeBoxRoom_ZoneA_PlanarMicrophoneArray_L1_M{m}.wav"),
            48000, wav)
    cache = str(tmp_path / "cache")

    c1 = Corpus.from_directory(str(tmp_path / "ds"), cache_dir=cache)
    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".npz")

    c2 = Corpus.from_directory(str(tmp_path / "ds"), cache_dir=cache)
    np.testing.assert_array_equal(np.asarray(c1.features), np.asarray(c2.features))
    np.testing.assert_array_equal(np.asarray(c1.wavs), np.asarray(c2.wavs))
    np.testing.assert_array_equal(np.asarray(c1.embeddings), np.asarray(c2.embeddings))
    assert [s.characteristics for s in c1.samples] == \
        [s.characteristics for s in c2.samples]
    assert c1.index_in == c2.index_in and c1.index_out == c2.index_out

    # mtime change -> new key -> rebuild (old entry remains)
    p = d / "ShoeBoxRoom_ZoneA_PlanarMicrophoneArray_L1_M1.wav"
    future = time.time() + 10
    os.utime(str(p), (future, future))
    Corpus.from_directory(str(tmp_path / "ds"), cache_dir=cache)
    assert len(os.listdir(cache)) == 2


def _write_tree(tmp_path, rng, n_samples, n_files=4, sr=48000):
    import os

    import scipy.io.wavfile

    base = tmp_path / "ds" / "room_impulse"
    d = base / "ShoeBoxRoom" / "ZoneA" / "PlanarMicrophoneArray"
    os.makedirs(d, exist_ok=True)
    for m in range(1, n_files + 1):
        wav = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
        scipy.io.wavfile.write(
            str(d / f"ShoeBoxRoom_ZoneA_PlanarMicrophoneArray_L1_M{m}.wav"),
            sr, wav)
    return str(tmp_path / "ds")


class TestMeasuredDuration:
    """VERDICT r2 item 2: `duration` is wired through the measured-corpus
    path, and length mismatches are LOUD — never the silent 0.2 s crop."""

    def test_wav_frames_header_scan(self, tmp_path, rng):
        import scipy.io.wavfile

        from unet_rir_tpu.data.wav_io import wav_frames

        p = str(tmp_path / "h.wav")
        scipy.io.wavfile.write(p, 24000,
                               (rng.standard_normal(4800) * 0.1).astype(np.float32))
        assert wav_frames(p) == (4800, 24000)
        # int16 too (different block align)
        p2 = str(tmp_path / "h16.wav")
        scipy.io.wavfile.write(p2, 48000,
                               (rng.standard_normal(9600) * 3000).astype(np.int16))
        assert wav_frames(p2) == (9600, 48000)

    def test_longer_duration_widens_features(self, tmp_path, rng):
        import warnings

        root = _write_tree(tmp_path, rng, 19200)  # 0.4 s at 48 kHz
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # exact-duration load stays silent
            c = Corpus.from_directory(root, duration=0.4)
        assert c.wavs.shape[-1] == 19200
        assert c.stft_shape == (129, 1 + 19200 // 64)
        assert c.features.shape[2] >= 301  # frame axis widened past 0.2 s's 160
        # defeaturize round-trips the full length
        import unet_rir_tpu.ops.features as F

        assert F.defeaturize(c.features[:1], stft_shape=c.stft_shape).shape[-1] == 19200

    def test_truncation_is_loud(self, tmp_path, rng):
        root = _write_tree(tmp_path, rng, 19200)
        with pytest.warns(UserWarning, match="TRUNCATED.*--duration"):
            c = Corpus.from_directory(root)  # default 0.2 s window
        assert c.wavs.shape[-1] == 9600

    def test_short_wavs_error_by_default(self, tmp_path, rng):
        root = _write_tree(tmp_path, rng, 4800)  # 0.1 s
        with pytest.raises(ValueError, match="shorter than"):
            Corpus.from_directory(root)
        with pytest.warns(UserWarning, match="zero-padded"):
            c = Corpus.from_directory(root, strict_duration=False)
        assert c.wavs.shape[-1] == 9600
        # Padded tail is flat (zero before DC removal, a constant after it).
        tail = np.asarray(c.wavs)[:, 4800:]
        np.testing.assert_allclose(tail.std(axis=-1), 0.0, atol=1e-7)

    def test_resampled_lengths_compared_at_pipeline_rate(self, tmp_path, rng):
        import warnings

        # 0.2 s at 24 kHz == 0.2 s at the 48 kHz pipeline rate: no warning.
        root = _write_tree(tmp_path, rng, 4800, sr=24000)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            c = Corpus.from_directory(root)
        assert c.wavs.shape[-1] == 9600

    def test_cache_key_includes_duration(self, tmp_path, rng):
        import os

        root = _write_tree(tmp_path, rng, 19200)
        cache = str(tmp_path / "cache")
        with pytest.warns(UserWarning):
            Corpus.from_directory(root, cache_dir=cache)  # 0.2 s entry
        c4 = Corpus.from_directory(root, cache_dir=cache, duration=0.4)
        assert len(os.listdir(cache)) == 2  # distinct keys per duration
        # 0.4 s reload hits its own entry and keeps the full length
        c4b = Corpus.from_directory(root, cache_dir=cache, duration=0.4)
        np.testing.assert_array_equal(np.asarray(c4.wavs), np.asarray(c4b.wavs))


def test_synthetic_cache_roundtrip(tmp_path, monkeypatch):
    """Corpus.synthetic(cache_dir=...): second build loads the .npz without
    touching the simulator; arrays and pairing identical."""
    import numpy as np

    from unet_rir_tpu.data import corpus as corpus_mod

    cache = str(tmp_path / "cache")
    c1 = Corpus.synthetic(n_per_room=4, room=["SmallMeetingRoom"],
                          max_order=2, cache_dir=cache)
    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".npz")

    def _boom(*a, **k):
        raise AssertionError("simulator must not run on a cache hit")

    monkeypatch.setattr(corpus_mod.simulator, "simulate_rir_batch", _boom)
    c2 = Corpus.synthetic(n_per_room=4, room=["SmallMeetingRoom"],
                          max_order=2, cache_dir=cache)
    np.testing.assert_array_equal(np.asarray(c1.features), np.asarray(c2.features))
    np.testing.assert_array_equal(np.asarray(c1.wavs), np.asarray(c2.wavs))
    assert c1.index_in == c2.index_in and c1.index_out == c2.index_out

    # A different config must MISS (new key), and with the simulator
    # patched out that miss is observable.
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="must not run"):
        Corpus.synthetic(n_per_room=4, room=["SmallMeetingRoom"],
                         max_order=3, cache_dir=cache)
