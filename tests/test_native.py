"""Native C++ wav loader tests: parity with the scipy path + batch decode."""

import os

import numpy as np
import pytest
import scipy.io.wavfile

from unet_rir_tpu.data import native_loader, wav_io

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


def _write(tmp_path, name, data, sr=48000):
    p = str(tmp_path / name)
    scipy.io.wavfile.write(p, sr, data)
    return p


class TestNativeLoader:
    def test_float32_parity(self, tmp_path, rng):
        wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
        p = _write(tmp_path, "f32.wav", wav)
        native = native_loader.read_wav_batch([p])[0]
        python = wav_io.Loader().load(p)
        np.testing.assert_allclose(native, python, atol=1e-6)

    def test_int16_parity(self, tmp_path, rng):
        wav = (rng.standard_normal(9600) * 8000).astype(np.int16)
        p = _write(tmp_path, "i16.wav", wav)
        native = native_loader.read_wav_batch([p])[0]
        python = wav_io.Loader().load(p)
        np.testing.assert_allclose(native, python, atol=1e-5)

    def test_stereo_mixdown(self, tmp_path, rng):
        wav = (rng.standard_normal((9600, 2)) * 0.1).astype(np.float32)
        p = _write(tmp_path, "st.wav", wav)
        native = native_loader.read_wav_batch([p])[0]
        mono = wav.mean(axis=1)
        np.testing.assert_allclose(native, mono - mono.mean(), atol=1e-6)

    def test_trim_and_pad(self, tmp_path, rng):
        long = (rng.standard_normal(20000) * 0.1).astype(np.float32)
        short = (rng.standard_normal(1000) * 0.1).astype(np.float32)
        pl_ = _write(tmp_path, "long.wav", long)
        ps = _write(tmp_path, "short.wav", short)
        out = native_loader.read_wav_batch([pl_, ps])
        assert out.shape == (2, 9600)
        # short file zero-padded (after DC removal the pad is -mean)
        assert np.allclose(out[1, 1000:], out[1, 1500], atol=1e-7)

    def test_dc_removed(self, tmp_path, rng):
        wav = (rng.standard_normal(9600) * 0.1 + 0.25).astype(np.float32)
        p = _write(tmp_path, "dc.wav", wav)
        native = native_loader.read_wav_batch([p])[0]
        assert abs(native.mean()) < 1e-5

    def test_batch_parallel(self, tmp_path, rng):
        paths = []
        for i in range(32):
            wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
            paths.append(_write(tmp_path, f"b{i}.wav", wav))
        out = native_loader.read_wav_batch(paths, n_threads=8)
        assert out.shape == (32, 9600)
        singles = np.stack([wav_io.Loader().load(p) for p in paths])
        np.testing.assert_allclose(out, singles, atol=1e-6)

    def test_missing_file_strict_raises(self, tmp_path, rng):
        wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
        good = _write(tmp_path, "ok.wav", wav)
        with pytest.raises(IOError, match="1/2 wavs failed"):
            native_loader.read_wav_batch([good, str(tmp_path / "nope.wav")])

    def test_missing_file_lenient_zero_fills(self, tmp_path, rng):
        wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
        good = _write(tmp_path, "ok2.wav", wav)
        with pytest.warns(UserWarning, match="1/2 wavs failed"):
            out = native_loader.read_wav_batch(
                [good, str(tmp_path / "nope.wav")], strict=False)
        assert np.abs(out[1]).max() == 0.0
        assert np.abs(out[0]).max() > 0.0

    def test_resample(self, tmp_path, rng):
        # 1 s at 24 kHz -> first 0.2 s at 48 kHz
        t = np.arange(24000) / 24000.0
        wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        p = _write(tmp_path, "rs.wav", wav, sr=24000)
        native = native_loader.read_wav_batch([p])[0]
        assert native.shape == (9600,)
        ref = np.sin(2 * np.pi * 440 * np.arange(9600) / 48000.0)
        ref -= ref.mean()
        # Linear interp upsampling: coarse but phase-accurate
        assert np.corrcoef(native, ref)[0, 1] > 0.99


def test_corpus_uses_native_when_available(tmp_path, rng):
    """Corpus.from_directory decodes through the native batch loader."""
    base = tmp_path / "ds" / "room_impulse" / "ShoeBoxRoom" / "ZoneA" / "PlanarMicrophoneArray"
    os.makedirs(base)
    for m in (1, 2):
        wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
        scipy.io.wavfile.write(
            str(base / f"ShoeBoxRoom_ZoneA_PlanarMicrophoneArray_L1_M{m}.wav"), 48000, wav
        )
    from unet_rir_tpu.data.corpus import Corpus

    corpus = Corpus.from_directory(str(tmp_path / "ds"))
    assert len(corpus) == 2
    assert corpus.features.shape == (2, 144, 160, 2)
    assert corpus.samples[0].room == "ShoeBoxRoom"


def test_extract_zips(tmp_path, rng):
    import zipfile

    from unet_rir_tpu.data.corpus import extract_zips

    room = tmp_path / "room_impulse" / "ShoeBoxRoom" / "ZoneA"
    os.makedirs(room)
    wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
    inner = tmp_path / "tmp.wav"
    scipy.io.wavfile.write(str(inner), 48000, wav)
    zpath = room / "PlanarMicrophoneArray.zip"
    with zipfile.ZipFile(str(zpath), "w") as zf:
        zf.write(str(inner), "PlanarMicrophoneArray/ShoeBoxRoom_ZoneA_PlanarMicrophoneArray_L1_M1.wav")
    n = extract_zips(str(tmp_path / "room_impulse"))
    assert n == 1
    assert not zpath.exists()
    assert (room / "PlanarMicrophoneArray" / "ShoeBoxRoom_ZoneA_PlanarMicrophoneArray_L1_M1.wav").exists()


class TestNativeWriter:
    def test_write_wav_batch_byte_identical_to_scipy(self, tmp_path, rng):
        import scipy.io.wavfile

        from unet_rir_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native library unavailable")
        wavs = rng.standard_normal((3, 9600)).astype(np.float32)
        native_paths = [str(tmp_path / f"n{i}.wav") for i in range(3)]
        assert native_loader.write_wav_batch(native_paths, wavs)
        for i, p in enumerate(native_paths):
            sp = str(tmp_path / f"s{i}.wav")
            scipy.io.wavfile.write(sp, 48000, wavs[i])
            with open(p, "rb") as f1, open(sp, "rb") as f2:
                assert f1.read() == f2.read(), p

    def test_native_written_roundtrips_through_readers(self, tmp_path, rng):
        import scipy.io.wavfile

        from unet_rir_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native library unavailable")
        wavs = rng.standard_normal((2, 9600)).astype(np.float32)
        wavs -= wavs.mean(axis=-1, keepdims=True)
        paths = [str(tmp_path / f"r{i}.wav") for i in range(2)]
        assert native_loader.write_wav_batch(paths, wavs)
        # native batch reader (DC-removed by contract)
        back = native_loader.read_wav_batch(paths)
        np.testing.assert_allclose(back, wavs, atol=1e-6)
        # scipy reader
        rate, data = scipy.io.wavfile.read(paths[0])
        assert rate == 48000
        np.testing.assert_allclose(data, wavs[0], atol=0)
