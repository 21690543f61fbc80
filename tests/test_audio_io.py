"""Audio I/O tests: WAV roundtrip, native decoder on real opus fixtures (uses the
reference checkout's test samples when present — data fixtures, not code)."""

from pathlib import Path

import numpy as np
import pytest

from fadtk_tpu.audio.wavio import float_to_int16, read_wav_int16, write_wav_int16

REF_SAMPLES = Path("/root/reference/fadtk/test/samples")


def test_wav_roundtrip_mono(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(12345) * 8000).astype(np.int16)
    f = tmp_path / "a.wav"
    write_wav_int16(f, x, 16000)
    y, sr = read_wav_int16(f)
    assert sr == 16000
    np.testing.assert_array_equal(x, y)


def test_wav_roundtrip_stereo(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((500, 2)) * 1000).astype(np.int16)
    f = tmp_path / "b.wav"
    write_wav_int16(f, x, 44100)
    y, sr = read_wav_int16(f)
    assert sr == 44100
    assert y.shape == (500, 2)
    np.testing.assert_array_equal(x, y)


def test_float_to_int16_clamps_and_rounds():
    x = np.array([0.0, 0.5, -1.5, 1.5, 1.0 - 0.5 / 32768])
    y = float_to_int16(x)
    assert y.dtype == np.int16
    assert y[0] == 0
    assert y[1] == 16384
    assert y[2] == -32768  # clamped
    assert y[3] == 32767  # clamped
    assert y[4] == 32767  # rounds to max representable


@pytest.mark.skipif(not REF_SAMPLES.exists(), reason="reference fixtures not present")
def test_native_decode_opus():
    from fadtk_tpu.audio.decode import decode_audio

    x, sr = decode_audio(REF_SAMPLES / "mg-66.opus")
    assert sr == 48000
    assert x.shape[0] == 1  # mono
    assert abs(x.shape[1] / sr - 10.0) < 0.2  # ~10 s clips
    assert x.dtype == np.float32
    rms = float(np.sqrt((x**2).mean()))
    assert 0.01 < rms < 1.0  # real audio, not silence / garbage


@pytest.mark.skipif(not REF_SAMPLES.exists(), reason="reference fixtures not present")
def test_decode_then_resample_pipeline(tmp_path):
    """The load_audio conversion path end-to-end: decode -> mono -> 16k -> wav."""
    from fadtk_tpu.audio.decode import decode_audio
    from fadtk_tpu.dsp.resample import resample_kaiser

    x, sr = decode_audio(REF_SAMPLES / "mubert-130.opus")
    mono = np.mean(x, axis=0)
    y = resample_kaiser(mono, sr, 16000)
    assert y.shape[0] == int(np.ceil(16000 * mono.shape[0] / sr))

    f = tmp_path / "c.wav"
    write_wav_int16(f, float_to_int16(y), 16000)
    z, zsr = read_wav_int16(f)
    assert zsr == 16000 and z.shape[0] == y.shape[0]


def test_decode_missing_file_raises():
    from fadtk_tpu.audio.decode import decode_audio

    with pytest.raises(FileNotFoundError):
        decode_audio("/nonexistent/file.opus")


def test_decode_garbage_bytes_raises(tmp_path):
    from fadtk_tpu.audio.decode import decode_audio

    f = tmp_path / "garbage.opus"
    f.write_bytes(b"\x00\x01\x02 not audio at all" * 100)
    with pytest.raises(RuntimeError, match="decode failed"):
        decode_audio(f)


def test_decode_empty_file_raises(tmp_path):
    from fadtk_tpu.audio.decode import decode_audio

    f = tmp_path / "empty.wav"
    f.write_bytes(b"")
    with pytest.raises(RuntimeError):
        decode_audio(f)


def test_wav_reader_rejects_non_riff(tmp_path):
    f = tmp_path / "x.wav"
    f.write_bytes(b"NOTRIFFDATA" * 10)
    with pytest.raises(ValueError, match="not a RIFF"):
        read_wav_int16(f)


def test_wav_reader_rejects_truncated_header(tmp_path):
    f = tmp_path / "t.wav"
    f.write_bytes(b"RIFF\x10\x00\x00\x00WAVE")  # no fmt/data chunks
    with pytest.raises(ValueError, match="missing fmt/data"):
        read_wav_int16(f)


def test_native_decoder_decodes_own_wav(tmp_path):
    """The libav decoder also handles plain wavs (fallback interop)."""
    from fadtk_tpu.audio.decode import decode_audio

    rng = np.random.default_rng(7)
    x = (rng.standard_normal(8000) * 8000).astype(np.int16)
    f = tmp_path / "w.wav"
    write_wav_int16(f, x, 16000)
    data, sr = decode_audio(f)
    assert sr == 16000 and data.shape == (1, 8000)
    np.testing.assert_allclose(data[0], x / 32768.0, atol=1e-4)
