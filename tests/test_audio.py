"""WAV decode / resample / chunking tests."""

import struct
import wave

import numpy as np
import pytest

from music_transcription_tpu.data import audio as A


def write_wav(path, y, sr, sampwidth=2, channels=1):
    y = np.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            data = (np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
        else:
            raise NotImplementedError
        w.writeframes(data)


def test_load_wav_pcm16_mono(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = tmp_path / "a.wav"
    write_wav(p, y, sr)
    out, got_sr = A.load_wav(p, sr=sr)
    assert got_sr == sr
    assert out.dtype == np.float32
    assert out.shape == (sr,)
    assert np.abs(out - y.astype(np.float32)).max() < 1e-3


def test_load_wav_stereo_mixdown(tmp_path):
    sr = 8000
    left = np.full(100, 0.5)
    right = np.full(100, -0.25)
    p = tmp_path / "st.wav"
    write_wav(p, np.stack([left, right], axis=1).reshape(100, 2), sr, channels=2)
    out, _ = A.load_wav(p)
    assert out.shape == (100,)
    assert np.allclose(out, 0.125, atol=1e-3)


def test_load_wav_offset_duration(tmp_path):
    sr = 1000
    y = np.arange(1000) / 1000.0 - 0.5
    p = tmp_path / "o.wav"
    write_wav(p, y, sr)
    out, _ = A.load_wav(p, offset=0.25, duration=0.5)
    assert out.shape == (500,)
    assert np.abs(out[0] - y[250]) < 1e-3


def test_load_wav_resample(tmp_path):
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    y = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = tmp_path / "r.wav"
    write_wav(p, y, sr_in)
    out, got_sr = A.load_wav(p, sr=sr_out)
    assert got_sr == sr_out
    # Should stay a 440 Hz sine: compare against the ideal, away from edges.
    ref = 0.5 * np.sin(2 * np.pi * 440 * np.arange(len(out)) / sr_out)
    mid = slice(1000, len(out) - 1000)
    assert np.abs(out[mid] - ref[mid]).max() < 5e-3


def test_pcm24_decode(tmp_path):
    sr = 8000
    vals = np.array([0, 1, -1, 8388607, -8388608], dtype=np.int64)
    raw = b"".join(struct.pack("<i", int(v))[:3] for v in vals)
    data_size = len(raw)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24)
        + b"data"
        + struct.pack("<I", data_size)
    )
    p = tmp_path / "p24.wav"
    p.write_bytes(hdr + raw)
    out, got_sr = A.load_wav(p)
    assert got_sr == sr
    expected = vals / 8388608.0
    assert np.allclose(out, expected, atol=1e-7)


def test_audio_duration(tmp_path):
    sr = 16000
    p = tmp_path / "d.wav"
    write_wav(p, np.zeros(sr * 3), sr)
    assert A.audio_duration(p) == pytest.approx(3.0)


def test_split_into_chunks_pads_tail():
    y = np.ones(2500, dtype=np.float32)
    chunks = A.split_into_chunks(y, 1000)
    assert chunks.shape == (3, 1000)
    assert chunks[:2].sum() == 2000
    assert chunks[2, :500].sum() == 500
    assert chunks[2, 500:].sum() == 0


def test_split_short_audio_single_chunk():
    y = np.ones(10, dtype=np.float32)
    chunks = A.split_into_chunks(y, 1000)
    assert chunks.shape == (1, 1000)


def test_split_into_chunks_overlapped():
    y = np.arange(2500, dtype=np.float32)
    chunks = A.split_into_chunks(y, 1000, hop_samples=600)
    # starts at 0, 600, 1200, 1800 (1800+1000 covers 2500 padded to 2800)
    assert chunks.shape == (4, 1000)
    assert np.array_equal(chunks[0], y[:1000])
    assert np.array_equal(chunks[1], y[600:1600])
    assert np.array_equal(chunks[3, :700], y[1800:2500])
    assert chunks[3, 700:].sum() == 0  # zero-padded tail
    # hop >= chunk falls back to the non-overlapping layout
    assert np.array_equal(A.split_into_chunks(y, 1000, hop_samples=1000),
                          A.split_into_chunks(y, 1000))
    # short audio still yields one chunk
    assert A.split_into_chunks(np.ones(10, np.float32), 1000,
                               hop_samples=600).shape == (1, 1000)


def test_fix_length():
    y = np.arange(5.0)
    assert A.fix_length(y, 3).tolist() == [0, 1, 2]
    assert A.fix_length(y, 7).tolist() == [0, 1, 2, 3, 4, 0, 0]


# ---------------------------------------------------------------------------
# Compressed-audio fallback (reference data/dataset.py:69-71,119-121 swaps
# .wav -> .mp3 per file; decode of non-WAV containers delegates to the
# optional soundfile package)
# ---------------------------------------------------------------------------


class _StubSoundFile:
    """Minimal stand-in for the soundfile module: 'decodes' any file to a
    fixed ramp so the fallback branch is testable without a real mp3 codec."""

    samplerate = 8000
    frames = 8000

    class SoundFile:
        samplerate = 8000

        def __init__(self, path):
            self.pos = 0

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def seek(self, n):
            self.pos = n

        def read(self, frames=-1, dtype="float32", always_2d=True):
            total = 8000
            n = total - self.pos if frames in (-1, None) else min(frames, total - self.pos)
            data = (np.arange(self.pos, self.pos + n, dtype=np.float32) / total)[:, None]
            return data if always_2d else data[:, 0]

    @staticmethod
    def info(path):
        return _StubSoundFile


def test_load_audio_optional_decoder_branch(tmp_path, monkeypatch):
    """A non-WAV container decodes through the optional soundfile package
    (stubbed): offset/duration windowing, mono, and resampling all apply."""
    import sys

    fake = tmp_path / "x.mp3"
    fake.write_bytes(b"ID3\x04\x00 not a riff file")
    monkeypatch.setitem(sys.modules, "soundfile", _StubSoundFile())
    y, sr = A.load_audio(fake, sr=16000, mono=True, offset=0.25, duration=0.5)
    assert sr == 16000
    assert y.shape == (8000,)  # 0.5 s at the requested rate (stub is 8 kHz)
    # the stub ramp starts at 0.25 of full scale at the offset point
    assert abs(float(y[10]) - 0.25) < 0.01
    assert A.audio_duration(fake) == 1.0


def test_load_audio_no_decoder_actionable_error(tmp_path, monkeypatch):
    """Without any optional decoder, a non-WAV file fails with an actionable
    message (install a decoder / convert to WAV) — not a raw parse error."""
    import sys

    fake = tmp_path / "x.mp3"
    fake.write_bytes(b"ID3\x04\x00 not a riff file")
    monkeypatch.setitem(sys.modules, "soundfile", None)  # forces ImportError
    with pytest.raises(A.AudioDecodeError, match="convert to WAV"):
        A.load_audio(fake)
    with pytest.raises(A.AudioDecodeError, match="convert to WAV"):
        A.audio_duration(fake)


def test_maestro_wav_to_mp3_path_fallback(tmp_path):
    """_resolve_audio_path: .wav missing but .mp3 present -> the mp3 path;
    neither present -> FileNotFoundError naming both tried paths."""
    from music_transcription_tpu.data.maestro import _resolve_audio_path

    root = tmp_path
    (root / "2017").mkdir()
    (root / "2017" / "piece.mp3").write_bytes(b"x")
    assert _resolve_audio_path(str(root), "2017/piece.wav").endswith("piece.mp3")
    with pytest.raises(FileNotFoundError, match=r"piece2\.wav.*piece2\.mp3"):
        _resolve_audio_path(str(root), "2017/piece2.wav")
