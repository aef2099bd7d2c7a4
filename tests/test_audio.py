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


def test_fix_length():
    y = np.arange(5.0)
    assert A.fix_length(y, 3).tolist() == [0, 1, 2]
    assert A.fix_length(y, 7).tolist() == [0, 1, 2, 3, 4, 0, 0]
