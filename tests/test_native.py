"""Native hostkit tests: build, and bit-parity with the Python fallbacks."""

import os
import wave

import numpy as np
import pytest

from music_transcription_tpu import native
from music_transcription_tpu.data import audio as A
from music_transcription_tpu.data import midi as M

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ compiler available to build hostkit"
)


def _write_wav(path, y, sr=16000, channels=1):
    y = np.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def test_wav_info(tmp_path):
    p = tmp_path / "a.wav"
    _write_wav(p, np.zeros(1234), sr=22050)
    info = native.wav_info(p)
    assert info.sample_rate == 22050
    assert info.channels == 1
    assert info.bits == 16
    assert info.n_frames == 1234


def test_decode_matches_python_mono(tmp_path):
    rng = np.random.default_rng(0)
    y = (rng.random(5000) * 2 - 1).astype(np.float32)
    p = tmp_path / "m.wav"
    _write_wav(p, y)
    got = native.decode_wav(p)
    os.environ["MT_DISABLE_NATIVE"] = "1"
    try:
        # force the numpy fallback inside load_wav by disabling native in a
        # fresh decode (env checked at first load only, so call internals)
        with open(p, "rb") as f:
            fmt, ch, sr, bits, off, size = A._parse_wav_header(f)
            f.seek(off)
            raw = f.read(size)
        ref = A._decode_frames(raw, fmt, bits, ch)[:, 0]
    finally:
        del os.environ["MT_DISABLE_NATIVE"]
    assert np.array_equal(got, ref)


def test_decode_matches_python_stereo_window(tmp_path):
    rng = np.random.default_rng(1)
    y = (rng.random((4000, 2)) * 2 - 1).astype(np.float32)
    p = tmp_path / "s.wav"
    _write_wav(p, y, channels=2)
    got = native.decode_wav(p, start_frame=500, n_frames=1000)
    with open(p, "rb") as f:
        fmt, ch, sr, bits, off, size = A._parse_wav_header(f)
        f.seek(off + 500 * 4)
        raw = f.read(1000 * 4)
    ref = A._decode_frames(raw, fmt, bits, ch).mean(axis=1)
    assert got.shape == (1000,)
    assert np.abs(got - ref).max() < 1e-7


def test_load_wav_uses_native_and_matches(tmp_path):
    rng = np.random.default_rng(2)
    y = (rng.random(8000) * 2 - 1).astype(np.float32)
    p = tmp_path / "n.wav"
    _write_wav(p, y)
    via_api, sr = A.load_wav(p, sr=16000, offset=0.1, duration=0.25)
    assert sr == 16000
    assert via_api.shape == (4000,)


def test_fill_roll_matches_python():
    rng = np.random.default_rng(3)
    notes = [
        M.Note(pitch=int(rng.integers(21, 109)), start=float(rng.random() * 2),
               end=0.0, velocity=int(rng.integers(1, 127)))
        for _ in range(50)
    ]
    for n in notes:
        n.end = n.start + float(rng.random())
    fs, n_cols = 31.25, 100
    got = native.fill_roll(
        [n.pitch for n in notes], [n.start for n in notes],
        [n.end for n in notes], [n.velocity for n in notes], fs, n_cols,
    )
    ref = np.zeros((128, n_cols))
    for n in notes:
        a, b = int(n.start * fs), int(n.end * fs)
        ref[n.pitch, max(0, min(a, n_cols)) : max(0, min(b, n_cols))] += n.velocity
    assert np.array_equal(got, ref)


def test_instrument_roll_same_with_and_without_native():
    inst = M.Instrument(
        notes=[M.Note(pitch=60, start=0.0, end=0.5, velocity=50),
               M.Note(pitch=64, start=0.25, end=1.0, velocity=70)],
    )
    mf = M.MidiFile(instruments=[inst])
    roll = mf.piano_roll(fs=100)
    ref = np.zeros((128, 100))
    ref[60, 0:50] += 50
    ref[64, 25:100] += 70
    assert np.array_equal(roll, ref)
