"""Edge-case robustness for the in-house WAV decoder and MIDI parser
(replacements for soundfile/pretty_midi — real-world files exercise these)."""

import struct
import wave

import numpy as np
import pytest

from music_transcription_tpu.data import audio as audio_io
from music_transcription_tpu.data import midi as midi_io


# ------------------------------------------------------------------ WAV

def _wav_header(fmt_code, channels, sr, bits, data, extra_chunks=b""):
    blockalign = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, sr, sr * blockalign,
                      blockalign, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += extra_chunks
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_float32_wav(tmp_path):
    sr = 16000
    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "f32.wav"
    p.write_bytes(_wav_header(3, 1, sr, 32, y.tobytes()))
    out, got_sr = audio_io.load_wav(str(p), sr=None)
    assert got_sr == sr
    np.testing.assert_allclose(out, y, atol=1e-6)


def test_pcm8_wav(tmp_path):
    sr = 8000
    y = np.linspace(-1, 1, sr, dtype=np.float32)
    data = np.clip((y * 127.5 + 127.5), 0, 255).astype(np.uint8).tobytes()
    p = tmp_path / "u8.wav"
    p.write_bytes(_wav_header(1, 1, sr, 8, data))
    out, got_sr = audio_io.load_wav(str(p), sr=None)
    assert got_sr == sr
    # u8 decodes as (x-128)/128: one-sided range, ~1/64 worst-case error
    np.testing.assert_allclose(out, y, atol=2 / 120)


def test_extra_chunks_before_data(tmp_path):
    """LIST/INFO and junk chunks between fmt and data must be skipped."""
    sr = 16000
    y = np.full(1000, 0.25, np.float32)
    data = (y * 32767).astype("<i2").tobytes()
    extra = b"LIST" + struct.pack("<I", 10) + b"INFOISFT\x00\x00"
    extra += b"junk" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    p = tmp_path / "extra.wav"
    p.write_bytes(_wav_header(1, 1, sr, 16, data, extra_chunks=extra))
    out, _ = audio_io.load_wav(str(p), sr=None)
    assert out.shape == (1000,)
    np.testing.assert_allclose(out, y, atol=1e-4)


def test_truncated_and_garbage_wavs_raise_cleanly(tmp_path):
    p = tmp_path / "bad.wav"
    for payload in (b"", b"RIFF", b"RIFF\x04\x00\x00\x00WAVE",
                    b"not a wav at all" * 4):
        p.write_bytes(payload)
        with pytest.raises(Exception) as ei:
            audio_io.load_wav(str(p))
        assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))


def test_odd_sized_chunk_padding(tmp_path):
    """RIFF chunks are word-aligned: an odd-sized chunk is followed by a pad
    byte that must be skipped to find `data`."""
    sr = 16000
    y = np.full(100, -0.5, np.float32)
    data = (y * 32768).astype("<i2").tobytes()
    odd = b"cue " + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    p = tmp_path / "odd.wav"
    p.write_bytes(_wav_header(1, 1, sr, 16, data, extra_chunks=odd))
    out, _ = audio_io.load_wav(str(p), sr=None)
    assert out.shape == (100,)


# ------------------------------------------------------------------ MIDI

def _smf(track_events, division=480, fmt=1):
    tracks = b""
    for ev in track_events:
        body = ev + b"\x00\xff\x2f\x00"  # end of track
        tracks += b"MTrk" + struct.pack(">I", len(body)) + body
    return (b"MThd" + struct.pack(">IHHH", 6, fmt, len(track_events), division)
            + tracks)


def test_running_status(tmp_path):
    """Consecutive channel events reusing the previous status byte."""
    ev = (b"\x00\x90\x3c\x40"      # t=0 note_on 60 v64
          b"\x00\x3e\x40"          # running status: note_on 62 v64
          b"\x81\x70\x3c\x00"      # dt=240 vel-0 -> note_off 60
          b"\x00\x3e\x00")         # running: off 62
    p = tmp_path / "rs.mid"
    p.write_bytes(_smf([ev]))
    m = midi_io.load_midi(str(p))
    notes = sorted(m.instruments[0].notes, key=lambda n: n.pitch)
    assert [n.pitch for n in notes] == [60, 62]
    # 240 ticks at 480 tpq, default 500000 us/q = 0.25 s
    for n in notes:
        assert n.start == pytest.approx(0.0)
        assert n.end == pytest.approx(0.25)


def test_note_on_velocity_zero_is_off(tmp_path):
    ev = b"\x00\x90\x45\x50" + b"\x60\x90\x45\x00"  # on 69, dt=96 on-with-v0
    p = tmp_path / "v0.mid"
    p.write_bytes(_smf([ev]))
    m = midi_io.load_midi(str(p))
    (n,) = m.instruments[0].notes
    assert n.pitch == 69 and n.end == pytest.approx(0.1)  # 96/480 * 0.5 s


def test_mid_track_tempo_change(tmp_path):
    """Tempo meta mid-stream: later deltas convert at the new tempo."""
    ev = (b"\x00\x90\x3c\x40"              # on 60 @ tick 0
          b"\x83\x60\xff\x51\x03\x0f\x42\x40"  # dt=480: tempo -> 1e6 us/q
          b"\x83\x60\x80\x3c\x00")         # dt=480: off 60
    p = tmp_path / "tempo.mid"
    p.write_bytes(_smf([ev]))
    m = midi_io.load_midi(str(p))
    (n,) = m.instruments[0].notes
    # 480 ticks @500ms/q = 0.5 s, then 480 ticks @1s/q = 1.0 s
    assert n.end == pytest.approx(1.5)


def test_multitrack_merge_and_channels(tmp_path):
    t1 = b"\x00\x90\x3c\x40" + b"\x60\x80\x3c\x00"          # ch0: 60
    t2 = b"\x00\x91\x40\x40" + b"\x60\x81\x40\x00"          # ch1: 64
    p = tmp_path / "multi.mid"
    p.write_bytes(_smf([t1, t2]))
    m = midi_io.load_midi(str(p))
    pitches = sorted(n.pitch for i in m.instruments for n in i.notes)
    assert pitches == [60, 64]


def test_truncated_and_garbage_midis_raise_cleanly(tmp_path):
    p = tmp_path / "bad.mid"
    for payload in (b"", b"MThd", b"MThd\x00\x00\x00\x06\x00\x01",
                    b"garbage" * 10):
        p.write_bytes(payload)
        with pytest.raises(Exception) as ei:
            midi_io.load_midi(str(p))
        assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))


def test_load_midi_accepts_wave_style_files_only(tmp_path):
    """A WAV handed to load_midi must raise, not hang or mis-parse."""
    p = tmp_path / "a.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 100)
    with pytest.raises(Exception):
        midi_io.load_midi(str(p))
