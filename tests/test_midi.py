"""MIDI parse/write round-trip and piano-roll semantics tests."""

import numpy as np
import pytest

from music_transcription_tpu.config import MIN_MIDI
from music_transcription_tpu.data import midi as M


def test_varlen_roundtrip():
    for v in [0, 1, 127, 128, 200, 16383, 16384, 2097151, 2097152]:
        enc = M._varlen(v)
        dec, pos = M._read_varlen(enc, 0)
        assert dec == v and pos == len(enc)


def test_save_load_roundtrip(tmp_path):
    notes = [
        M.Note(pitch=60, start=0.0, end=0.5, velocity=100),
        M.Note(pitch=64, start=0.25, end=1.0, velocity=80),
        M.Note(pitch=21, start=1.0, end=1.5, velocity=100),
        M.Note(pitch=108, start=1.2, end=2.0, velocity=1),
    ]
    mf = M.notes_to_midi(notes)
    path = tmp_path / "out.mid"
    M.save_midi(mf, path)
    back = M.load_midi(path)
    assert len(back.instruments) == 1
    got = sorted(back.instruments[0].notes, key=lambda n: (n.start, n.pitch))
    assert len(got) == 4
    for a, b in zip(got, sorted(notes, key=lambda n: (n.start, n.pitch))):
        assert a.pitch == b.pitch
        assert a.start == pytest.approx(b.start, abs=2e-3)
        assert a.end == pytest.approx(b.end, abs=2e-3)


def test_load_applies_tempo_map(tmp_path):
    # Write a file at 120bpm, then hand-patch a tempo change by writing two
    # tempo events through the low-level writer.
    mf = M.notes_to_midi([M.Note(pitch=60, start=1.0, end=2.0)])
    path = tmp_path / "t.mid"
    M.save_midi(mf, path, tempo_us_per_quarter=250000)  # 240 bpm
    back = M.load_midi(path)
    n = back.instruments[0].notes[0]
    assert n.start == pytest.approx(1.0, abs=2e-3)
    assert n.end == pytest.approx(2.0, abs=2e-3)


def test_piano_roll_basic():
    inst = M.Instrument(notes=[M.Note(pitch=60, start=0.0, end=0.1, velocity=50)])
    mf = M.MidiFile(instruments=[inst])
    roll = mf.piano_roll(fs=100)
    assert roll.shape == (128, 10)
    assert (roll[60, 0:10] == 50).all()
    assert roll.sum() == 50 * 10


def test_piano_roll_sustain_pedal_extends_notes():
    # Note released at 0.1 s but pedal (CC64) held 0.0-0.5 s: the running-max
    # keeps the pitch sounding until pedal release.
    inst = M.Instrument(
        notes=[M.Note(pitch=60, start=0.0, end=0.1, velocity=50), M.Note(pitch=60, start=0.6, end=0.7, velocity=50)],
        control_changes=[
            M.ControlChange(number=64, value=100, time=0.0),
            M.ControlChange(number=64, value=0, time=0.5),
        ],
    )
    mf = M.MidiFile(instruments=[inst])
    roll = mf.piano_roll(fs=100)
    assert (roll[60, :50] == 50).all()  # extended to pedal release
    assert (roll[60, 50:60] == 0).all()
    assert (roll[60, 60:70] == 50).all()


def test_piano_roll_times_sampling_matches_reference_convention():
    # fs=31.25, times=np.linspace over int(duration*fs) points — the exact
    # call shape of reference data/dataset.py:141-144.
    fs = 31.25
    inst = M.Instrument(notes=[M.Note(pitch=70, start=0.5, end=1.0, velocity=90)])
    mf = M.MidiFile(instruments=[inst])
    times = np.linspace(0.0, 2.0, int(2.0 * fs))
    roll = mf.piano_roll(fs=fs, times=times, pedal_threshold=None)
    assert roll.shape == (128, 62)
    # Mean-integrated frames: active where the note overlaps the span.
    active = np.nonzero(roll[70] > 0)[0]
    assert active.size > 0
    # Frame index of 0.5s ~ 0.5 * fs / (2*fs/61) — just sanity-band check:
    assert active.min() >= 14 and active.max() <= 32
    # Final frame is always zero (pretty_midi leaves the last column empty).
    assert roll[:, -1].sum() == 0


def test_keys_roll_slices_88():
    inst = M.Instrument(
        notes=[
            M.Note(pitch=MIN_MIDI, start=0.0, end=0.5),
            M.Note(pitch=20, start=0.0, end=0.5),  # below range, sliced out
        ]
    )
    mf = M.MidiFile(instruments=[inst])
    roll = mf.keys_roll(fs=31.25)
    assert roll.shape[0] == 88
    assert roll[0].sum() > 0
    assert roll.sum() == roll[0].sum()  # pitch 20 excluded


def test_pianoroll_to_notes_matches_transition_semantics():
    roll = np.zeros((88, 20), dtype=np.float32)
    roll[10, 2:5] = 1  # note frames 2,3,4
    roll[10, 8:9] = 1  # single-frame note
    roll[50, 0:20] = 1  # full-length note
    notes = M.pianoroll_to_notes(roll, fs=31.25)
    assert len(notes) == 3
    by_pitch = {}
    for n in notes:
        by_pitch.setdefault(n.pitch, []).append(n)
    n1, n2 = by_pitch[MIN_MIDI + 10]
    assert n1.start == pytest.approx(2 / 31.25) and n1.end == pytest.approx(5 / 31.25)
    assert n2.start == pytest.approx(8 / 31.25) and n2.end == pytest.approx(9 / 31.25)
    (n3,) = by_pitch[MIN_MIDI + 50]
    assert n3.start == 0.0 and n3.end == pytest.approx(20 / 31.25)
    assert all(n.velocity == 100 for n in notes)


def test_pianoroll_to_notes_roundtrip_through_roll():
    rng = np.random.default_rng(0)
    roll = (rng.random((88, 64)) > 0.9).astype(np.float32)
    notes = M.pianoroll_to_notes(roll, fs=31.25)
    # Rebuild a roll from the notes at the same fs; should match exactly
    # (frame boundaries land on exact multiples of 1/fs).
    mf = M.notes_to_midi([M.Note(n.pitch - MIN_MIDI + MIN_MIDI, n.start, n.end) for n in notes])
    rebuilt = np.zeros_like(roll)
    for n in notes:
        a = int(round(n.start * 31.25))
        b = int(round(n.end * 31.25))
        rebuilt[n.pitch - MIN_MIDI, a:b] = 1
    assert (rebuilt == roll).all()
