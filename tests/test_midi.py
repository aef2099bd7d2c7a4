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


def test_pedal_held_to_eof_not_extended():
    """pretty_midi only applies sustain on pedal on->off transitions; a
    pedal still down at end of file is dropped — targets must match."""
    inst = M.Instrument(
        notes=[M.Note(pitch=60, start=0.0, end=0.1, velocity=50)],
        control_changes=[M.ControlChange(number=64, value=100, time=0.0)],  # never released
    )
    roll = M.MidiFile(instruments=[inst]).piano_roll(fs=100)
    assert (roll[60, :10] == 50).all()
    assert roll[60, 10:].sum() == 0  # NOT extended


def test_note_off_closes_all_open_notes(tmp_path):
    """Two overlapping note-ons at the same pitch end together on one off
    (pretty_midi re-strike semantics)."""
    import struct

    division = 480

    def vl(v):
        return M._varlen(v)

    # note_on @0, note_on @240, note_off @480
    track = (
        vl(0) + bytes([0x90, 60, 80])
        + vl(240) + bytes([0x90, 60, 90])
        + vl(240) + bytes([0x80, 60, 0])
        + b"\x00\xff\x2f\x00"
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
        + b"MTrk" + struct.pack(">I", len(track)) + track
    )
    p = tmp_path / "overlap.mid"
    p.write_bytes(data)
    back = M.load_midi(p)
    notes = sorted(back.instruments[0].notes, key=lambda n: n.start)
    assert len(notes) == 2
    assert notes[0].end == notes[1].end  # both closed by the single off
    assert notes[0].velocity == 80 and notes[1].velocity == 90


def test_same_tick_note_kept_open(tmp_path):
    """note_on and note_off on the same tick: the note stays open for a
    later off when the off also closed another note (pretty_midi rule)."""
    import struct

    division = 480
    vl = M._varlen
    # on@0 (vel 80), on@480 (vel 90), off@480 (closes the first; keeps the
    # second open since it started on the off tick), off@960 (closes second)
    track = (
        vl(0) + bytes([0x90, 60, 80])
        + vl(480) + bytes([0x90, 60, 90])
        + vl(0) + bytes([0x80, 60, 0])
        + vl(480) + bytes([0x80, 60, 0])
        + b"\x00\xff\x2f\x00"
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
        + b"MTrk" + struct.pack(">I", len(track)) + track
    )
    p = tmp_path / "sametick.mid"
    p.write_bytes(data)
    notes = sorted(M.load_midi(p).instruments[0].notes, key=lambda n: n.start)
    assert len(notes) == 2
    assert notes[0].velocity == 80 and notes[1].velocity == 90
    assert notes[1].start == pytest.approx(notes[0].end)


def test_times_denser_than_fs_uses_single_column():
    """times spacing < 1/fs: pretty_midi widens the empty span to one column
    instead of leaving the frame zero."""
    inst = M.Instrument(notes=[M.Note(pitch=60, start=0.0, end=1.0, velocity=50)])
    mf = M.MidiFile(instruments=[inst])
    times = np.linspace(0.0, 1.0, 50)  # spacing 0.0204 s < 1/31.25
    roll = mf.piano_roll(fs=31.25, times=times)
    # every frame whose start column exists in the dense roll is active
    # (duplicated columns widened to one, pretty_midi rule); frames whose
    # start column falls past the roll end stay zero.
    n_cols = int(31.25 * 1.0)
    cols = np.round(times * 31.25).astype(int)
    expect_active = cols[:-1] < n_cols
    assert ((roll[60, :-1] > 0) == expect_active).all()
    assert expect_active.sum() >= 45  # the dense grid is mostly in range


def test_format2_rejected(tmp_path):
    import struct

    data = b"MThd" + struct.pack(">IHHH", 6, 2, 1, 480) + b"MTrk" + struct.pack(">I", 4) + b"\x00\xff\x2f\x00"
    p = tmp_path / "fmt2.mid"
    p.write_bytes(data)
    with pytest.raises(ValueError, match="format 2"):
        M.load_midi(p)
