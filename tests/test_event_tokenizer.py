"""EventMIDITokenizer (reference transformer_draft.ipynb cell 5) parity and
round-trip tests, plus the evaluate_ast note-F1 scorer."""

import numpy as np
import pytest

from music_transcription_tpu.config import MIN_MIDI
from music_transcription_tpu.data.midi import Instrument, MidiFile, Note
from music_transcription_tpu.models.event_tokenizer import EventMIDITokenizer


def test_vocab_layout_matches_reference():
    tok = EventMIDITokenizer()
    assert (tok.sos, tok.eos, tok.pad) == (0, 1, 2)
    assert tok.note_on_id(0) == 10 and tok.note_on_id(127) == 137
    assert tok.note_off_id(0) == 160 and tok.note_off_id(127) == 287
    assert tok.time_shift_id(1) == 320 and tok.time_shift_id(100) == 419
    with pytest.raises(ValueError):
        EventMIDITokenizer(vocab_size=300)  # too small for the ranges


def test_notes_round_trip_exact():
    tok = EventMIDITokenizer(frame_rate=100)
    notes = [
        Note(pitch=60, start=0.00, end=0.50),
        Note(pitch=64, start=0.10, end=0.40),
        Note(pitch=60, start=0.70, end=1.25),  # same pitch again later
        Note(pitch=21, start=0.70, end=0.90),  # simultaneous onset
    ]
    ids = tok.encode_notes(notes, max_len=128)
    assert len(ids) == 128 and ids[0] == tok.sos and tok.eos in ids
    out = tok.decode_to_notes(ids)
    got = sorted((n.pitch, n.start, n.end) for n in out)
    want = sorted((n.pitch, round(n.start, 6), round(n.end, 6)) for n in notes)
    assert len(got) == len(want)
    for (gp, gs, ge), (wp, ws, we) in zip(got, want):
        assert gp == wp
        assert abs(gs - ws) < 1e-9 and abs(ge - we) < 1e-9


def test_off_before_on_at_same_frame():
    """Reference sorts OFF before ON at equal frames, so back-to-back repeats
    of a pitch survive the round trip."""
    tok = EventMIDITokenizer(frame_rate=100)
    notes = [Note(pitch=70, start=0.0, end=0.2), Note(pitch=70, start=0.2, end=0.4)]
    out = tok.decode_to_notes(tok.encode_notes(notes, max_len=64))
    assert [(n.start, n.end) for n in out] == [(0.0, 0.2), (0.2, 0.4)]


def test_zero_length_note_gets_one_frame():
    tok = EventMIDITokenizer(frame_rate=100)
    out = tok.decode_to_notes(tok.encode_notes([Note(pitch=60, start=1.0, end=1.0)]))
    assert len(out) == 1 and out[0].end - out[0].start == pytest.approx(0.01)


def test_long_gap_splits_time_shifts():
    tok = EventMIDITokenizer(frame_rate=100, max_time_shift=100)
    ids = tok.encode_notes([Note(pitch=60, start=2.5, end=2.6)], max_len=64)
    shifts = [tok.tok_to_shift(t) for t in ids if tok.is_time_shift(t)]
    assert shifts[:3] == [100, 100, 50]  # 250 frames split at the cap
    out = tok.decode_to_notes(ids)
    assert out[0].start == pytest.approx(2.5)


def test_hanging_note_closed_at_cursor():
    tok = EventMIDITokenizer(frame_rate=100)
    ids = [tok.sos, tok.note_on_id(60), tok.time_shift_id(30), tok.eos]
    out = tok.decode_to_notes(ids)
    assert len(out) == 1 and out[0].end == pytest.approx(0.30)


def test_truncation_reserves_eos():
    tok = EventMIDITokenizer(frame_rate=100)
    notes = [Note(pitch=30 + i, start=i * 0.01, end=i * 0.01 + 0.5) for i in range(64)]
    ids = tok.encode_notes(notes, max_len=32)
    assert len(ids) == 32 and ids[-1] == tok.eos


def test_encode_midi_and_roll_bridge():
    tok = EventMIDITokenizer(frame_rate=31.25)
    notes = [Note(pitch=60, start=0.32, end=0.96), Note(pitch=72, start=0.0, end=0.64)]
    midi = MidiFile(instruments=[Instrument(notes=list(notes)),
                                 Instrument(is_drum=True, notes=[Note(50, 0, 1)])])
    ids = tok.encode_midi(midi, max_len=64)
    out = tok.decode_to_notes(ids)
    assert len(out) == 2  # drum track excluded
    # pianoroll bridge: row r <-> MIDI pitch MIN_MIDI + r, exact on-grid trip
    roll = np.zeros((88, 40), np.float32)
    roll[60 - MIN_MIDI, 10:30] = 1.0
    roll[72 - MIN_MIDI, 0:20] = 1.0
    ids2 = tok.encode_from_pianoroll(roll, max_len=128)
    back = tok.decode_to_pianoroll(ids2, max_t=40)
    assert back.shape[0] == 88
    t = min(back.shape[1], 40)
    assert np.array_equal(back[:, :t], roll[:, :t])
    assert not roll[:, t:].any()


def test_decode_to_pianoroll_keeps_trailing_hanging_note():
    """A NOTE_ON at the final cursor (no trailing shift before <eos>) must
    appear in the roll — width covers every note's end frame, not just the
    time-shift sum."""
    tok = EventMIDITokenizer(frame_rate=100)
    ids = [tok.sos, tok.time_shift_id(10), tok.note_on_id(60), tok.eos]
    roll = tok.decode_to_pianoroll(ids, max_t=64)
    notes = tok.decode_to_notes(ids)
    assert len(notes) == 1
    assert roll.sum() == 1.0 and roll[60 - MIN_MIDI, 10] == 1.0


def test_tokenizer_choice_persists_in_model_config():
    """Checkpoints must record which vocabulary they were trained on
    (remi/event ids overlap but mean different things)."""
    from music_transcription_tpu.config import ModelConfig, config_to_dict

    cfg = ModelConfig(model_type="ast", tokenizer="event")
    d = config_to_dict(cfg)
    assert d["tokenizer"] == "event"
    assert ModelConfig(**d).tokenizer == "event"
    assert ModelConfig().tokenizer == "remi"  # default


def test_decode_never_crashes_on_arbitrary_ids():
    """Generation can emit ANY id < vocab_size (and callers may pass junk);
    decode must skip unknowns, never raise."""
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

    rng = np.random.default_rng(7)
    etok = EventMIDITokenizer()
    rtok = REMITokenizer()
    for _ in range(20):
        ids = rng.integers(0, 512, size=200).tolist()
        notes = etok.decode_to_notes(ids)
        for n in notes:
            assert n.end > n.start
        roll = etok.decode_to_pianoroll(ids, max_t=256)
        assert roll.shape[0] == 88 and roll.shape[1] <= 256
        roll2 = rtok.decode_to_pianoroll(ids, max_t=256)
        assert roll2.shape[0] == 88 and roll2.shape[1] <= 256
    # ids beyond vocab and negatives: still no crash
    junk = [-5, 999999, 2**31 - 1, 0, 1]
    etok.decode_to_notes(junk)
    rtok.decode_to_pianoroll(junk, max_t=16)


def test_note_f1_greedy_matching():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from music_transcription_tpu.eval import note_f1, trim_tokens

    ref = [(60, 0.0, 0.5), (64, 0.5, 1.0), (67, 1.0, 1.5)]
    pred = [(60, 0.02, 0.5), (64, 0.9, 1.0), (71, 1.0, 1.5)]
    m = note_f1(pred, ref, onset_tol=0.1, pitch_tol=0.5)
    assert m["tp"] == 1 and m["fp"] == 2 and m["fn"] == 2  # only the 60 matches
    # one ref note can only match once
    m2 = note_f1([(60, 0.0, 0.5), (60, 0.01, 0.5)], [(60, 0.0, 0.5)],
                 onset_tol=0.1, pitch_tol=0.0)
    assert m2["tp"] == 1 and m2["fp"] == 1
    assert trim_tokens([0, 2, 10, 2, 330, 1, 10]) == [0, 10, 330, 1]
