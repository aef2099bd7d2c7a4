"""Synthetic MAESTRO-v3 tree for data-layer tests: CSV + WAV + MIDI."""

import os
import wave

import numpy as np

from music_transcription_tpu.data import midi as midi_io


def write_wav(path, y, sr=16000):
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def make_maestro_root(root, sr=16000, pedal=False):
    """3 pieces (2 train @2017, 1 validation @2018), tones + aligned MIDI.

    ``pedal=True`` appends a 4th (train) piece whose note is released at
    1.0 s under a held CC64 sustain pedal (0.4–2.5 s): the tone keeps
    sounding to the pedal release, and pretty_midi-semantics targets extend
    the same way — so the sustain path is covered with real files, not just
    unit-level rolls. Opt-in to keep the default piece counts stable for
    the existing data-layer assertions.
    """
    root = str(root)
    os.makedirs(root, exist_ok=True)
    rows = []
    specs = [
        ("train", 2017, 4.0, [(60, 0.5, 1.5), (64, 2.0, 3.0)], None),
        ("train", 2017, 6.5, [(72, 0.0, 6.0)], None),
        ("validation", 2018, 3.0, [(55, 1.0, 2.0)], None),
    ]
    if pedal:
        # (key span 0.5-1.0, sounding span 0.5-2.5 under the pedal)
        specs.append(("train", 2017, 3.0, [(60, 0.5, 1.0)], (0.4, 2.5)))
    for i, (split, year, dur, notes, pedal_span) in enumerate(specs):
        rel_wav = f"{year}/piece{i}.wav"
        rel_mid = f"{year}/piece{i}.midi"
        t = np.arange(int(dur * sr)) / sr
        y = np.zeros_like(t)
        for pitch, s, e in notes:
            if pedal_span is not None and pedal_span[0] <= e < pedal_span[1]:
                e = pedal_span[1]  # dampers up: rings to the pedal release
            f = 440.0 * 2 ** ((pitch - 69) / 12)
            seg = (t >= s) & (t < e)
            y += 0.3 * np.sin(2 * np.pi * f * t) * seg
        write_wav(os.path.join(root, rel_wav), y, sr)
        mf = midi_io.notes_to_midi(
            [midi_io.Note(pitch=p, start=s, end=e, velocity=80) for p, s, e in notes]
        )
        if pedal_span is not None:
            mf.instruments[0].control_changes = [
                midi_io.ControlChange(number=64, value=100, time=pedal_span[0]),
                midi_io.ControlChange(number=64, value=0, time=pedal_span[1]),
            ]
        os.makedirs(os.path.dirname(os.path.join(root, rel_mid)), exist_ok=True)
        midi_io.save_midi(mf, os.path.join(root, rel_mid))
        rows.append(
            {
                "canonical_composer": "Test",
                "canonical_title": f"Piece {i}",
                "split": split,
                "year": year,
                "midi_filename": rel_mid,
                "audio_filename": rel_wav,
                "duration": dur,
            }
        )
    import pandas as pd

    pd.DataFrame(rows).to_csv(os.path.join(root, "maestro-v3.0.0.csv"), index=False)
    return root
