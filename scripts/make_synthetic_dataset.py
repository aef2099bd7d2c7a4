#!/usr/bin/env python
"""Generate a synthetic MAESTRO-layout dataset (WAV + MIDI + CSV).

Random polyphonic "pieces" — overlapping notes across the 88-key range,
rendered as decaying harmonic tones — written in the exact MAESTRO-v3 tree
shape (year dirs, maestro-v3.0.0.csv), so every CLI in this repo (preprocess,
train, evaluate, main.py) runs on it unchanged. Uses:

  * install smoke test / demo without the 120 GB MAESTRO download
  * full-scale hardware validation: the 89M flagship trained on this through
    the real CLI chain reaches framewise F1 ~0.95 on its train set (round-1
    v5e run, README.md) — regenerate with this script
  * AST-tier experiments on non-trivial polyphony

    python scripts/make_synthetic_dataset.py --out synth_root \\
        --pieces 40 --duration 60 --seed 0
    python scripts/preprocess_dataset.py --root_dir synth_root ...
"""

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_transcription_tpu.config import MIN_MIDI, NUM_KEYS  # noqa: E402
from music_transcription_tpu.data import midi as midi_io  # noqa: E402


def build_parser():
    p = argparse.ArgumentParser(description="Synthetic MAESTRO-layout dataset")
    p.add_argument("--out", type=str, required=True, help="dataset root to create")
    p.add_argument("--pieces", type=int, default=20)
    p.add_argument("--duration", type=float, default=60.0,
                   help="seconds per piece")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_polyphony", type=int, default=6)
    p.add_argument("--notes_per_second", type=float, default=2.0)
    p.add_argument("--val_fraction", type=float, default=0.15)
    p.add_argument("--test_fraction", type=float, default=0.15)
    return p


def random_piece(rng, duration, notes_per_second, max_polyphony):
    """Random note list: Poisson-ish onsets, bounded polyphony, 88-key range."""
    n_notes = max(1, int(duration * notes_per_second))
    onsets = np.sort(rng.uniform(0.0, duration - 0.3, n_notes))
    notes = []
    for on in onsets:
        active = sum(1 for n in notes if n.start <= on < n.end)
        if active >= max_polyphony:
            continue
        pitch = int(rng.integers(MIN_MIDI, MIN_MIDI + NUM_KEYS))
        length = float(rng.uniform(0.15, 2.5))
        off = min(on + length, duration)
        vel = int(rng.integers(50, 112))
        notes.append(midi_io.Note(pitch=pitch, start=float(on), end=off, velocity=vel))
    return notes


def render(notes, duration, sr, rng):
    """Decaying harmonic tones (fundamental + 3 harmonics + slight detune)."""
    t_total = int(duration * sr)
    y = np.zeros(t_total, np.float32)
    for n in notes:
        f0 = 440.0 * 2 ** ((n.pitch - 69) / 12)
        i0, i1 = int(n.start * sr), min(int(n.end * sr), t_total)
        if i1 <= i0:
            continue
        t = np.arange(i1 - i0, dtype=np.float32) / sr
        env = np.exp(-t * 1.5).astype(np.float32)
        env[: min(80, len(env))] *= np.linspace(0, 1, min(80, len(env)),
                                                dtype=np.float32)  # click-free attack
        amp = 0.25 * (n.velocity / 127.0)
        seg = np.zeros_like(t)
        for h, w in ((1, 1.0), (2, 0.5), (3, 0.25), (4, 0.12)):
            fh = f0 * h * (1 + rng.normal(0, 1e-4))
            if fh < sr / 2:
                seg += w * np.sin(2 * np.pi * fh * t).astype(np.float32)
        y[i0:i1] += amp * env * seg
    peak = np.abs(y).max()
    if peak > 0.98:
        y *= 0.98 / peak
    return y


def write_wav(path, y, sr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def main(argv=None):
    args = build_parser().parse_args(argv)
    import pandas as pd

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    n_test = max(1, int(args.pieces * args.test_fraction))
    n_val = max(1, int(args.pieces * args.val_fraction))
    rows = []
    for i in range(args.pieces):
        split = ("test" if i < n_test
                 else "validation" if i < n_test + n_val else "train")
        year = 2017 if split == "train" else 2018
        notes = random_piece(rng, args.duration, args.notes_per_second,
                             args.max_polyphony)
        rel_wav = f"{year}/synth{i:04d}.wav"
        rel_mid = f"{year}/synth{i:04d}.midi"
        write_wav(os.path.join(args.out, rel_wav),
                  render(notes, args.duration, args.sr, rng), args.sr)
        mid_path = os.path.join(args.out, rel_mid)
        os.makedirs(os.path.dirname(mid_path), exist_ok=True)
        midi_io.save_midi(midi_io.notes_to_midi(notes), mid_path)
        rows.append({
            "canonical_composer": "Synthetic",
            "canonical_title": f"Synth {i}",
            "split": split,
            "year": year,
            "midi_filename": rel_mid,
            "audio_filename": rel_wav,
            "duration": args.duration,
        })
        print(f"[{i + 1}/{args.pieces}] {split} {rel_wav} ({len(notes)} notes)")
    pd.DataFrame(rows).to_csv(os.path.join(args.out, "maestro-v3.0.0.csv"),
                              index=False)
    counts = {s: sum(1 for r in rows if r["split"] == s)
              for s in ("train", "validation", "test")}
    print(f"Done: {args.out} {counts}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
