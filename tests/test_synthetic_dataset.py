"""make_synthetic_dataset.py produces a MAESTRO-layout tree every CLI accepts."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from music_transcription_tpu.config import AudioConfig
from music_transcription_tpu.data.maestro import MaestroDataset
from music_transcription_tpu.data.midi import load_midi


def test_generate_load_and_alignment(tmp_path):
    from make_synthetic_dataset import main

    root = tmp_path / "synth"
    assert main(["--out", str(root), "--pieces", "5", "--duration", "8",
                 "--seed", "3"]) == 0
    assert os.path.exists(root / "maestro-v3.0.0.csv")

    cfg = AudioConfig(n_mels=48, chunk_length=4.0)
    for split, min_n in (("train", 1), ("validation", 1), ("test", 1)):
        ds = MaestroDataset(str(root), split=split, chunk_length=4.0,
                            audio_cfg=cfg)
        assert len(ds) >= min_n, split
    ds = MaestroDataset(str(root), split="train", chunk_length=4.0, audio_cfg=cfg)
    mel, roll = ds[0]
    assert mel.shape[0] == 48 and roll.shape[0] == 88
    assert (roll > 0).any(), "roll empty — MIDI/audio misaligned?"

    # the audio actually contains energy where the roll says notes play
    wave_ds = MaestroDataset(str(root), split="train", chunk_length=4.0,
                             audio_cfg=cfg, return_waveform=True)
    wav, roll2 = wave_ds[0]
    wav = np.asarray(wav)
    fs = roll2.shape[-1] / 4.0
    active = np.asarray(roll2).any(axis=0)
    if active.any() and (~active).any():
        sr = cfg.sample_rate
        e_on, e_off, n_on, n_off = 0.0, 0.0, 0, 0
        for t in range(roll2.shape[-1]):
            a, b = int(t / fs * sr), int((t + 1) / fs * sr)
            e = float((wav[a:b] ** 2).mean()) if b > a else 0.0
            if active[t]:
                e_on += e; n_on += 1
            else:
                e_off += e; n_off += 1
        assert e_on / max(1, n_on) > 3 * (e_off / max(1, n_off))

    # MIDI files decode and stay within the 88-key range
    m = load_midi(str(root / "2017" / "synth0004.wav").replace(".wav", ".midi"))
    pitches = [n.pitch for i in m.instruments for n in i.notes]
    assert pitches and all(21 <= p <= 108 for p in pitches)


def test_pedal_extension_is_load_bearing(tmp_path):
    """v2 corpora emit CC64 spans, the targets extend under them, and the
    rendered audio keeps sounding through the extension (so a model can
    actually learn the pedal-extended MAESTRO target semantics)."""
    from make_synthetic_dataset import main

    root = tmp_path / "synth"
    assert main(["--out", str(root), "--pieces", "3", "--duration", "20",
                 "--seed", "7"]) == 0
    m = load_midi(str(root / "2017" / "synth0002.midi"))
    ccs = [c for c in m.instruments[0].control_changes if c.number == 64]
    assert len(ccs) >= 4, "expected press/release CC64 spans"
    assert any(c.value >= 64 for c in ccs) and any(c.value < 64 for c in ccs)

    r_ped = m.piano_roll(fs=100)
    r_nop = m.piano_roll(fs=100, pedal_threshold=None)
    ext = (r_ped > 0) & (r_nop == 0)
    assert ext.sum() > 100, "pedal should extend a substantial frame count"

    import wave as wave_mod
    with wave_mod.open(str(root / "2017" / "synth0002.wav")) as w:
        y = (np.frombuffer(w.readframes(w.getnframes()), "<i2")
             .astype(np.float32) / 32767)
    sr = 16000
    act, extd = (r_ped > 0).any(axis=0), ext.any(axis=0)

    def energy(mask):
        es = [float((y[int(t / 100 * sr): int((t + 1) / 100 * sr)] ** 2).mean())
              for t in np.where(mask)[0] if int((t + 1) / 100 * sr) <= len(y)]
        return float(np.mean(es)) if es else 0.0

    # extended (key-up, pedal-down) frames must ring well above silence
    assert energy(extd) > 20 * energy(~act)


def test_v3_tonality_reverb_duration_range(tmp_path):
    """v3 generator flags: per-piece durations from --duration_range land in
    the CSV, --tonality concentrates pitches on a 7-tone scale, --reverb
    adds an audible room tail after note releases."""
    import pandas as pd

    from make_synthetic_dataset import Tonality, apply_reverb, main

    root = tmp_path / "synth_v3"
    assert main(["--out", str(root), "--pieces", "4", "--seed", "11",
                 "--duration_range", "10", "16", "--tonality",
                 "--reverb", "0.3"]) == 0
    df = pd.read_csv(root / "maestro-v3.0.0.csv")
    assert df["duration"].between(10, 16).all()
    assert df["duration"].nunique() > 1  # actually varied

    # tonality: within one section (first 12 s), most pitch classes sit on a
    # single 7-tone scale (uniform-chromatic expectation: ~7/12 = 58%)
    m = load_midi(str(root / "2017" / "synth0003.midi"))
    pcs = [n.pitch % 12 for i in m.instruments for n in i.notes
           if n.start < 12.0]
    assert len(pcs) > 20
    best = 0
    for tonic in range(12):
        for ivs in ((0, 2, 4, 5, 7, 9, 11), (0, 2, 3, 5, 7, 8, 10)):
            scale = {(tonic + iv) % 12 for iv in ivs}
            best = max(best, sum(1 for p in pcs if p in scale) / len(pcs))
    assert best > 0.8, f"pitch classes not scale-concentrated: {best:.2f}"

    # reverb: an impulse grows a decaying tail well past the direct sound
    rng = np.random.default_rng(0)
    x = np.zeros(16000, np.float32)
    x[100] = 1.0
    wet = apply_reverb(x, 16000, rng, wet=0.3)
    tail = float((wet[4000:12000] ** 2).sum())
    dry_tail = float((x[4000:12000] ** 2).sum())
    assert tail > 1e-4 and dry_tail == 0.0

    # Tonality.snap returns scale tones (chromatic passing excepted)
    ton = Tonality(np.random.default_rng(1), 60.0)
    tonic, ivs = ton._scale_at(5.0)
    hits = 0
    rng2 = np.random.default_rng(2)
    for p in range(30, 90):
        s = ton.snap(p, 5.0, rng2)
        hits += ((s - tonic) % 12) in ivs
    assert hits >= 50  # >= ~83% on scale (8% chromatic allowance)


def test_v4_timbre_profile_bands_disjoint():
    """Every instrument-profile dimension's train band and held-out band are
    disjoint — the property that makes the unseen-timbre test split measure
    generalization rather than synthesizer familiarity."""
    from make_synthetic_dataset import _PROFILE_BANDS, sample_profile

    for name, (train, held) in _PROFILE_BANDS.items():
        t_lo, t_hi = train
        h_lo, h_hi = held
        assert t_lo < t_hi and h_lo < h_hi, name
        overlap = min(t_hi, h_hi) - max(t_lo, h_lo)
        assert overlap <= 0, f"{name}: train {train} overlaps held-out {held}"

    rng = np.random.default_rng(0)
    for _ in range(20):
        p_tr = sample_profile(rng, heldout=False)
        p_ho = sample_profile(rng, heldout=True)
        for name, (train, held) in _PROFILE_BANDS.items():
            assert train[0] <= p_tr[name] <= train[1], name
            assert held[0] <= p_ho[name] <= held[1], name


def test_v2_render_unchanged_by_profile_refactor():
    """--timbre v2 must regenerate pre-v4 corpora bit-identically: render()
    with prof=None consumes the same rng stream and constants as before the
    profile refactor (spot-checked against frozen draw semantics)."""
    from make_synthetic_dataset import render
    from music_transcription_tpu.data.midi import Note

    notes = [Note(pitch=60, start=0.1, end=0.8, velocity=80),
             Note(pitch=72, start=0.5, end=1.2, velocity=100)]
    y1 = render(notes, 2.0, 16000, np.random.default_rng(42))
    y2 = render(notes, 2.0, 16000, np.random.default_rng(42))
    assert np.array_equal(y1, y2)
    # the two per-piece draws happen first, in the frozen order
    rng = np.random.default_rng(42)
    bright = float(rng.uniform(0.85, 1.2))
    decay = float(rng.uniform(0.8, 1.25))
    assert 0.85 <= bright <= 1.2 and 0.8 <= decay <= 1.25
    assert float(np.abs(y1).max()) > 0.01


def test_v4_timbre_split_end_to_end(tmp_path):
    """--timbre v3 --timbre_split: test pieces carry held-out-band profiles,
    train/val pieces carry train-band profiles (profiles.json sidecar), and
    the rendered audio is well-formed for both bands."""
    import json

    from make_synthetic_dataset import _PROFILE_BANDS, main

    root = tmp_path / "synth_v4"
    assert main(["--out", str(root), "--pieces", "6", "--duration", "6",
                 "--seed", "13", "--timbre", "v3", "--timbre_split",
                 "--reverb", "0.3", "--tonality"]) == 0
    with open(root / "profiles.json") as f:
        profiles = json.load(f)
    assert len(profiles) == 6
    bands = {p["band"] for p in profiles.values()}
    assert bands == {"train", "heldout"}
    for name, p in profiles.items():
        expect = "heldout" if p["split"] == "test" else "train"
        assert p["band"] == expect, name
        idx = 1 if p["band"] == "heldout" else 0
        for dim, band_pair in _PROFILE_BANDS.items():
            lo, hi = band_pair[idx]
            assert lo <= p[dim] <= hi, (name, dim)

    import wave as wave_mod
    for i in range(6):
        year = 2017 if profiles[f"synth{i:04d}"]["split"] == "train" else 2018
        with wave_mod.open(str(root / str(year) / f"synth{i:04d}.wav")) as w:
            y = (np.frombuffer(w.readframes(w.getnframes()), "<i2")
                 .astype(np.float32) / 32767)
        assert np.isfinite(y).all() and float(np.abs(y).max()) > 0.01

    # --timbre_split without v3 is rejected
    assert main(["--out", str(tmp_path / "x"), "--pieces", "1",
                 "--timbre_split"]) == 2
