#!/usr/bin/env python
"""Generate a synthetic MAESTRO-layout dataset (WAV + MIDI + CSV).

Random polyphonic "pieces" written in the exact MAESTRO-v3 tree shape
(year dirs, maestro-v3.0.0.csv), so every CLI in this repo (preprocess,
train, evaluate, main.py) runs on it unchanged. Uses:

  * install smoke test / demo without the 120 GB MAESTRO download
  * full-scale hardware validation: the 89M flagship trained on this through
    the real CLI chain (regenerate with this script)
  * AST-tier experiments on non-trivial polyphony

v2 realism (what MAESTRO training targets actually depend on):

  * CC64 sustain-pedal spans. While the pedal is held, a released key keeps
    sounding until the pedal-off — and the frame *targets* extend the same
    way (running-max under pedal, pretty_midi semantics: reference
    data/dataset.py:141-146 via get_piano_roll(pedal_threshold=64),
    reimplemented in music_transcription_tpu/data/midi.py). The renderer
    sustains the audio to the pedal release so audio and targets agree.
  * velocity-dependent timbre: loud notes are brighter (flatter harmonic
    rolloff) and decay faster; amplitude is nonlinear in velocity.
  * two-stage decay (fast strike + slow ring, pitch-dependent rates) so
    pedal-extended tails remain audible, like real piano strings.
  * inharmonicity (stiff-string partial stretch) and per-piece brightness/
    decay variation, hammer-noise transients, low noise floor.
  * gesture structure: single notes, chords, fast runs, and re-struck notes
    under pedal — dense polyphony bursts instead of a uniform Poisson rain.

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
    p.add_argument("--max_polyphony", type=int, default=10,
                   help="cap on simultaneously *sounding* notes (pedal included)")
    p.add_argument("--notes_per_second", type=float, default=3.0,
                   help="average note density (gestures expand to more notes)")
    p.add_argument("--pedal_coverage", type=float, default=0.45,
                   help="fraction of each piece under sustain pedal (0 = v1 "
                        "behaviour: no CC64 events)")
    p.add_argument("--timbre", type=str, default="v2",
                   choices=["v3", "v2", "v1"],
                   help="v1 = round-2 renderer (4 clean harmonics, velocity "
                        "scales amplitude only, no pedal) — kept for "
                        "scaling-curve consistency with corpora generated "
                        "before the v2 realism pass. v3 = per-piece "
                        "instrument profiles over 12 timbre/room dimensions "
                        "(partial structure, decay constants, brightness "
                        "curve, hammer, attack, string detune, room RT60/"
                        "wet); combine with --timbre_split for an "
                        "unseen-timbre test split")
    p.add_argument("--timbre_split", action="store_true",
                   help="v3 only: test-split pieces draw every profile "
                        "dimension from a held-out band DISJOINT from the "
                        "train/validation band (see _PROFILE_BANDS), so "
                        "held-out F1 measures timbre generalization, not "
                        "familiarity with the training synthesizer family")
    p.add_argument("--val_fraction", type=float, default=0.15)
    p.add_argument("--test_fraction", type=float, default=0.15)
    # v3 realism (round-4): long-form pieces, room acoustics, tonal structure
    # — the dimensions MAESTRO has that dry uniform-random 60 s pieces lack.
    # Corpus v3 = --tonality --reverb 0.3 --duration_range 180 300.
    p.add_argument("--duration_range", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="per-piece duration ~ uniform(LO, HI) seconds "
                        "(overrides --duration; MAESTRO pieces run minutes)")
    p.add_argument("--reverb", type=float, default=0.0,
                   help="room-IR wet mix in [0, 1): convolve each piece with "
                        "a synthetic exponential-decay room impulse response "
                        "(per-piece RT60 ~ 0.3-1.0 s). 0 = dry (v1/v2)")
    p.add_argument("--tonality", action="store_true",
                   help="key-structured note selection: per-piece key with "
                        "section modulations to related keys; chords are "
                        "diatonic stacks, runs walk the scale")
    return p


# ---------------------------------------------------------------------------
# Tonality (v3): keys, section modulations, diatonic chords, scale runs
# ---------------------------------------------------------------------------

_MAJOR = (0, 2, 4, 5, 7, 9, 11)
_MINOR = (0, 2, 3, 5, 7, 8, 10)


class Tonality:
    """Per-piece key plan: sections of 15-40 s, each in a key related to the
    last (dominant / subdominant / relative), major or minor scale. Supplies
    scale-snapped pitches, diatonic chord stacks, and scale-walk runs."""

    def __init__(self, rng, duration):
        self.sections = []  # (start_time, tonic_pc, intervals)
        t = 0.0
        tonic = int(rng.integers(0, 12))
        minor = bool(rng.random() < 0.4)
        while t < duration:
            self.sections.append((t, tonic, _MINOR if minor else _MAJOR))
            t += float(rng.uniform(15.0, 40.0))
            move = rng.random()
            if move < 0.4:
                tonic = (tonic + 7) % 12  # dominant
            elif move < 0.7:
                tonic = (tonic + 5) % 12  # subdominant
            else:
                # relative major/minor
                tonic = (tonic + (3 if minor else 9)) % 12
                minor = not minor

    def _scale_at(self, t):
        cur = self.sections[0]
        for s in self.sections:
            if s[0] <= t:
                cur = s
        return cur[1], cur[2]

    def snap(self, pitch, t, rng):
        """Nearest scale tone (8% chance of a chromatic passing tone)."""
        if rng.random() < 0.08:
            return int(pitch)
        tonic, ivs = self._scale_at(t)
        pc = (pitch - tonic) % 12
        best = min(ivs, key=lambda iv: min((pc - iv) % 12, (iv - pc) % 12))
        d = (best - pc) % 12
        if d > 6:
            d -= 12
        return int(pitch + d)

    def chord(self, rng, t):
        """Diatonic stack on a random scale degree: degrees d, d+2, d+4
        (+ d+6 for a seventh 35% of the time), as semitone intervals."""
        tonic, ivs = self._scale_at(t)
        d = int(rng.integers(0, 7))
        degs = [d, d + 2, d + 4] + ([d + 6] if rng.random() < 0.35 else [])
        root = ivs[d % 7]
        out = []
        for g in degs:
            semi = ivs[g % 7] + 12 * (g // 7) - root
            out.append(semi)
        if rng.random() < 0.3:
            out.append(12)  # octave double
        return out

    def run_pitches(self, rng, base, direction, count, t):
        """Walk ``count`` scale steps from the snapped base."""
        tonic, ivs = self._scale_at(t)
        base = self.snap(base, t, rng)
        pc = (base - tonic) % 12
        # index of the base within the scale
        deg = min(range(7), key=lambda i: min((pc - ivs[i]) % 12,
                                              (ivs[i] - pc) % 12))
        out = []
        for k in range(count):
            g = deg + k * direction
            out.append(tonic + ivs[g % 7] + 12 * ((base - tonic) // 12 + g // 7))
        return out


# ---------------------------------------------------------------------------
# Instrument profiles (v4 corpora): disjoint train / held-out timbre bands
# ---------------------------------------------------------------------------

# Each per-piece "instrument" dimension has a TRAIN band and a HELD-OUT band
# that do not overlap. With --timbre v3 --timbre_split, test pieces draw every
# dimension from the held-out band, so test F1 measures generalization to
# instruments the model has never heard (the reference's MAESTRO split has
# this property across recordings/venues for free; a synthetic corpus must
# construct it). Validation stays in the train band: it is used for model
# selection and threshold tuning, which must see the training distribution.
_PROFILE_BANDS = {
    #                 train band      held-out band
    "bright_g":     ((0.85, 1.15),  (1.15, 1.35)),   # global brightness
    "decay_g":      ((0.80, 1.20),  (0.55, 0.80)),   # global decay rate
    "roll_base":    ((2.15, 2.50),  (1.80, 2.15)),   # harmonic rolloff base
    "roll_vel":     ((1.00, 1.35),  (1.35, 1.65)),   # rolloff velocity slope
    "inharm":       ((0.50, 1.40),  (1.40, 2.50)),   # inharmonicity scale
    "even_tilt":    ((-0.10, 0.12), (0.12, 0.35)),   # even-partial attenuation
    "hammer":       ((0.25, 0.48),  (0.48, 0.70)),   # hammer-noise amount
    "attack_ms":    ((3.0, 6.5),    (6.5, 11.0)),    # attack ramp
    "detune_cents": ((0.40, 1.80),  (1.80, 3.60)),   # unison-string beating
    "strike_mix":   ((0.62, 0.80),  (0.50, 0.62)),   # fast/slow decay mix
    "rt60":         ((0.30, 0.80),  (0.80, 1.30)),   # room reverberation time
    "wet":          ((0.22, 0.35),  (0.35, 0.50)),   # room wet mix
}

# The v2 renderer's fixed constants, as a profile (used when --timbre v2, so
# one render() serves both paths; rng draw order is preserved for seed
# reproducibility of pre-v4 corpora).
_V2_PROFILE_CONST = {
    "roll_base": 2.3, "roll_vel": 1.2, "inharm": 1.0, "even_tilt": 0.0,
    "hammer": 0.4, "attack_ms": 5.0, "detune_cents": 0.0, "strike_mix": 0.75,
}


def sample_profile(rng, heldout=False):
    """Draw a per-piece instrument profile from the train or held-out bands."""
    idx = 1 if heldout else 0
    return {k: float(rng.uniform(*bands[idx]))
            for k, bands in _PROFILE_BANDS.items()}


# ---------------------------------------------------------------------------
# Room impulse response (v3): exponential-decay noise tail + direct path
# ---------------------------------------------------------------------------


def room_ir(rng, sr, rt60):
    """Synthetic room IR: unit direct path, sparse early reflections in the
    first 40 ms, then a gaussian tail decaying 60 dB over ``rt60`` seconds
    (the standard Schroeder/Moorer-style artificial reverberator shape)."""
    n = max(int(rt60 * sr), sr // 10)
    t = np.arange(n, dtype=np.float32) / sr
    ir = rng.normal(0.0, 1.0, n).astype(np.float32) * np.exp(-6.908 * t / rt60)
    ir[: int(0.004 * sr)] = 0.0  # pre-delay before the diffuse field
    for _ in range(int(rng.integers(3, 7))):  # early reflections
        at = int(rng.uniform(0.004, 0.04) * sr)
        ir[at] += float(rng.uniform(0.2, 0.5)) * (1 if rng.random() < 0.5 else -1)
    tail_rms = float(np.sqrt((ir ** 2).sum()))
    ir *= 0.8 / max(tail_rms, 1e-9)  # bounded reverberant energy
    ir[0] = 1.0  # direct path
    return ir


def apply_reverb(y, sr, rng, wet, rt60=None):
    from scipy.signal import fftconvolve

    if rt60 is None:  # v2/v3 corpora: per-piece RT60 drawn here
        rt60 = float(rng.uniform(0.3, 1.0))
    ir = room_ir(rng, sr, rt60=rt60)
    rev = fftconvolve(y, ir)[: len(y)].astype(np.float32)
    out = (1.0 - wet) * y + wet * rev
    peak = np.abs(out).max()
    if peak > 0.98:
        out *= 0.98 / peak
    return out


# ---------------------------------------------------------------------------
# Pedal spans
# ---------------------------------------------------------------------------


def random_pedal_spans(rng, duration, coverage):
    """Press/release spans covering ~``coverage`` of the piece.

    Mix of long holds and quick legato re-pedaling (short gaps), the two
    patterns real performances show. Every span is closed — an unmatched
    pedal-on is dropped by the target builder (pretty_midi parity,
    data/midi.py:_instrument_roll), which would silently desync audio and
    targets.
    """
    if coverage <= 0 or duration < 2.0:
        return []
    spans = []
    t = float(rng.uniform(0.0, 2.0))
    # hold/gap ratio tuned so expected coverage ~= requested coverage
    mean_hold = 2.4
    mean_gap = mean_hold * (1.0 - coverage) / max(coverage, 1e-3)
    while t < duration - 0.5:
        hold = float(rng.uniform(0.6, 2 * mean_hold - 0.6))
        off = min(t + hold, duration - 0.05)
        if off - t > 0.1:
            spans.append((t, off))
        if rng.random() < 0.35:  # legato re-pedal: near-immediate re-press
            gap = float(rng.uniform(0.04, 0.25))
        else:
            gap = float(rng.uniform(0.3, max(0.4, 2 * mean_gap)))
        t = off + gap
    return spans


def pedal_extended_end(end, spans):
    """Sounding end of a note released at ``end``: the enclosing pedal span's
    release (the dampers are up), else the key release itself. Mirrors the
    running-max extension the target roll applies."""
    for on, off in spans:
        if on <= end < off:
            return off
    return end


# ---------------------------------------------------------------------------
# Note generation (gestures: singles, chords, runs, re-strikes)
# ---------------------------------------------------------------------------

_CHORD_INTERVALS = ([0, 4, 7], [0, 3, 7], [0, 4, 7, 12], [0, 3, 7, 12],
                    [0, 5, 7], [0, 4, 7, 11], [0, 3, 6, 9], [0, 7, 12, 16])


def random_piece(rng, duration, notes_per_second, max_polyphony, pedal_spans,
                 tonality=None):
    """Gesture-structured note list with bounded *sounding* polyphony.
    With ``tonality``, pitch choices follow the piece's key plan (snapped
    bases, diatonic chords, scale runs) instead of uniform chromatics."""
    notes = []  # (Note, sounding_end)
    t = float(rng.uniform(0.05, 0.5))
    target_notes = duration * notes_per_second

    def sounding(at):
        return sum(1 for _, se in notes if _.start <= at < se)

    def add(pitch, on, length, vel):
        pitch = int(np.clip(pitch, MIN_MIDI, MIN_MIDI + NUM_KEYS - 1))
        off = min(on + length, duration - 0.02)
        if off <= on or sounding(on) >= max_polyphony:
            return
        n = midi_io.Note(pitch=pitch, start=float(on), end=float(off),
                         velocity=int(np.clip(vel, 25, 120)))
        notes.append((n, pedal_extended_end(n.end, pedal_spans)))

    while t < duration - 0.4 and len(notes) < target_notes * 1.5:
        r = rng.random()
        base = int(rng.integers(MIN_MIDI, MIN_MIDI + NUM_KEYS))
        if tonality is not None:
            # concentrate register like keyboard writing, then snap to key
            base = int(np.clip(rng.normal(64, 14), MIN_MIDI,
                               MIN_MIDI + NUM_KEYS - 1))
            base = tonality.snap(base, t, rng)
        vel = int(rng.normal(72, 22))
        under_pedal = any(on <= t < off for on, off in pedal_spans)
        ringing = [n for n, se in notes if n.end <= t < se]
        if r < 0.15 and under_pedal and ringing:
            # re-strike a still-ringing (pedal-held) pitch — the hard case
            # for the running-max target semantics
            n0 = ringing[int(rng.integers(len(ringing)))]
            add(n0.pitch, t, float(rng.uniform(0.15, 1.2)),
                n0.velocity + int(rng.normal(0, 12)))
            t += float(rng.uniform(0.08, 0.5))
        elif r < 0.40:
            # chord: near-simultaneous onsets (few-ms strum)
            if tonality is not None:
                iv = tonality.chord(rng, t)
            else:
                iv = _CHORD_INTERVALS[int(rng.integers(len(_CHORD_INTERVALS)))]
            length = float(rng.uniform(0.3, 2.5))
            for k, semi in enumerate(iv):
                add(base + semi, t + k * float(rng.uniform(0.0, 0.012)),
                    length * float(rng.uniform(0.85, 1.0)),
                    vel + int(rng.normal(0, 8)))
            t += float(rng.uniform(0.25, 1.2))
        elif r < 0.60:
            # run: fast stepwise scale fragment
            count = int(rng.integers(4, 11))
            ioi = float(rng.uniform(0.06, 0.15))
            if tonality is not None:
                direction = int(rng.choice([-1, 1]))
                pitches = tonality.run_pitches(rng, base, direction, count, t)
            else:
                step = int(rng.choice([-2, -1, 1, 2]))
                pitches = [base + k * step for k in range(count)]
            for k, pch in enumerate(pitches):
                add(pch, t + k * ioi,
                    float(rng.uniform(0.08, 0.35)), vel + int(rng.normal(0, 6)))
            t += count * ioi + float(rng.uniform(0.05, 0.4))
        else:
            add(base, t, float(rng.uniform(0.12, 2.8)), vel)
            t += float(rng.uniform(0.8, 2.0)) / max(notes_per_second, 0.5)
    return [n for n, _ in sorted(notes, key=lambda p: p[0].start)]


# ---------------------------------------------------------------------------
# Rendering
# ---------------------------------------------------------------------------


def render(notes, duration, sr, rng, pedal_spans=(), prof=None):
    """Stiff-string additive synthesis with velocity-dependent timbre.

    Each note sounds until its pedal-extended end (dampers up while CC64 is
    held), then a short damper fade. Louder notes are brighter (smaller
    harmonic rolloff exponent) with a sharper hammer transient; decay is
    two-stage (fast strike + slow ring) so sustained tails stay audible.

    ``prof`` (v3/v4 corpora) supplies the full per-piece instrument profile
    (see _PROFILE_BANDS); ``prof=None`` reproduces the v2 renderer exactly,
    including its rng draw order, so pre-v4 corpora regenerate bit-identically
    from their seeds.
    """
    t_total = int(duration * sr)
    y = np.zeros(t_total, np.float32)
    if prof is None:
        # per-piece "instrument": global brightness/decay character (v2)
        prof = dict(_V2_PROFILE_CONST)
        prof["bright_g"] = float(rng.uniform(0.85, 1.2))
        prof["decay_g"] = float(rng.uniform(0.8, 1.25))
    bright_g = prof["bright_g"]
    decay_g = prof["decay_g"]
    strike_mix = prof["strike_mix"]
    detune = 2.0 ** (prof["detune_cents"] / 1200.0) - 1.0  # Δf/f of the pair
    for n in notes:
        f0 = 440.0 * 2 ** ((n.pitch - 69) / 12)
        sound_end = pedal_extended_end(n.end, pedal_spans)
        fade = 0.03  # damper fall
        i0 = int(n.start * sr)
        i1 = min(int((sound_end + fade) * sr), t_total)
        if i1 <= i0:
            continue
        t = np.arange(i1 - i0, dtype=np.float32) / sr
        v = n.velocity / 127.0
        key = (n.pitch - MIN_MIDI) / (NUM_KEYS - 1)  # 0 = low A, 1 = top C
        # two-stage decay: strike transient + slow ring (both pitch-dependent)
        k_fast = decay_g * (2.0 + 6.0 * key + 1.5 * v)
        k_slow = decay_g * (0.25 + 1.1 * key)
        env = (strike_mix * np.exp(-k_fast * t)
               + (1.0 - strike_mix) * np.exp(-k_slow * t)).astype(np.float32)
        atk = min(int(prof["attack_ms"] * 1e-3 * sr), len(env))
        env[:atk] *= np.linspace(0, 1, atk, dtype=np.float32)  # click-free
        # damper fade after the sounding end
        rel = int((sound_end - n.start) * sr)
        if 0 < rel < len(env):
            tail = len(env) - rel
            env[rel:] *= np.linspace(1, 0, tail, dtype=np.float32)
        amp = 0.22 * v ** 1.5
        # brightness: harmonic rolloff exponent shrinks with velocity
        p_roll = (prof["roll_base"] - prof["roll_vel"] * v) / bright_g
        # inharmonicity (stiff-string partial stretch), worst in bass
        B = prof["inharm"] * 3e-4 * (1 + 4 * (1 - key) ** 2)
        seg = np.zeros_like(t)
        for h in range(1, 9):
            fh = f0 * h * np.sqrt(1 + B * h * h) * (1 + rng.normal(0, 8e-5))
            if fh >= sr / 2:
                break
            w = h ** (-p_roll)
            if h % 2 == 0:
                w *= 1.0 - prof["even_tilt"]  # even-partial tilt
            part = w * np.sin(2 * np.pi * fh * t
                              + float(rng.uniform(0, 2 * np.pi))
                              ).astype(np.float32)
            if detune > 0:
                # unison pair beating: sin(a)+sin(b) = 2 sin(mean)·cos(Δ/2),
                # i.e. one cosine envelope instead of a second oscillator
                part *= np.cos(np.pi * fh * detune * t).astype(np.float32)
            seg += part
        # hammer noise transient, brighter/louder with velocity
        nh = min(int(0.012 * sr), len(seg))
        if nh > 2:
            burst = np.diff(rng.normal(0, 1, nh + 1)).astype(np.float32)
            seg[:nh] += prof["hammer"] * v * burst * np.linspace(
                1, 0, nh, dtype=np.float32)
        y[i0:i1] += amp * env * seg
    # room-ish noise floor
    y += rng.normal(0, 3e-4, t_total).astype(np.float32)
    peak = np.abs(y).max()
    if peak > 0.98:
        y *= 0.98 / peak
    return y


def random_piece_v1(rng, duration, notes_per_second, max_polyphony):
    """Round-2 note model: uniform Poisson-ish onsets, bounded polyphony."""
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
        notes.append(midi_io.Note(pitch=pitch, start=float(on), end=off,
                                  velocity=vel))
    return notes


def render_v1(notes, duration, sr, rng):
    """Round-2 renderer: decaying 4-harmonic tones, velocity = amplitude.
    Unchanged so pre-v2 corpora (AST scaling curve) remain reproducible."""
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
                                                dtype=np.float32)
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


def pedal_control_changes(spans, rng):
    """CC64 events for press/release spans (+ in-hold jitter above the
    threshold, which the target builder must ignore — transition semantics)."""
    ccs = []
    for on, off in spans:
        ccs.append(midi_io.ControlChange(number=64,
                                         value=int(rng.integers(80, 128)),
                                         time=float(on)))
        if off - on > 1.0 and rng.random() < 0.5:
            ccs.append(midi_io.ControlChange(
                number=64, value=int(rng.integers(70, 128)),
                time=float(rng.uniform(on + 0.2, off - 0.2))))
        ccs.append(midi_io.ControlChange(number=64,
                                         value=int(rng.integers(0, 40)),
                                         time=float(off)))
    return sorted(ccs, key=lambda c: c.time)


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

    if args.timbre_split and args.timbre != "v3":
        print("error: --timbre_split requires --timbre v3", file=sys.stderr)
        return 2
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    n_test = max(1, int(args.pieces * args.test_fraction))
    n_val = max(1, int(args.pieces * args.val_fraction))
    rows = []
    profiles = {}
    for i in range(args.pieces):
        split = ("test" if i < n_test
                 else "validation" if i < n_test + n_val else "train")
        year = 2017 if split == "train" else 2018
        duration = args.duration
        if args.duration_range is not None:
            duration = float(rng.uniform(*args.duration_range))
        prof = None
        if args.timbre == "v3":
            heldout = args.timbre_split and split == "test"
            prof = sample_profile(rng, heldout=heldout)
            profiles[f"synth{i:04d}"] = dict(
                prof, split=split, band="heldout" if heldout else "train")
        if args.timbre == "v1":
            spans = []
            notes = random_piece_v1(rng, duration, args.notes_per_second,
                                    args.max_polyphony)
            audio = render_v1(notes, duration, args.sr, rng)
        else:
            tonality = Tonality(rng, duration) if args.tonality else None
            spans = random_pedal_spans(rng, duration, args.pedal_coverage)
            notes = random_piece(rng, duration, args.notes_per_second,
                                 args.max_polyphony, spans, tonality=tonality)
            audio = render(notes, duration, args.sr, rng, spans, prof=prof)
        if args.reverb > 0:
            wet = prof["wet"] if prof is not None else args.reverb
            rt60 = prof["rt60"] if prof is not None else None
            audio = apply_reverb(audio, args.sr, rng, wet, rt60=rt60)
        rel_wav = f"{year}/synth{i:04d}.wav"
        rel_mid = f"{year}/synth{i:04d}.midi"
        write_wav(os.path.join(args.out, rel_wav), audio, args.sr)
        mid = midi_io.notes_to_midi(notes)
        mid.instruments[0].control_changes = pedal_control_changes(spans, rng)
        mid_path = os.path.join(args.out, rel_mid)
        os.makedirs(os.path.dirname(mid_path), exist_ok=True)
        midi_io.save_midi(mid, mid_path)
        rows.append({
            "canonical_composer": "Synthetic",
            "canonical_title": f"Synth {i}",
            "split": split,
            "year": year,
            "midi_filename": rel_mid,
            "audio_filename": rel_wav,
            "duration": duration,
        })
        print(f"[{i + 1}/{args.pieces}] {split} {rel_wav} "
              f"({duration:.0f}s, {len(notes)} notes, {len(spans)} pedal spans)")
    pd.DataFrame(rows).to_csv(os.path.join(args.out, "maestro-v3.0.0.csv"),
                              index=False)
    if profiles:
        import json
        with open(os.path.join(args.out, "profiles.json"), "w") as f:
            json.dump(profiles, f, indent=1)
    counts = {s: sum(1 for r in rows if r["split"] == s)
              for s in ("train", "validation", "test")}
    print(f"Done: {args.out} {counts}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
