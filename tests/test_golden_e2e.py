"""Golden end-to-end transcription: shipped trained checkpoint, full CLI.

``assets/demo_checkpoint`` is a small CNN-RNN trained to F1=1.000 on the
deterministic synthetic fixture through the real preprocess/train CLIs
(recipe in assets/demo_checkpoint/README.md). This test regenerates the
fixture, runs ``main.py`` (WAV -> mel -> model -> roll -> MIDI), and checks
the decoded notes against the known ground truth — a drift ANYWHERE in the
pipeline (resampler, mel numerics, model forward, thresholding, roll->note
decoding, MIDI writer) breaks it.
"""

import os
import subprocess
import sys

from tests.maestro_fixture import make_maestro_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "assets", "demo_checkpoint")


def _transcribe(wav, out, threshold="0.35"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), str(wav), CKPT,
         "-d", "cpu", "-t", threshold, "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, f"main.py: {proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    from music_transcription_tpu.data.midi import load_midi

    return load_midi(str(out)).instruments[0].notes


def test_two_note_piece_exact(tmp_path):
    root = make_maestro_root(tmp_path / "maestro")
    notes = _transcribe(os.path.join(root, "2017", "piece0.wav"),
                        tmp_path / "out0.mid")
    # ground truth: 60 @ 0.5-1.5, 64 @ 2.0-3.0 (maestro_fixture.py specs)
    assert [n.pitch for n in notes] == [60, 64], notes
    want = {60: (0.5, 1.5), 64: (2.0, 3.0)}
    for n in notes:
        s, e = want[n.pitch]
        assert abs(n.start - s) <= 0.10, (n.pitch, n.start, s)
        assert abs(n.end - e) <= 0.15, (n.pitch, n.end, e)


def test_pth_round_trip_transcribes_identically(tmp_path):
    """Export the demo checkpoint to reference .pth format, transcribe with
    it via main.py's .pth loading path, and demand the same notes as the
    orbax path — the converters sit in the golden loop."""
    import json
    import shutil

    import jax

    jax.config.update("jax_platforms", "cpu")
    from music_transcription_tpu.config import ModelConfig
    from music_transcription_tpu.train.checkpoints import (
        load_checkpoint,
        save_torch_checkpoint,
    )

    cfg = json.load(open(os.path.join(CKPT, "config.json")))
    mcfg = ModelConfig(**cfg["model"])
    variables = load_checkpoint(CKPT)
    pth = tmp_path / "demo.pth"
    save_torch_checkpoint(str(pth), variables, mcfg)
    # main.py needs the audio config when loading bare .pth: sidecar json
    shutil.copy(os.path.join(CKPT, "config.json"), tmp_path / "demo.json")

    root = make_maestro_root(tmp_path / "maestro")
    ref_notes = _transcribe(os.path.join(root, "2017", "piece0.wav"),
                            tmp_path / "ref.mid")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         os.path.join(root, "2017", "piece0.wav"), str(pth),
         "-d", "cpu", "-t", "0.35", "-o", str(tmp_path / "pth.mid")],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    from music_transcription_tpu.data.midi import load_midi

    pth_notes = load_midi(str(tmp_path / "pth.mid")).instruments[0].notes
    assert [(n.pitch, n.start, n.end) for n in pth_notes] == \
        [(n.pitch, n.start, n.end) for n in ref_notes]


def test_long_note_across_chunks(tmp_path):
    """piece1 holds pitch 72 for 6 s over a 6.5 s file — three 2 s chunks;
    the batched-chunk path must stitch into (nearly) continuous coverage."""
    root = make_maestro_root(tmp_path / "maestro")
    notes = _transcribe(os.path.join(root, "2017", "piece1.wav"),
                        tmp_path / "out1.mid")
    assert notes, "no notes decoded"
    assert {n.pitch for n in notes} == {72}, notes
    covered = sum(n.end - n.start for n in notes)
    assert covered >= 5.0, f"pitch-72 coverage only {covered:.2f}s: {notes}"
    assert min(n.start for n in notes) <= 0.2


def test_pedal_sustained_note(tmp_path):
    """piece3 (pedal=True fixture): the key is released at 1.0 s but CC64 is
    held to 2.5 s — the audio rings on, the dataset target extends
    (pretty_midi running-max semantics), and the transcription must report
    the *sounding* span, not the key span."""
    root = make_maestro_root(tmp_path / "maestro", pedal=True)

    # data layer: the target roll stays hot well past the key release
    from music_transcription_tpu.config import AudioConfig
    from music_transcription_tpu.data.maestro import MaestroDataset

    ds = MaestroDataset(root, split="train", chunk_length=3.0,
                        audio_cfg=AudioConfig(n_mels=48, chunk_length=3.0))
    idx = next(
        i for i, c in enumerate(ds.chunks)
        if "piece3" in str(ds.df.iloc[c["file_idx"]]["audio_filename"])
        and c["start_time"] == 0.0
    )
    mel, roll = ds[idx]
    fps = roll.shape[-1] / 3.0
    row = roll[60 - 21]
    assert row[int(0.7 * fps)] > 0            # while key down
    assert row[int(2.0 * fps)] > 0, "target must extend under the pedal"
    assert row[int(2.8 * fps)] == 0           # after pedal release

    # full pipeline: decoded pitch-60 spans cover the pedal-extended
    # sounding region (0.5-2.5 s), far beyond the 0.5 s key span. The tiny
    # demo model hallucinates briefly at the onset-less chunk seam (~0.4 s
    # of pitch 64 at this threshold) — bounded, not forbidden.
    notes = _transcribe(os.path.join(root, "2017", "piece3.wav"),
                        tmp_path / "out3.mid")
    sixty = [n for n in notes if n.pitch == 60]
    assert sixty, notes
    assert abs(min(n.start for n in sixty) - 0.5) <= 0.10, notes
    coverage = sum(n.end - n.start for n in sixty)
    assert coverage >= 1.6, f"pedal-sustained tail lost ({coverage:.2f}s): {notes}"
    assert max(n.end for n in sixty) >= 2.2, notes
    spurious = sum(n.end - n.start for n in notes if n.pitch != 60)
    assert spurious < 0.6, notes
