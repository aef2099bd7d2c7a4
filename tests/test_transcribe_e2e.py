"""End-to-end transcription pipeline tests on a synthetic WAV + tiny model."""

import json
import os
import subprocess
import sys
import wave

import jax
import numpy as np
import pytest

from music_transcription_tpu.config import AudioConfig, ModelConfig, config_to_dict
from music_transcription_tpu.data import midi as midi_io
from music_transcription_tpu.models.transcription import TranscriptionModel
from music_transcription_tpu.train.checkpoints import save_checkpoint
from music_transcription_tpu import transcribe as T

TINY_AUDIO = AudioConfig(n_mels=32, chunk_length=1.0)
TINY_MODEL = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1)


def _write_sine_wav(path, seconds=2.5, sr=16000, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    model = TranscriptionModel(TINY_MODEL)
    variables = model.init(jax.random.key(0), model.example_input(batch=1, t=8))
    path = d / "ckpt_dir"
    save_checkpoint(path, dict(variables))
    with open(path / "config.json", "w") as f:
        json.dump(
            {"model": config_to_dict(TINY_MODEL), "audio": config_to_dict(TINY_AUDIO)}, f
        )
    return path


def test_load_model_orbax_sidecar(tiny_checkpoint):
    loaded = T.load_model(tiny_checkpoint)
    assert loaded.model.config.n_mels == 32
    assert loaded.audio_cfg.chunk_length == 1.0
    assert "params" in loaded.variables


def test_transcribe_audio_end_to_end(tiny_checkpoint, tmp_path):
    wav = tmp_path / "in.wav"
    _write_sine_wav(wav, seconds=2.5)
    out = tmp_path / "out.mid"
    result = T.transcribe_audio(wav, tiny_checkpoint, out, threshold=0.5, verbose=False)
    assert os.path.exists(result)
    back = midi_io.load_midi(result)  # valid MIDI
    assert isinstance(back.instruments, list)


def test_transcribe_roll_length(tiny_checkpoint, tmp_path):
    wav = tmp_path / "in.wav"
    _write_sine_wav(wav, seconds=2.5)  # -> 3 chunks of 1 s
    loaded = T.load_model(tiny_checkpoint)
    from music_transcription_tpu.data.audio import load_wav, split_into_chunks

    y, _ = load_wav(wav, sr=16000)
    chunks = split_into_chunks(y, loaded.audio_cfg.chunk_samples)
    assert chunks.shape[0] == 3
    roll = T.transcribe_chunks(loaded, chunks, threshold=0.5)
    t_per_chunk = loaded.audio_cfg.mel_frames_per_chunk
    assert roll.shape == (88, 3 * t_per_chunk)
    assert set(np.unique(roll)) <= {0.0, 1.0}


def test_transcribe_chunks_sharded_matches_single(tiny_checkpoint):
    """Mesh-sharded inference must be numerically identical to single-device,
    including the padding path (5 chunks over 8 devices)."""
    loaded = T.load_model(tiny_checkpoint)
    rng = np.random.default_rng(0)
    chunks = (0.1 * rng.standard_normal((5, TINY_AUDIO.chunk_samples))).astype(np.float32)
    single = T.transcribe_chunks(loaded, chunks, threshold=0.5, mesh=None)
    from music_transcription_tpu.parallel.mesh import make_mesh

    sharded = T.transcribe_chunks(loaded, chunks, threshold=0.5, mesh=make_mesh(8))
    assert single.shape == sharded.shape
    assert (single == sharded).all()


def test_main_cli(tiny_checkpoint, tmp_path):
    wav = tmp_path / "cli.wav"
    _write_sine_wav(wav, seconds=1.2)
    out = tmp_path / "cli.mid"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "main.py"), str(wav), str(tiny_checkpoint),
         "-o", str(out), "-d", "cpu", "-t", "0.7"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert out.exists()
    assert "Transcription completed successfully!" in proc.stdout


def test_transcriber_class_multi_file(tiny_checkpoint, tmp_path):
    from music_transcription_tpu.transcribe import Transcriber

    t = Transcriber(tiny_checkpoint, use_pallas_lstm=False)
    for i, secs in enumerate((1.2, 2.5)):
        wav = tmp_path / f"f{i}.wav"
        _write_sine_wav(wav, seconds=secs)
        out = t.transcribe_file(wav, tmp_path / f"f{i}.mid")
        assert os.path.exists(out)
    notes = t.transcribe_array(np.zeros(16000, np.float32))
    assert isinstance(notes, list)


def test_transcriber_pins_weights_on_device(tiny_checkpoint):
    """The resident server must hold device arrays, not host numpy: jit does
    not cache host arguments, so host-resident weights would be re-uploaded
    on every request (~356 MB/call for the 89M flagship on a tunneled
    backend — the serving bug fixed in round 3)."""
    import jax

    from music_transcription_tpu.transcribe import Transcriber

    t = Transcriber(tiny_checkpoint, use_pallas_lstm=False)
    leaves = jax.tree.leaves(t.loaded.variables)
    assert leaves and all(isinstance(a, jax.Array) for a in leaves)
    # committed to a concrete device (device_put result), not a tracer/host view
    assert all(a.committed for a in leaves)


def test_serve_cli_watch_once_and_stdin(tiny_checkpoint, tmp_path):
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    watch = tmp_path / "incoming"
    out_dir = tmp_path / "done"
    watch.mkdir()
    for i in range(2):
        _write_sine_wav(watch / f"song{i}.wav", seconds=1.0 + i)
    (watch / "notes.txt").write_text("ignored")  # non-audio skipped

    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--model", str(tiny_checkpoint), "--device", "cpu",
         "--watch_dir", str(watch), "--out_dir", str(out_dir), "--once"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert sorted(os.listdir(out_dir)) == ["song0.mid", "song1.mid"]

    # stdin mode
    proc2 = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--model", str(tiny_checkpoint), "--device", "cpu", "--stdin",
         "--out_dir", str(tmp_path / "stdin_out")],
        input=str(watch / "song0.wav") + "\n",
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc2.returncode == 0, proc2.stdout + proc2.stderr
    assert "song0.mid" in proc2.stdout


def test_window_mode_overrides_chunk_length(tmp_path):
    """--window: one long jitted program instead of many 2 s chunks, with
    attention_backend flipped to "auto" (flash engages past the measured
    score-HBM crossover). Decoded notes from the trained demo checkpoint
    must agree with the chunked path up to seam effects (same weights, more
    context — compare decoded notes, not logits)."""
    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "assets", "demo_checkpoint")
    root = make_maestro_root(tmp_path / "maestro")
    wav = os.path.join(root, "2017", "piece1.wav")  # pitch 72 held 6 s / 6.5 s

    srv_chunked = T.Transcriber(ckpt, threshold=0.35)
    srv_window = T.Transcriber(ckpt, threshold=0.35, window=6.5)
    assert srv_window.loaded.audio_cfg.chunk_length == 6.5
    assert srv_window.loaded.model.config.attention_backend == "auto"
    assert srv_chunked.loaded.audio_cfg.chunk_length == 2.0  # untouched

    from music_transcription_tpu.data import audio as audio_io

    y, _ = audio_io.load_audio(wav, sr=16000, mono=True)
    notes_c = srv_chunked.transcribe_array(y)
    notes_w = srv_window.transcribe_array(y)

    def coverage(notes, pitch):
        return sum(n.end - n.start for n in notes if n.pitch == pitch)

    # the long window sees the whole held note in one program — no seams
    assert coverage(notes_w, 72) >= 5.0, notes_w
    assert abs(coverage(notes_c, 72) - coverage(notes_w, 72)) <= 0.8, (
        notes_c, notes_w)
    # neither path may invent substantial other pitches
    for notes in (notes_c, notes_w):
        spurious = sum(n.end - n.start for n in notes if n.pitch != 72)
        assert spurious <= 0.6, notes


def test_stitch_rolls_band_ownership():
    """Each output frame comes from exactly the chunk whose interior covers
    it, the bands tile the timeline, and hop >= T degrades to concat."""
    import numpy as np

    n, t, hop = 4, 10, 6  # overlap 4, half = 2
    rolls = np.zeros((n, 88, t), np.float32)
    for i in range(n):
        rolls[i] = i + 1  # mark the source chunk
    out = T.stitch_rolls(rolls, hop)
    assert out.shape == (88, (n - 1) * hop + t)
    # chunk0 keeps [0, hop+half)=..8, chunk i keeps [i*hop+2, i*hop+8),
    # last keeps through its right edge
    expect = np.concatenate([
        np.full(8, 1.0), np.full(6, 2.0), np.full(6, 3.0), np.full(8, 4.0)])
    assert np.array_equal(out[0], expect), out[0]
    # no overlap: exact concat semantics
    assert np.array_equal(T.stitch_rolls(rolls, t),
                          np.concatenate(list(rolls), axis=1))


def test_overlap_mode_stitches(tmp_path):
    """Transcriber(overlap=...) must agree with the non-overlapping path on
    the trained demo checkpoint (same weights; only seam frames may move)."""
    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "assets", "demo_checkpoint")
    root = make_maestro_root(tmp_path / "maestro")
    wav = os.path.join(root, "2017", "piece1.wav")  # pitch 72 held 6 s / 6.5 s

    srv_plain = T.Transcriber(ckpt, threshold=0.35)
    srv_ov = T.Transcriber(ckpt, threshold=0.35, overlap=0.5)
    acfg = srv_ov.loaded.audio_cfg
    assert srv_ov.hop_samples is not None
    assert srv_ov.hop_samples % acfg.hop_length == 0  # frame-grid aligned
    assert srv_ov.hop_samples < acfg.chunk_samples

    from music_transcription_tpu.data import audio as audio_io

    y, _ = audio_io.load_audio(wav, sr=16000, mono=True)
    notes_p = srv_plain.transcribe_array(y)
    notes_o = srv_ov.transcribe_array(y)

    def coverage(notes, pitch):
        return sum(n.end - n.start for n in notes if n.pitch == pitch)

    assert coverage(notes_o, 72) >= 5.0, notes_o
    assert abs(coverage(notes_p, 72) - coverage(notes_o, 72)) <= 0.8, (
        notes_p, notes_o)
    spurious = sum(n.end - n.start for n in notes_o if n.pitch != 72)
    assert spurious <= 0.6, notes_o


def test_overlap_mode_rejects_bad_args(tmp_path):
    import pytest as _pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "assets", "demo_checkpoint")
    with _pytest.raises(ValueError, match="overlap"):
        T.Transcriber(ckpt, overlap=2.0)  # == chunk length (2 s demo ckpt)


def test_window_mode_rejects_ast(tmp_path):
    import pytest as _pytest

    from music_transcription_tpu.config import ModelConfig as MC

    ast_cfg = MC(model_type="transformer", n_mels=32)
    d = tmp_path / "ast_ckpt"
    model = TranscriptionModel(ast_cfg)
    variables = model.init(jax.random.key(0), model.example_input(batch=1, t=8))
    save_checkpoint(d, dict(variables))
    with open(d / "config.json", "w") as f:
        json.dump({"model": config_to_dict(ast_cfg),
                   "audio": config_to_dict(TINY_AUDIO)}, f)
    with _pytest.raises(ValueError, match="window"):
        T.Transcriber(d, window=10.0)
