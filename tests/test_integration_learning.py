"""End-to-end learning proof: preprocess -> train -> evaluate through the
real CLIs on the synthetic fixture; the model must (over)fit its train set.

This is the closest analogue of "does the whole framework actually learn":
it exercises caching, the jitted train step, checkpointing, checkpoint
loading in the eval CLI, threshold tuning, and the F1 metrics in one flow.
(~2-3 min on CPU; the 200-epoch variant reaches F1 = 1.0.)
"""

import os
import subprocess
import sys

import pytest

from tests.maestro_fixture import make_maestro_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_learns_to_transcribe_fixture(tmp_path):
    root = make_maestro_root(tmp_path / "maestro")
    cache = tmp_path / "cache"
    run = tmp_path / "run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    def cli(script, *args, timeout=1800):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script), "--device", "cpu", *args],
            capture_output=True, text=True, env=env, timeout=timeout,
        )
        assert proc.returncode == 0, f"{script}: {proc.stdout[-2000:]}{proc.stderr[-2000:]}"
        return proc.stdout

    cli("preprocess_dataset.py", "--root_dir", str(root), "--cache_dir", str(cache),
        "--splits", "train", "--chunk_length", "2.0", "--n_mels", "48", "--verify")

    cli("train_cnn.py", "--root_dir", str(root), "--cache_dir", str(cache),
        "--model_type", "cnn_rnn", "--n_mels", "48", "--hidden_size", "48",
        "--num_layers", "1", "--chunk_length", "2.0", "--epochs", "120",
        "--batch_size", "5", "--lr", "3e-3", "--save_every", "0",
        "--num_workers", "0", "--compute_dtype", "float32", "--data_parallel", "1",
        "--run_dir", str(run))

    out = cli("evaluate.py", "--model", str(run / "checkpoints" / "model_final"),
              "--cache_dir", str(cache), "--split", "train", "--headless",
              "--tune_threshold", "--tune_rounds", "3", "--tune_split", "train")
    f1 = float([l for l in out.splitlines() if l.startswith("EVAL_MEAN_F1=")][0].split("=")[1])
    assert f1 > 0.8, f"framework failed to learn its own train set: F1={f1}"


@pytest.mark.slow
def test_ast_learns_token_route(tmp_path):
    """The AST tier must LEARN, not just compile: overfit the synthetic
    fixture through the real scripts/train_ast.py CLI (real from-scratch
    encoder, next-token objective), then autoregressively decode each train
    chunk and demand framewise F1 >= 0.9 against the ground-truth rolls
    (reference capability: models/transformer_model.py:148-392)."""
    import json

    import numpy as np

    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "ast_run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--epochs", "400", "--batch_size", "5", "--lr", "3e-3",
         "--dropout", "0.0", "--max_token_len", "64", "--decoder_layers", "2",
         "--decoder_dim", "64", "--decoder_heads", "4",
         "--run_dir", str(run)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    assert proc.returncode == 0, f"train_ast: {proc.stdout[-2000:]}{proc.stderr[-2000:]}"

    import jax
    import jax.numpy as jnp

    from music_transcription_tpu.config import AudioConfig, ModelConfig
    from music_transcription_tpu.data.maestro import MaestroDataset
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.train.checkpoints import load_checkpoint

    ckpt = run / "model_final"
    cfg = json.load(open(ckpt / "config.json"))
    model = TranscriptionModel(ModelConfig(**cfg["model"]))
    audio_cfg = AudioConfig(**cfg["audio"])
    like = model.init(jax.random.key(0), jnp.zeros((1, audio_cfg.chunk_samples), jnp.float32))
    variables = load_checkpoint(ckpt, like={"params": like["params"]})

    dataset = MaestroDataset(str(root), split="train", chunk_length=2.0,
                             return_waveform=True, audio_cfg=audio_cfg)
    tp = fp = fn = 0
    for i in range(len(dataset)):
        wave, roll = dataset[i]
        pred = np.asarray(model.predict(
            variables, jnp.asarray(wave)[None], generate_max_len=64,
            max_T=roll.shape[-1],
        ))[0]
        t = min(pred.shape[-1], roll.shape[-1])
        p, g = pred[:, :t] > 0, np.asarray(roll)[:, :t] > 0
        # pred shorter than target counts as misses, not free truncation
        tp += int((p & g).sum())
        fp += int((p & ~g).sum())
        fn += int((~p & g).sum()) + int((np.asarray(roll)[:, t:] > 0).sum())
    f1 = 2 * tp / max(1, 2 * tp + fp + fn)
    assert f1 >= 0.9, f"AST tier failed to learn the fixture: F1={f1:.3f} (tp={tp} fp={fp} fn={fn})"

    # The evaluate_ast CLI (notebook evaluation driver, transformer_draft
    # cell 11) must score the same checkpoint: note-level F1 through
    # generate -> trim -> decode -> greedy onset matching.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate_ast.py"),
         "--model", str(ckpt), "--root_dir", str(root), "--split", "train",
         "--max_len", "64", "--device", "cpu", "--headless",
         "--onset_tol", "0.15"],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, f"evaluate_ast: {proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("EVAL_AST_NOTE_F1=")]
    assert line, proc.stdout[-2000:]
    note_f1 = float(line[0].split("=")[1])
    assert note_f1 >= 0.5, f"note-level F1 {note_f1} too low for an overfit model\n{proc.stdout[-1500:]}"

    # --teacher_forced skips generation and scores next-token prediction;
    # on an overfit fixture the NOTE_ON-pitch accuracy must be far above
    # the ~1/88 chance floor.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate_ast.py"),
         "--model", str(ckpt), "--root_dir", str(root), "--split", "train",
         "--max_len", "64", "--device", "cpu", "--headless",
         "--teacher_forced"],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, f"evaluate_ast --teacher_forced: " \
        f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("EVAL_AST_TF_PITCH_ACC=")]
    assert line, proc.stdout[-2000:]
    assert float(line[0].split("=")[1]) >= 0.5, proc.stdout[-1500:]
