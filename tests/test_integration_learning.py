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
              "--tune_threshold", "--tune_rounds", "3")
    f1 = float([l for l in out.splitlines() if l.startswith("EVAL_MEAN_F1=")][0].split("=")[1])
    assert f1 > 0.8, f"framework failed to learn its own train set: F1={f1}"
