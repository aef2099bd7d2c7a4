"""example.sh workflow driver: the `ast` mode end-to-end.

The cnn modes (preprocess/train/eval) background their work and prompt for
confirmation, so they are exercised via their underlying CLIs elsewhere;
the ast mode is synchronous and drives the full round-4 recipe — cache ->
encoder self-pretrain -> decoder train with the frozen pretrained encoder
-> note-level eval (reference example.sh:22-280 surface,
transformer_draft.ipynb workflow).
"""

import os
import subprocess

import pytest

from tests.maestro_fixture import make_maestro_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_example_sh_ast_workflow(tmp_path):
    root = make_maestro_root(tmp_path / "maestro")
    env = dict(
        os.environ,
        ROOT_DIR=str(root),
        AST_CACHE_DIR=str(tmp_path / "cache"),
        AST_CHUNK_LENGTH="2.0",
        AST_PRETRAIN_EPOCHS="1",
        AST_EPOCHS="1",
        AST_BATCH_SIZE="2",
        AST_OUT=str(tmp_path / "out"),
        DEVICE="cpu",
        NUM_WORKERS="1",
        EVAL_SPLIT="validation",  # the fixture has no test pieces
        AST_EXTRA_ARGS=("--encoder_layers 1 --encoder_dim 32 --encoder_heads 2 "
                        "--encoder_n_mels 32 --decoder_layers 1 --decoder_dim 32 "
                        "--decoder_heads 2 --max_token_len 32 --no-sanity_checks"),
    )
    proc = subprocess.run(["bash", os.path.join(REPO, "example.sh"), "ast"],
                          env=env, capture_output=True, text=True, timeout=900,
                          cwd=str(tmp_path))
    assert proc.returncode == 0, f"{proc.stdout[-3000:]}{proc.stderr[-2000:]}"
    out = proc.stdout
    assert "EVAL_AST_NOTE_F1=" in out
    assert (tmp_path / "out" / "pretrain" / "model_best" / "config.json").exists()
    assert (tmp_path / "out" / "decoder" / "model_best" / "config.json").exists()
    # the decoder stage really transplanted the pretrained encoder
    assert "Initialized encoder" in out and "frozen" in out
