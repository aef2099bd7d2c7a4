"""AST tier tests: teacher forcing, generation semantics, loss, wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_transcription_tpu.config import ModelConfig
from music_transcription_tpu.models.transcription import TranscriptionModel

TINY = dict(
    remi_vocab_size=512, decoder_layers=2, decoder_dim=32, decoder_heads=4,
    max_output_len=64, use_mock_encoder=True,
)


@pytest.fixture(scope="module")
def ast_model():
    cfg = ModelConfig(model_type="ast", dropout=0.1, **TINY)
    model = TranscriptionModel(cfg)
    wave = jnp.zeros((2, 3200), jnp.float32)
    variables = model.init(jax.random.key(0), wave)
    return model, variables


def test_teacher_forcing_logits(ast_model):
    model, variables = ast_model
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    targets = jnp.asarray(np.random.default_rng(1).integers(0, 500, (2, 16)))
    logits = model.apply(variables, wave, targets=targets)
    assert logits.shape == (2, 16, 512)
    loss = model.loss(logits, targets)
    assert np.isfinite(float(loss))


def test_loss_ignores_pad(ast_model):
    model, variables = ast_model
    wave = jnp.zeros((1, 3200), jnp.float32)
    targets = jnp.asarray([[5, 6, 2, 2, 2, 2, 2, 2]])  # mostly pad
    logits = model.apply(variables, wave, targets=targets)
    loss_full = model.loss(logits, targets)
    # manual CE over the two non-pad positions only
    import torch

    ref = torch.nn.CrossEntropyLoss(ignore_index=2)(
        torch.from_numpy(np.array(logits, np.float32)).reshape(-1, 512),
        torch.from_numpy(np.array(targets, np.int64)).reshape(-1),
    )
    assert float(loss_full) == pytest.approx(float(ref), rel=1e-5)


def test_generate_shapes_and_determinism(ast_model):
    model, variables = ast_model
    wave = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3200)), jnp.float32)
    ids = model.apply(variables, wave, targets=None, generate_max_len=12)
    assert ids.shape == (2, 12)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 512).all()
    ids2 = model.apply(variables, wave, targets=None, generate_max_len=12)
    assert np.array_equal(np.asarray(ids), np.asarray(ids2))  # greedy deterministic


def test_generate_masks_sos(ast_model):
    model, variables = ast_model
    wave = jnp.zeros((1, 3200), jnp.float32)
    ids = np.asarray(model.apply(variables, wave, targets=None, generate_max_len=20))
    assert (ids[:, 1:] != 0).all()  # sos masked after step 0


def test_generate_sampling_varies(ast_model):
    model, variables = ast_model
    wave = jnp.asarray(np.random.default_rng(3).standard_normal((1, 3200)), jnp.float32)
    a = model.apply(variables, wave, targets=None, generate_max_len=16,
                    do_sample=True, temperature=2.0, rng=jax.random.key(1))
    b = model.apply(variables, wave, targets=None, generate_max_len=16,
                    do_sample=True, temperature=2.0, rng=jax.random.key(2))
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_generate_repetition_penalty_reduces_repeats(ast_model):
    model, variables = ast_model
    wave = jnp.zeros((1, 3200), jnp.float32)
    plain = np.asarray(model.apply(variables, wave, targets=None, generate_max_len=30))
    pen = np.asarray(model.apply(variables, wave, targets=None, generate_max_len=30,
                                 repetition_penalty=100.0))
    # with a huge penalty no token can repeat
    _, counts = np.unique(pen[0], return_counts=True)
    assert counts.max() == 1
    _, counts_plain = np.unique(plain[0], return_counts=True)
    assert counts_plain.max() >= counts.max()


def test_generate_constrained_obeys_grammar(ast_model):
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

    model, variables = ast_model
    mask = REMITokenizer(vocab_size=512).transition_mask()
    wave = jnp.asarray(np.random.default_rng(7).standard_normal((2, 3200)), jnp.float32)
    for kwargs in ({}, {"do_sample": True, "temperature": 3.0,
                        "rng": jax.random.key(5)}):
        ids = np.asarray(model.apply(
            variables, wave, targets=None, generate_max_len=48,
            allowed_next=jnp.asarray(mask), **kwargs))
        for row in ids:
            prev = 0  # decode starts from <sos>
            for tok in row:
                assert mask[prev, int(tok)], (prev, int(tok))
                prev = int(tok)
    # unconstrained random-weight decode violates the grammar (the control
    # that proves the mask is doing the work)
    plain = np.asarray(model.apply(variables, wave, targets=None,
                                   generate_max_len=48))
    ok = all(mask[int(a), int(b)]
             for row in plain for a, b in zip([0] + row.tolist(), row.tolist()))
    assert not ok


def test_remi_transition_mask_accepts_all_encoder_output():
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

    tok = REMITokenizer(vocab_size=512)
    mask = tok.transition_mask()
    # zero-frame roll -> [sos, eos, pad...]: the empty transcription is legal
    empty = tok.encode_from_pianoroll(np.zeros((88, 0), np.float32), max_len=8)
    for a, b in zip(empty, empty[1:]):
        assert mask[a, b], (a, b)
    rng = np.random.default_rng(11)
    for trial in range(6):
        # random sparse rolls incl. long silences (multi-TIME_SHIFT runs)
        roll = (rng.random((88, 700)) < (0.002 + 0.01 * trial)).astype(np.float32)
        seq = tok.encode_from_pianoroll(roll, max_len=256)
        for a, b in zip(seq, seq[1:]):
            assert mask[a, b], (a, b)


def test_event_transition_mask_accepts_all_encoder_output():
    from music_transcription_tpu.models.event_tokenizer import EventMIDITokenizer

    tok = EventMIDITokenizer(vocab_size=512)
    mask = tok.transition_mask()
    empty = tok.encode_notes([], max_len=8)
    for a, b in zip(empty, empty[1:]):
        assert mask[a, b], (a, b)
    rng = np.random.default_rng(13)
    for trial in range(6):
        notes = [(int(rng.integers(21, 109)), float(s), float(s) + float(rng.random()))
                 for s in np.sort(rng.random(40) * (3.0 + 4.0 * trial))]
        seq = tok.encode_notes(notes, max_len=128)
        for a, b in zip(seq, seq[1:]):
            assert mask[a, b], (a, b)


def test_beam_size_one_matches_greedy_prefix(ast_model):
    model, variables = ast_model
    wave = jnp.asarray(np.random.default_rng(17).standard_normal((2, 3200)), jnp.float32)
    greedy = np.asarray(model.apply(variables, wave, targets=None,
                                    generate_max_len=24))
    beam1 = np.asarray(model.apply(variables, wave, targets=None,
                                   generate_max_len=24, beam_size=1))
    # beam_size=1 routes through generate (greedy): identical
    assert np.array_equal(greedy, beam1)
    beam = np.asarray(model.apply(variables, wave, targets=None,
                                  generate_max_len=24, beam_size=4))
    assert beam.shape == greedy.shape
    assert (beam >= 0).all() and (beam < 512).all()
    # deterministic: same inputs, same best hypothesis
    beam2 = np.asarray(model.apply(variables, wave, targets=None,
                                   generate_max_len=24, beam_size=4))
    assert np.array_equal(beam, beam2)


def test_beam_constrained_obeys_grammar(ast_model):
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

    model, variables = ast_model
    mask = REMITokenizer(vocab_size=512).transition_mask()
    wave = jnp.asarray(np.random.default_rng(19).standard_normal((2, 3200)), jnp.float32)
    ids = np.asarray(model.apply(
        variables, wave, targets=None, generate_max_len=40, beam_size=4,
        allowed_next=jnp.asarray(mask)))
    assert ids.shape == (2, 40)
    for row in ids:
        prev = 0
        for tok in row:
            # beam reordering may splice hypotheses, but every surviving
            # hypothesis was constrained at every step, including the pads
            # appended after <eos>
            assert mask[prev, int(tok)] or (prev == 2 and int(tok) == 2), \
                (prev, int(tok))
            prev = int(tok)


def test_predict_decodes_to_roll(ast_model):
    model, variables = ast_model
    wave = jnp.zeros((1, 3200), jnp.float32)
    roll = model.predict(variables, wave, generate_max_len=16)
    assert roll.shape[0] == 1 and roll.shape[1] == 88


def test_predict_constrained_decodes_to_roll(ast_model):
    model, variables = ast_model
    wave = jnp.zeros((1, 3200), jnp.float32)
    roll = model.predict(variables, wave, generate_max_len=16, constrained=True)
    assert roll.shape[0] == 1 and roll.shape[1] == 88


def test_real_encoder_path():
    cfg = ModelConfig(model_type="ast", dropout=0.0, remi_vocab_size=512,
                      decoder_layers=1, decoder_dim=32, decoder_heads=4,
                      max_output_len=32, use_mock_encoder=False)
    model = TranscriptionModel(cfg)
    wave = jnp.asarray(np.random.default_rng(4).standard_normal((1, 16000)), jnp.float32)
    variables = model.init(jax.random.key(0), wave)
    targets = jnp.asarray([[0, 10, 210, 300, 1, 2, 2, 2]])
    logits = model.apply(variables, wave, targets=targets)
    assert logits.shape == (1, 8, 512)
    assert np.isfinite(np.asarray(logits)).all()


def test_ast_train_step():
    """AST teacher-forcing must be trainable end to end."""
    import optax

    cfg = ModelConfig(model_type="ast", dropout=0.0, **TINY)
    model = TranscriptionModel(cfg)
    wave = jnp.asarray(np.random.default_rng(5).standard_normal((2, 3200)), jnp.float32)
    targets = jnp.asarray(np.random.default_rng(6).integers(3, 400, (2, 12)))
    variables = model.init(jax.random.key(0), wave)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.module.apply({"params": p}, wave, targets=targets, train=False)
            return model.loss(logits, targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    first = None
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_predict_decodes_with_trained_tokenizer(ast_model):
    """predict() must decode AST token output with the checkpoint's trained
    vocabulary (cfg.tokenizer), not unconditionally REMI."""
    model, variables = ast_model
    wave = jnp.zeros((1, 3200), jnp.float32)

    cfg_e = ModelConfig(model_type="ast", dropout=0.1, tokenizer="event", **TINY)
    model_e = TranscriptionModel(cfg_e)
    # same params (architecture identical); only decode differs
    roll_e = model_e.predict(variables, wave, generate_max_len=16, max_T=64)
    roll_r = model.predict(variables, wave, generate_max_len=16, max_T=64)
    assert roll_e.shape[1] == 88 and roll_r.shape[1] == 88
    # ids generated are identical; the two vocabularies must not decode to
    # the same roll unless both happen to be empty
    if float(roll_r.sum()) or float(roll_e.sum()):
        same_t = min(roll_e.shape[-1], roll_r.shape[-1])
        if roll_e[..., :same_t].shape == roll_r[..., :same_t].shape:
            diff = float(np.abs(np.asarray(roll_e[..., :same_t]) -
                                np.asarray(roll_r[..., :same_t])).sum())
            assert diff > 0 or roll_e.shape != roll_r.shape


def test_train_ast_cli_val_tracking(tmp_path):
    """--val_split tracks per-epoch CE, logs it, and writes model_best."""
    import os
    import subprocess
    import sys

    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--epochs", "2", "--batch_size", "2", "--max_token_len", "32",
         "--decoder_layers", "1", "--decoder_dim", "32", "--decoder_heads", "2",
         "--mock_encoder", "--no-sanity_checks",
         "--val_split", "validation", "--val_batches", "1",
         "--run_dir", str(run)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    log = (run / "training_log.txt").read_text().splitlines()
    assert len(log) == 2 and all("val_loss=" in l for l in log)
    assert (run / "model_best" / "config.json").exists()
    assert (run / "model_final" / "config.json").exists()


def test_train_ast_save_best_every_flushes_midrun(tmp_path):
    """--save_best_every N writes model_best during the run, not only at
    exit (a wedged tunnel RPC can never honor the exit flush — observed
    live on hardware: a SIGKILLed 37-epoch run lost its whole best state)."""
    import os
    import subprocess
    import sys

    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--epochs", "2", "--batch_size", "2", "--max_token_len", "32",
         "--decoder_layers", "1", "--decoder_dim", "32", "--decoder_heads", "2",
         "--mock_encoder", "--no-sanity_checks",
         "--val_split", "validation", "--val_batches", "1",
         "--save_best_every", "1", "--run_dir", str(run)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    assert (run / "model_best" / "config.json").exists()
    # the cadenced flush precedes the exit sequence (model_final is always
    # written first on exit, so a best-save seen before it is mid-run)
    best_at = proc.stdout.find(f"Saved {run / 'model_best'}")
    final_at = proc.stdout.find(f"Saved {run / 'model_final'}")
    assert 0 <= best_at < final_at, proc.stdout[-2000:]


def test_train_ast_save_best_every_requires_val_split(tmp_path):
    """--save_best_every without --val_split is an explicit error: the
    cadence flushes the best-validation params, and with no validation
    tracking there is never a best state to flush — a wedged run would
    silently lose everything, the exact failure the flag exists to bound."""
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    proc = _run_train_ast(["--root_dir", str(root), "--save_best_every", "5",
                           "--run_dir", str(tmp_path / "run")])
    assert proc.returncode != 0
    assert "--save_best_every needs --val_split" in proc.stderr


def test_train_ast_cli_scheduled_sampling(tmp_path):
    """--scheduled_sampling trains through the two-pass step and logs the
    linearly ramped ss_p per epoch."""
    import os
    import subprocess
    import sys

    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--epochs", "2", "--batch_size", "2", "--max_token_len", "32",
         "--decoder_layers", "1", "--decoder_dim", "32", "--decoder_heads", "2",
         "--mock_encoder", "--no-sanity_checks",
         "--scheduled_sampling", "0.5", "--ss_ramp_epochs", "2",
         "--run_dir", str(run)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    log = (run / "training_log.txt").read_text().splitlines()
    assert "ss_p=0.25" in log[0] and "ss_p=0.50" in log[1], log


def test_train_ast_cli_pitch_loss_weight(tmp_path):
    """--pitch_loss_weight trains through the weighted-CE step end-to-end
    (weights on NOTE_ON/NOTE_OFF targets; finite losses in the log)."""
    import os
    import subprocess
    import sys

    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--epochs", "1", "--batch_size", "2", "--max_token_len", "32",
         "--decoder_layers", "1", "--decoder_dim", "32", "--decoder_heads", "2",
         "--mock_encoder", "--no-sanity_checks",
         "--pitch_loss_weight", "4.0",
         "--run_dir", str(run)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    log = (run / "training_log.txt").read_text().splitlines()
    assert "train_loss=" in log[0] and "nan" not in log[0], log


def test_train_ast_cli_val_note_f1(tmp_path):
    """--val_note_f1_every logs generated note-F1 and --best_metric note_f1
    selects model_best by it (token CE and generated note-F1 decouple on
    hardware — CE-selected best is the wrong checkpoint for the metric that
    matters)."""
    import os
    import subprocess
    import sys

    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--epochs", "2", "--batch_size", "2", "--max_token_len", "32",
         "--decoder_layers", "1", "--decoder_dim", "32", "--decoder_heads", "2",
         "--mock_encoder", "--no-sanity_checks",
         "--val_split", "validation", "--val_batches", "1",
         "--val_note_f1_every", "1", "--val_note_f1_batches", "1",
         "--best_metric", "note_f1", "--run_dir", str(run)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    log = (run / "training_log.txt").read_text().splitlines()
    assert len(log) == 2 and all("val_note_f1=" in l for l in log), log
    assert "Best val_note_f1" in proc.stdout
    assert (run / "model_best" / "config.json").exists()


def test_train_ast_val_note_f1_flag_guards(tmp_path):
    """The generation-validation flags fail loudly when miswired."""
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    # --val_note_f1_every without --val_split
    proc = _run_train_ast(["--root_dir", str(root), "--val_note_f1_every", "1",
                           "--run_dir", str(tmp_path / "r1")])
    assert proc.returncode != 0
    assert "--val_note_f1_every needs --val_split" in proc.stderr
    # --best_metric note_f1 without --val_note_f1_every
    proc = _run_train_ast(["--root_dir", str(root), "--val_split", "validation",
                           "--best_metric", "note_f1",
                           "--run_dir", str(tmp_path / "r2")])
    assert proc.returncode != 0
    assert "--best_metric note_f1 needs --val_note_f1_every" in proc.stderr


def _run_train_ast(args, timeout=600):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--chunk_length", "2.0", "--epochs", "1",
         "--batch_size", "2", "--max_token_len", "32", "--decoder_layers", "1",
         "--decoder_dim", "32", "--decoder_heads", "2", "--mock_encoder",
         "--no-sanity_checks", *args],
        capture_output=True, text=True, timeout=timeout,
    )


def test_train_ast_compact_staged_cpu(tmp_path):
    """--device_data on --compact_data trains through int16-staged waveforms
    (device-side gather + dequantize) end to end."""
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = _run_train_ast(["--root_dir", str(root), "--device_data", "on",
                           "--compact_data", "--val_split", "validation",
                           "--val_batches", "1", "--run_dir", str(run)])
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    assert "Epoch 1/1" in (run / "training_log.txt").read_text()
    assert (run / "model_final" / "config.json").exists()


def test_train_ast_rejects_mismatched_val_cache(tmp_path):
    """A mel-only cache on --val_split must be rejected (it would silently
    corrupt the val CE that selects model_best), mirroring the train-path
    compatibility checks."""
    from music_transcription_tpu.data import cache as C
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    cache = tmp_path / "cache"
    rng = np.random.default_rng(0)
    for i in range(4):
        C.save_chunk(cache / "validation", i, {
            "mel": rng.standard_normal((229, 62)).astype(np.float32),
            "roll": np.zeros((88, 62), np.float32),
        })
    C.save_metadata(cache, "validation", {
        "num_chunks": 4, "chunk_length": 2.0, "overlap": 0.0, "n_mels": 229,
        "sr": 16000, "hop_length": 512, "return_waveform": False,
        "tokenize": False,
    })
    proc = _run_train_ast(["--root_dir", str(root), "--cache_dir", str(cache),
                           "--val_split", "validation",
                           "--run_dir", str(tmp_path / "run")])
    assert proc.returncode != 0
    assert "mel features" in proc.stderr + proc.stdout


def test_train_ast_rejects_empty_val_loader(tmp_path):
    """val split smaller than batch_size would yield zero val batches and a
    fake val_loss of 0.0; the CLI must refuse instead."""
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    proc = _run_train_ast(["--root_dir", str(root), "--val_split", "validation",
                           "--batch_size", "64",
                           "--run_dir", str(tmp_path / "run")])
    assert proc.returncode != 0
    assert "zero batches" in proc.stderr + proc.stdout


def test_encoder_pretrainer_module():
    """ASTEncoderPretrainer emits full-frame-rate 88-key logits and its
    encoder parameter subtrees transplant into ASTTranscriber unchanged."""
    from music_transcription_tpu.models.transformer import (
        ASTEncoderPretrainer,
        ASTTranscriber,
        encoder_param_subtrees,
    )

    pre = ASTEncoderPretrainer(encoder_layers=2, encoder_dim=32,
                               encoder_heads=2, patch_frames=4, n_mels=32)
    wave = jnp.zeros((2, 32000), jnp.float32)
    v = pre.init(jax.random.key(0), wave, train=False)
    out = pre.apply(v, wave, train=False)
    # T_mel = 1 + 32000//512 = 63 -> trimmed to 60 = S*patch_frames
    assert out.shape == (2, 88, 60)

    ast = ASTTranscriber(remi_vocab_size=64, decoder_layers=1, decoder_dim=32,
                         decoder_heads=2, encoder_layers=2, encoder_dim=32,
                         encoder_heads=2, patch_frames=4, n_mels=32,
                         use_mock_encoder=False, freeze_encoder=True)
    va = ast.init({"params": jax.random.key(1)}, wave,
                  targets=jnp.zeros((2, 8), jnp.int32), train=False)
    sub = encoder_param_subtrees(v["params"])
    assert sorted(sub) == ["enc0", "enc1", "enc_norm", "enc_pos", "patch_embed"]
    params = dict(va["params"])
    params.update(sub)
    logits = ast.apply({"params": params}, wave,
                       targets=jnp.zeros((2, 8), jnp.int32), train=False)
    assert logits.shape == (2, 8, 64)


def test_encoder_transplant_across_chunk_lengths():
    """An encoder pretrained on short chunks transplants into a model run on
    longer audio: every encoder param (patch_embed kernel, the fixed
    4096-slot enc_pos table, block weights) is chunk-length-independent, so
    only the *slice* of positions used changes. This is the pattern the 30 s
    operating-point run uses (10 s-pretrained encoder, 30 s decoder)."""
    from music_transcription_tpu.models.transformer import (
        ASTEncoderPretrainer,
        ASTTranscriber,
        encoder_param_subtrees,
    )

    pre = ASTEncoderPretrainer(encoder_layers=2, encoder_dim=32,
                               encoder_heads=2, patch_frames=4, n_mels=32)
    short = jnp.zeros((2, 32000), jnp.float32)   # 2 s @ 16 kHz
    v = pre.init(jax.random.key(0), short, train=False)

    ast = ASTTranscriber(remi_vocab_size=64, decoder_layers=1, decoder_dim=32,
                         decoder_heads=2, encoder_layers=2, encoder_dim=32,
                         encoder_heads=2, patch_frames=4, n_mels=32,
                         use_mock_encoder=False)
    long = jnp.zeros((2, 96000), jnp.float32)    # 3x the pretrain length
    va = ast.init({"params": jax.random.key(1)}, long,
                  targets=jnp.zeros((2, 8), jnp.int32), train=False)
    sub = encoder_param_subtrees(v["params"])
    # shape-compatible leaf by leaf (what train_ast's transplant verifies)
    for k, tree in sub.items():
        want = jax.tree.map(lambda a: a.shape, va["params"][k])
        got = jax.tree.map(lambda a: a.shape, tree)
        assert want == got, k
    params = dict(va["params"])
    params.update(sub)
    logits = ast.apply({"params": params}, long,
                       targets=jnp.zeros((2, 8), jnp.int32), train=False)
    assert logits.shape == (2, 8, 64)
    assert bool(jnp.isfinite(logits).all())


def test_pretrain_then_encoder_init_freeze_cli(tmp_path):
    """The documented pretrain/freeze/finetune recipe through the real CLI:
    --pretrain_frames trains the encoder tower and writes a checkpoint;
    --encoder_init transplants it into the AST model; --freeze-encoder keeps
    it bit-identical through decoder training (the reference's frozen
    pretrained-encoder pattern, transformer_model.py:35,94-97)."""
    from music_transcription_tpu.train.checkpoints import load_checkpoint
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    geo = ["--encoder_layers", "1", "--encoder_dim", "32", "--encoder_heads",
           "2", "--patch_frames", "4", "--encoder_n_mels", "32"]
    pre_run = tmp_path / "pre"
    proc = _run_train_ast(["--root_dir", str(root), "--pretrain_frames",
                           "--epochs", "2", "--val_split", "validation",
                           "--val_batches", "1", "--run_dir", str(pre_run),
                           *geo])
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    assert "val_frame_f1=" in proc.stdout
    assert (pre_run / "model_best" / "config.json").exists()

    ast_run = tmp_path / "ast"
    proc = _run_train_ast(["--root_dir", str(root), "--no-mock_encoder",
                           "--encoder_init", str(pre_run / "model_best"),
                           "--freeze_encoder", "--run_dir", str(ast_run), *geo])
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    assert "Initialized encoder" in proc.stdout

    pre_params = load_checkpoint(str(pre_run / "model_best"))["params"]
    ast_params = load_checkpoint(str(ast_run / "model_final"))["params"]
    for k in ("patch_embed", "enc0", "enc_norm", "enc_pos"):
        for a, b in zip(jax.tree.leaves(pre_params[k]),
                        jax.tree.leaves(ast_params[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_frames_compact_staged_cpu(tmp_path):
    """--pretrain_frames with --device_data on --compact_data trains through
    the int16-staged step_staged/eval_staged path."""
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "pre"
    proc = _run_train_ast(["--root_dir", str(root), "--pretrain_frames",
                           "--device_data", "on", "--compact_data",
                           "--val_split", "validation", "--val_batches", "1",
                           "--run_dir", str(run),
                           "--encoder_layers", "1", "--encoder_dim", "32",
                           "--encoder_heads", "2", "--encoder_n_mels", "32"])
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    assert "val_frame_f1" in (run / "training_log.txt").read_text()


def test_encoder_init_geometry_mismatch_errors(tmp_path):
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    pre_run = tmp_path / "pre"
    proc = _run_train_ast(["--root_dir", str(root), "--pretrain_frames",
                           "--epochs", "1", "--run_dir", str(pre_run),
                           "--encoder_layers", "1", "--encoder_dim", "32",
                           "--encoder_heads", "2", "--encoder_n_mels", "32"])
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    proc = _run_train_ast(["--root_dir", str(root), "--no-mock_encoder",
                           "--encoder_init", str(pre_run / "model_final"),
                           "--run_dir", str(tmp_path / "ast"),
                           "--encoder_layers", "2", "--encoder_dim", "32",
                           "--encoder_heads", "2", "--encoder_n_mels", "32"])
    assert proc.returncode != 0
    assert "geometry mismatch" in proc.stderr + proc.stdout


def test_train_ast_sigterm_flushes_best(tmp_path):
    """`kill <pid>` on a backgrounded run must flush model_best/model_final
    (backgrounded jobs ignore SIGINT per POSIX job control, so SIGTERM is
    the only graceful stop an operator can send)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from tests.maestro_fixture import make_maestro_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts", "train_ast.py"),
         "--device", "cpu", "--root_dir", str(root), "--chunk_length", "2.0",
         "--pretrain_frames", "--epochs", "10000", "--batch_size", "2",
         "--encoder_layers", "1", "--encoder_dim", "32", "--encoder_heads",
         "2", "--encoder_n_mels", "32", "--val_split", "validation",
         "--val_batches", "1", "--run_dir", str(run)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    log = run / "training_log.txt"
    deadline = time.time() + 240
    while time.time() < deadline and not (log.exists() and log.read_text()):
        time.sleep(1.0)
    assert log.exists(), "training never reached epoch 1"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert (run / "model_best").exists(), out[-2000:]
    assert (run / "model_final").exists(), out[-2000:]
