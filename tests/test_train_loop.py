"""End-to-end training loop + train_cnn CLI tests on the synthetic fixture."""

import os
import subprocess
import sys

import numpy as np
import pytest

from music_transcription_tpu.config import AudioConfig, ModelConfig, TrainConfig
from music_transcription_tpu.data.maestro import MaestroDataset
from music_transcription_tpu.data.pipeline import Loader
from music_transcription_tpu.train.loop import train_model

from tests.maestro_fixture import make_maestro_root

CFG = AudioConfig(n_mels=32, chunk_length=2.0)


@pytest.fixture(scope="module")
def maestro_root(tmp_path_factory):
    return make_maestro_root(tmp_path_factory.mktemp("maestro"))


def test_train_model_end_to_end(maestro_root, tmp_path):
    mcfg = ModelConfig(
        model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1,
        dropout=0.0, compute_dtype="float32",
    )
    tcfg = TrainConfig(epochs=2, batch_size=2, learning_rate=1e-3, save_every=1,
                       data_parallel=1, num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    val_set = MaestroDataset(maestro_root, split="validation", chunk_length=2.0, audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    train_loader = Loader(train_set, 2, shuffle=True, num_workers=0, drop_last=True, pad_to=pad_to)
    val_loader = Loader(val_set, 1, num_workers=0, pad_to=pad_to)

    run_dir = str(tmp_path / "run")
    model, state, history = train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=train_loader, val_loader=val_loader,
        run_dir=run_dir, verbose=False,
    )
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(l) for l in history["train_loss"])
    # artifacts
    assert os.path.exists(os.path.join(run_dir, "parameters.json"))
    assert os.path.exists(os.path.join(run_dir, "training_log.txt"))
    assert os.path.exists(os.path.join(run_dir, "loss_curve.png"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "model_final"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "model_best"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "model_epoch_1"))
    # checkpoints load back for inference
    from music_transcription_tpu.transcribe import load_model

    loaded = load_model(os.path.join(run_dir, "checkpoints", "model_best"))
    assert loaded.model.config.n_mels == 32


def test_resume_from_best_state_checkpoint(maestro_root, tmp_path):
    """model_best flushes hold {params, batch_stats, step} only — resume
    must fall back to a partial restore with a fresh optimizer."""
    mcfg = ModelConfig(
        model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1,
        dropout=0.0, compute_dtype="float32",
    )
    tcfg = TrainConfig(epochs=1, batch_size=2, learning_rate=1e-3,
                       save_every=0, data_parallel=1, num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    train_loader = Loader(train_set, 2, shuffle=True, num_workers=0,
                          drop_last=True, pad_to=pad_to)
    run_dir = str(tmp_path / "first")
    train_model(model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
                train_loader=train_loader, val_loader=train_loader,
                run_dir=run_dir, verbose=False)
    best = os.path.join(run_dir, "checkpoints", "model_best")
    from music_transcription_tpu.train.checkpoints import load_checkpoint

    assert "opt_state" not in load_checkpoint(best)  # the premise
    _, state, history = train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=train_loader, val_loader=train_loader,
        run_dir=str(tmp_path / "second"), verbose=False, resume_from=best,
    )
    assert len(history["train_loss"]) == 1
    assert all(np.isfinite(l) for l in history["train_loss"])
    assert int(state["step"]) > 0


def test_early_stop_patience(maestro_root, tmp_path):
    """lr=0 -> val never improves after epoch 1 -> stop at 1+patience."""
    mcfg = ModelConfig(
        model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1,
        dropout=0.0, compute_dtype="float32",
    )
    tcfg = TrainConfig(epochs=10, batch_size=2, learning_rate=0.0, save_every=0,
                       early_stop_patience=2, data_parallel=1, num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    val_set = MaestroDataset(maestro_root, split="validation", chunk_length=2.0, audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    train_loader = Loader(train_set, 2, shuffle=True, num_workers=0, drop_last=True, pad_to=pad_to)
    val_loader = Loader(val_set, 1, num_workers=0, pad_to=pad_to)

    run_dir = str(tmp_path / "run")
    _, _, history = train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=train_loader, val_loader=val_loader,
        run_dir=run_dir, verbose=False,
    )
    assert len(history["train_loss"]) == 3  # epoch 1 best + 2 patience
    # best/final still flushed after the break
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "model_best"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "model_final"))


def test_save_best_every_cadence(maestro_root, tmp_path, monkeypatch):
    """save_best_every=3 writes model_best at most every 3 epochs while val
    keeps improving, and a final-epoch improvement always persists."""
    from music_transcription_tpu.train import checkpoints as ckpt_lib
    from music_transcription_tpu.train import loop as loop_mod

    saves = []
    real_save = ckpt_lib.save_checkpoint

    def spy(path, state, **kw):
        saves.append(os.path.basename(str(path)))
        return real_save(path, state, **kw)

    monkeypatch.setattr(loop_mod.ckpt_lib, "save_checkpoint", spy)

    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8,
                       num_layers=1, dropout=0.0, compute_dtype="float32")
    tcfg = TrainConfig(epochs=5, batch_size=2, learning_rate=1e-3,
                       save_every=0, save_best_every=3, data_parallel=1,
                       num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    val_set = MaestroDataset(maestro_root, split="validation", chunk_length=2.0, audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    train_loader = Loader(train_set, 2, shuffle=True, num_workers=0, drop_last=True, pad_to=pad_to)
    val_loader = Loader(val_set, 1, num_workers=0, pad_to=pad_to)

    train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=train_loader, val_loader=val_loader,
        run_dir=str(tmp_path / "run"), verbose=False,
    )
    n_best = sum(1 for s in saves if s == "model_best")
    # 5 epochs of (almost surely) monotone improvement at cadence 3:
    # epoch 1 flushes, epochs 2-3 retain on device, epoch 4 flushes, epoch
    # 5's improvement lands via the exit flush -> 2..3 best saves, never 5
    assert 1 <= n_best <= 3, saves
    assert "model_final" in saves
    assert os.path.isdir(tmp_path / "run" / "checkpoints" / "model_best")


def test_best_flushed_on_abort(maestro_root, tmp_path, monkeypatch):
    """An abort mid-run (NaN abort / Ctrl-C) must not lose cadence-retained
    best improvements: the exit flush writes the device-resident best."""
    from music_transcription_tpu.train import loop as loop_mod

    saves = []
    real_save = loop_mod.ckpt_lib.save_checkpoint

    def spy(path, state, **kw):
        saves.append(os.path.basename(str(path)))
        return real_save(path, state, **kw)

    monkeypatch.setattr(loop_mod.ckpt_lib, "save_checkpoint", spy)

    real_epoch = loop_mod.train_one_epoch
    calls = {"n": 0}

    def bomb(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # epochs 1-2 run; epoch 3 aborts
            raise loop_mod.TrainingUnstableError("boom")
        return real_epoch(*a, **kw)

    monkeypatch.setattr(loop_mod, "train_one_epoch", bomb)

    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8,
                       num_layers=1, dropout=0.0, compute_dtype="float32")
    tcfg = TrainConfig(epochs=10, batch_size=2, learning_rate=1e-3,
                       save_every=0, save_best_every=100, data_parallel=1,
                       num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    val_set = MaestroDataset(maestro_root, split="validation", chunk_length=2.0, audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    train_loader = Loader(train_set, 2, shuffle=True, num_workers=0, drop_last=True, pad_to=pad_to)
    val_loader = Loader(val_set, 1, num_workers=0, pad_to=pad_to)

    import pytest as _pytest

    with _pytest.raises(loop_mod.TrainingUnstableError):
        train_model(
            model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
            train_loader=train_loader, val_loader=val_loader,
            run_dir=str(tmp_path / "run"), verbose=False,
        )
    # cadence 100 means no in-loop flush happened; the finally must have
    # written the epoch-1-or-2 improvement (epoch 1 flushes immediately due
    # to the initial cadence window; the later retained one lands on exit)
    assert "model_best" in saves
    assert os.path.isdir(tmp_path / "run" / "checkpoints" / "model_best")
    assert "model_final" not in saves  # aborted runs have no final


def test_train_model_data_parallel_mesh(maestro_root, tmp_path):
    from music_transcription_tpu.parallel.mesh import make_mesh

    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1,
                       dropout=0.0, compute_dtype="float32")
    tcfg = TrainConfig(epochs=1, batch_size=4, learning_rate=1e-3, save_every=0, num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    loader = Loader(train_set, 4, shuffle=True, num_workers=0, drop_last=True,
                    pad_to=CFG.mel_frames_per_chunk)
    _, state, history = train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=loader, val_loader=None,
        run_dir=str(tmp_path / "dp_run"), mesh=make_mesh(4), verbose=False,
    )
    assert len(history["train_loss"]) == 1
    assert np.isfinite(history["train_loss"][0])
    assert int(state["step"]) == 1  # 5 chunks, bs 4, drop_last -> 1 step


def test_train_model_fsdp_partitioning(maestro_root, tmp_path):
    """train_model with partitioning='fsdp' + model_parallel=2: the loop
    builds the 2-D (data, model) mesh itself, trains with sharded state,
    evaluates through the sharded eval step, and checkpoints (np.asarray
    gathers the shards)."""
    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1,
                       dropout=0.0, compute_dtype="float32")
    tcfg = TrainConfig(epochs=1, batch_size=4, learning_rate=1e-3, save_every=1,
                       num_workers=0, partitioning="fsdp", model_parallel=2,
                       data_parallel=4, rng_impl="rbg")  # also exercise rbg keys
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    val_set = MaestroDataset(maestro_root, split="validation", chunk_length=2.0, audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    loader = Loader(train_set, 4, shuffle=True, num_workers=0, drop_last=True, pad_to=pad_to)
    val_loader = Loader(val_set, 4, num_workers=0, pad_to=pad_to)
    run_dir = tmp_path / "fsdp_run"
    _, state, history = train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=loader, val_loader=val_loader,
        run_dir=str(run_dir), verbose=False,
    )
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_loss"][0])
    # state leaves really sharded (one per LSTM/dense matrix at minimum)
    import jax

    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(state["params"])
    )
    # checkpoint round-trips into inference
    from music_transcription_tpu.transcribe import load_model

    loaded = load_model(str(run_dir / "checkpoints" / "model_final"))
    assert loaded.model.config.n_mels == 32


def test_train_cnn_cli_smoke(maestro_root, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run_dir = tmp_path / "cli_run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "scripts", "train_cnn.py"),
            "--root_dir", str(maestro_root), "--cache_dir", str(tmp_path / "absent"),
            "--model_type", "cnn_rnn", "--n_mels", "32", "--hidden_size", "8",
            "--num_layers", "1", "--chunk_length", "2.0", "--epochs", "1",
            "--batch_size", "2", "--save_every", "1", "--num_workers", "0",
            "--compute_dtype", "float32", "--device", "cpu", "--data_parallel", "1",
            "--run_dir", str(run_dir),
        ],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "Training complete" in proc.stdout
    assert (run_dir / "checkpoints" / "model_final").is_dir()


def test_train_model_shardmap_path(maestro_root, tmp_path):
    """Exercise the shard_map train/eval step builders directly (the CLI
    routes mesh + pallas-backend runs through them; on CPU we validate the
    shard_map plumbing with the scan backend)."""
    import jax
    import optax

    from music_transcription_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from music_transcription_tpu.parallel.train_step import (
        init_train_state, make_eval_step_shardmap, make_train_step_shardmap,
    )
    from music_transcription_tpu.models.transcription import TranscriptionModel

    import jax.numpy as jnp

    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8, num_layers=1,
                       dropout=0.0, compute_dtype="float32")
    model = TranscriptionModel(mcfg)
    tx = optax.adam(1e-3)
    mesh = make_mesh(4)
    state = replicate(
        init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=12)),
        mesh,
    )
    rng = np.random.default_rng(0)
    batch = tuple(
        shard_batch(a, mesh) for a in (
            rng.standard_normal((4, 1, 32, 12)).astype(np.float32),
            (rng.random((4, 88, 12)) > 0.9).astype(np.float32),
            np.full((4,), 12, np.int32),
        )
    )
    step = make_train_step_shardmap(model, tx, mesh)
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    ev = make_eval_step_shardmap(model, mesh)
    assert np.isfinite(float(ev(state, batch)))


def test_rss_recycle_exit67_and_resume_auto(maestro_root, tmp_path):
    """The bounded-host-memory supervisor contract end to end: a run with a
    tiny --rss_watermark_gb checkpoints and exits RECYCLE_EXIT_CODE (67)
    after epoch 1; re-running the identical command with --resume auto picks
    up the newest epoch checkpoint and completes the remaining epochs."""
    from music_transcription_tpu.train.watchdog import RECYCLE_EXIT_CODE

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run_dir = tmp_path / "recycle_run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    base = [
        sys.executable, os.path.join(repo, "scripts", "train_cnn.py"),
        "--root_dir", str(maestro_root), "--cache_dir", str(tmp_path / "absent"),
        "--model_type", "cnn_rnn", "--n_mels", "32", "--hidden_size", "8",
        "--num_layers", "1", "--chunk_length", "2.0", "--epochs", "3",
        "--batch_size", "2", "--save_every", "0", "--num_workers", "0",
        "--compute_dtype", "float32", "--device", "cpu", "--data_parallel", "1",
        "--run_dir", str(run_dir), "--resume", "auto",
    ]
    # leg 1: any real process exceeds a 1 MB watermark -> recycle after epoch 1
    p1 = subprocess.run(base + ["--rss_watermark_gb", "0.001"],
                        capture_output=True, text=True, env=env, timeout=900)
    assert p1.returncode == RECYCLE_EXIT_CODE, p1.stdout[-2000:] + p1.stderr[-2000:]
    assert "requesting recycle" in p1.stdout
    assert (run_dir / "checkpoints" / "model_epoch_1").is_dir()
    assert not (run_dir / "checkpoints" / "model_final").exists()

    # leg 2: the supervisor's next iteration — same command, watermark off
    p2 = subprocess.run(base, capture_output=True, text=True, env=env, timeout=900)
    assert p2.returncode == 0, p2.stdout[-2000:] + p2.stderr[-2000:]
    assert "model_epoch_1" in p2.stdout  # --resume auto found leg 1's state
    assert "Resuming from epoch 1; starting at 2" in p2.stdout
    assert (run_dir / "checkpoints" / "model_final").is_dir()
    log = (run_dir / "training_log.txt").read_text()
    # exactly one epoch from leg 1 plus epochs 2..3 from leg 2
    assert [l.split()[1] for l in log.strip().splitlines()] == ["1", "2", "3"]


def test_train_model_with_slab_loader(maestro_root, tmp_path):
    """train_model composes with SlabRotatingLoader: multi-slab feeding
    trains to finite losses and writes the usual artifacts."""
    from music_transcription_tpu.data.pipeline import SlabRotatingLoader, collate_mel

    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=8,
                       num_layers=1, dropout=0.0, compute_dtype="float32")
    tcfg = TrainConfig(epochs=2, batch_size=2, learning_rate=1e-3,
                       save_every=0, data_parallel=1, num_workers=0)
    train_set = MaestroDataset(maestro_root, split="train", chunk_length=2.0,
                               audio_cfg=CFG)
    pad_to = CFG.mel_frames_per_chunk
    item_bytes = sum(a.nbytes for a in collate_mel([train_set[0]], pad_to=pad_to))
    train_loader = SlabRotatingLoader(
        train_set, 2, pad_to=pad_to, num_workers=0, shuffle=True, seed=0,
        slab_bytes=item_bytes * 3)
    assert train_loader.n_slabs >= 2  # actually rotates
    run_dir = str(tmp_path / "slab_run")
    _, _, history = train_model(
        model_cfg=mcfg, train_cfg=tcfg, audio_cfg=CFG,
        train_loader=train_loader, val_loader=None,
        run_dir=run_dir, verbose=False,
    )
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(l) for l in history["train_loss"])
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "model_final"))
