"""Multi-host (pod) path: ProcessShard, local_batch_size, and a REAL
2-process CPU run (local coordinator + Gloo collectives) checked for
equivalence against the single-process 8-device result.

The reference has no distributed execution at all (SURVEY §2.10-bis); this
is first-class new surface, so it gets the strongest test we can run on one
machine: two actual JAX processes assembling global batches with
jax.make_array_from_process_local_data through the production Loader /
device_prefetch / train-step path.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from music_transcription_tpu.parallel.distributed import ProcessShard, local_batch_size

HERE = os.path.dirname(os.path.abspath(__file__))


class _Rng:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return i


def test_process_shard_round_robin_equal_lengths():
    shards = [ProcessShard(_Rng(), process_index=p, process_count=3) for p in range(3)]
    # ceil(10/3) = 4 on EVERY shard (wraparound keeps collective counts equal)
    assert all(len(s) == 4 for s in shards)
    seen = [s[i] for s in shards for i in range(4)]
    assert set(seen) == set(range(10))  # covers everything (some repeats)
    assert shards[1][2] == 2 * 3 + 1


def test_process_shard_exact_partitions_without_duplicates():
    shards = [ProcessShard(_Rng(), process_index=p, process_count=3, exact=True)
              for p in range(3)]
    assert [len(s) for s in shards] == [4, 3, 3]
    seen = sorted(s[i] for s in shards for i in range(len(s)))
    assert seen == list(range(10))  # exact cover, no duplicates
    with pytest.raises(IndexError):
        shards[1][3]


def test_local_batch_size():
    # process_count()==1 in the test process: identity, and divisibility holds
    assert local_batch_size(8) == 8


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_losses():
    """Same two steps on the in-process 8-device CPU mesh, full dataset."""
    import jax

    from music_transcription_tpu.config import ModelConfig, TrainConfig
    from music_transcription_tpu.data.pipeline import Loader, device_prefetch
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.parallel.mesh import make_mesh, replicate
    from music_transcription_tpu.parallel.train_step import (
        init_train_state,
        jit_data_parallel,
        make_train_step,
    )
    from music_transcription_tpu.train.optim import make_optimizer

    sys.path.insert(0, HERE)
    from _multihost_worker import GLOBAL_BATCH, T, SynthSet

    mesh = make_mesh(8)
    cfg = ModelConfig(model_type="cnn_rnn", n_mels=16, hidden_size=8,
                      num_layers=1, dropout=0.0, compute_dtype="float32")
    model = TranscriptionModel(cfg)
    tx = make_optimizer(TrainConfig(batch_size=GLOBAL_BATCH))
    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=T))
    state = replicate(state, mesh)
    step = jit_data_parallel(make_train_step(model, tx), mesh)
    loader = Loader(SynthSet(), GLOBAL_BATCH, shuffle=False, num_workers=0, pad_to=T)
    losses = []
    for batch in device_prefetch(iter(loader), mesh=mesh):
        state, metrics = step(state, batch, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    return losses


def test_two_process_training_matches_single_process():
    """Spawn a real 2-process JAX 'pod' on localhost; per-step losses must
    match the single-process 8-device run (the global batch differs only by
    a row permutation, to which loss/grads/BN are invariant)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             str(port), str(p), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    worker_losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES=")]
        assert line, f"no LOSSES line in:\n{out}"
        worker_losses.append([float(x) for x in line[0].removeprefix("LOSSES=").split(",")])
    # both processes observe the identical (replicated) global loss
    assert worker_losses[0] == worker_losses[1]

    expected = _single_process_losses()
    assert len(expected) == len(worker_losses[0]) == 2
    np.testing.assert_allclose(worker_losses[0], expected, atol=5e-5)


@pytest.mark.slow
def test_two_process_evaluate_cli_matches_single_process(tmp_path):
    """scripts/evaluate.py run as a 2-process pod (exact sample sharding,
    gathered per-sample F1, all-gathered tuning grids) must print the same
    EVAL_MEAN_F1 / EVAL_BEST_THRESHOLD as the single-process run."""
    import json

    import jax
    import jax.numpy as jnp

    from music_transcription_tpu.config import AudioConfig, ModelConfig, config_to_dict
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.train.checkpoints import save_checkpoint
    from tests.maestro_fixture import make_maestro_root

    root = make_maestro_root(tmp_path / "maestro")
    acfg = AudioConfig(n_mels=32, chunk_length=2.0)
    mcfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=16,
                       num_layers=1, compute_dtype="float32")
    model = TranscriptionModel(mcfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, dict(model.init(jax.random.key(0),
                                          model.example_input(batch=1, t=16))))
    json.dump({"model": config_to_dict(mcfg), "audio": config_to_dict(acfg)},
              open(ckpt / "config.json", "w"))

    base_cmd = [sys.executable, os.path.join(os.path.dirname(HERE), "scripts", "evaluate.py"),
                "--model", str(ckpt), "--root_dir", str(root), "--split", "train",
                "--data_source", "full", "--device", "cpu", "--headless",
                "--batch_size", "2", "--tune_threshold", "--tune_rounds", "2",
                "--tune_split", "train"]

    def parse(out):
        vals = {}
        for ln in out.splitlines():
            if "=" in ln and ln.startswith("EVAL_"):
                k, v = ln.split("=")
                vals[k] = float(v)
        return vals

    env1 = {k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    single = subprocess.run(base_cmd, capture_output=True, text=True,
                            env=env1, timeout=600)
    assert single.returncode == 0, single.stdout[-2000:] + single.stderr[-2000:]
    ref = parse(single.stdout)
    assert "EVAL_MEAN_F1" in ref

    port = _free_port()
    procs = []
    for p in range(2):
        env = dict(env1)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(p)
        procs.append(subprocess.Popen(base_cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True, env=env))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multihost evaluate failed:\n{out[-3000:]}"
    got = parse(outs[0])  # process 0 prints the reduced metrics
    assert not parse(outs[1])  # non-main prints nothing
    assert abs(got["EVAL_MEAN_F1"] - ref["EVAL_MEAN_F1"]) < 1e-6, (got, ref)
    assert abs(got["EVAL_BEST_THRESHOLD"] - ref["EVAL_BEST_THRESHOLD"]) < 1e-9
