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
