"""Subprocess worker for the 2-process multi-host test.

Runs as one JAX process of a local 2-process "pod" (Gloo collectives over
127.0.0.1): 4 virtual CPU devices per process, 8 global. Trains two steps of
the small model over the full 8-device global mesh, feeding per-process
ProcessShard batches assembled by device_prefetch via
jax.make_array_from_process_local_data, and prints the per-step losses.

Usage: python _multihost_worker.py <port> <process_id> <num_processes>

Also imported by tests/test_multihost.py for the shared SynthSet fixture —
keep module import side-effect free.
"""

import os
import sys

import numpy as np

N_ITEMS, GLOBAL_BATCH, N_MELS, T = 16, 8, 16, 24


class SynthSet:
    """Deterministic per-global-index items (shared with the test)."""

    def __len__(self):
        return N_ITEMS

    def __getitem__(self, g):
        rng = np.random.default_rng(1000 + g)
        mel = rng.standard_normal((N_MELS, T)).astype(np.float32)
        roll = (rng.random((88, T)) > 0.9).astype(np.float32)
        return mel, roll


def main():
    port, pid, nproc = sys.argv[1], sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = nproc
    os.environ["JAX_PROCESS_ID"] = pid

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from music_transcription_tpu.config import ModelConfig, TrainConfig
    from music_transcription_tpu.data.pipeline import Loader, device_prefetch
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.parallel.distributed import (
        ProcessShard,
        local_batch_size,
        maybe_initialize_distributed,
    )
    from music_transcription_tpu.parallel.mesh import make_mesh, replicate
    from music_transcription_tpu.parallel.train_step import (
        init_train_state,
        jit_data_parallel,
        make_train_step,
    )
    from music_transcription_tpu.train.optim import make_optimizer

    assert maybe_initialize_distributed(verbose=False), "expected multi-process"
    assert jax.device_count() == 4 * int(nproc)

    mesh = make_mesh()  # all global devices
    # dropout=0 so the loss is exactly batch-permutation invariant (the global
    # row order differs from the single-process loader by a permutation)
    cfg = ModelConfig(model_type="cnn_rnn", n_mels=N_MELS, hidden_size=8,
                      num_layers=1, dropout=0.0, compute_dtype="float32")
    model = TranscriptionModel(cfg)
    tx = make_optimizer(TrainConfig(batch_size=GLOBAL_BATCH))
    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=T))
    state = replicate(state, mesh)
    step = jit_data_parallel(make_train_step(model, tx), mesh)

    loader = Loader(ProcessShard(SynthSet()), local_batch_size(GLOBAL_BATCH),
                    shuffle=False, num_workers=0, pad_to=T)
    losses = []
    for batch in device_prefetch(iter(loader), mesh=mesh):
        state, metrics = step(state, batch, jax.random.key(1))
        losses.append(float(metrics["loss"]))

    print("LOSSES=" + ",".join(f"{v:.6f}" for v in losses), flush=True)


if __name__ == "__main__":
    main()
