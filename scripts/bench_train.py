#!/usr/bin/env python
"""Training-step throughput benchmark.

Measures the jitted data-parallel train step (forward + multi-head loss +
backward + optimizer) on the flagship CNNRNNLarge at the reference training
shape (30 s chunks, configurable batch), amortized over chained dispatches.

    python scripts/bench_train.py --batch_size 16 --steps 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_mels", type=int, default=320)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    p.add_argument("--data_parallel", type=int, default=None)
    p.add_argument("--lstm_backend", type=str, default="auto",
                   choices=["auto", "scan", "pallas"])
    p.add_argument("--rng_impl", type=str, default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="dropout PRNG impl (rbg = hardware RNG path, cheaper "
                        "mask generation; mask stream differs, which dropout "
                        "does not care about)")
    args = p.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from music_transcription_tpu.config import AudioConfig, ModelConfig, TrainConfig
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from music_transcription_tpu.parallel.train_step import (
        init_train_state, jit_data_parallel, make_train_step,
    )
    from music_transcription_tpu.train.optim import make_optimizer

    lstm_backend = args.lstm_backend
    if lstm_backend == "auto":  # same policy as scripts/train_cnn.py
        lstm_backend = "pallas" if jax.devices()[0].platform != "cpu" else "scan"

    acfg = AudioConfig(n_mels=args.n_mels)
    t = acfg.mel_frames_per_chunk
    mcfg = ModelConfig(model_type="cnn_rnn_large", n_mels=args.n_mels,
                       compute_dtype="bfloat16", lstm_backend=lstm_backend)
    tcfg = TrainConfig(batch_size=args.batch_size)
    model = TranscriptionModel(mcfg)
    tx = make_optimizer(tcfg)

    n_dev = args.data_parallel or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    print(f"devices={n_dev} batch={args.batch_size} T={t}", file=sys.stderr)

    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=64))
    if mesh is not None:
        state = replicate(state, mesh)
        step = jit_data_parallel(make_train_step(model, tx), mesh)
    else:
        step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((args.batch_size, 1, args.n_mels, t)).astype(np.float32)
    roll = (rng.random((args.batch_size, 88, t)) > 0.95).astype(np.float32)
    lengths = np.full((args.batch_size,), t, np.int32)
    if mesh is not None:
        batch = tuple(shard_batch(a, mesh) for a in (mel, roll, lengths))
    else:
        batch = (jnp.asarray(mel), jnp.asarray(roll), jnp.asarray(lengths))
    key = jax.random.key(1, impl=args.rng_impl)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    _ = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, key)
    _ = float(metrics["loss"])  # fence
    dt = (time.perf_counter() - t0) / args.steps
    chunks_per_s = args.batch_size / dt
    audio_s_per_s = chunks_per_s * acfg.chunk_length
    print(
        f"train step: {dt*1000:.1f} ms | {chunks_per_s:.1f} chunks/s | "
        f"{audio_s_per_s:.0f} audio-seconds/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
