#!/usr/bin/env python
"""Train-step component breakdown + analytic roofline.

Times fwd+bwd of each stage of the 89M CNNRNNLarge separately (conv stack,
LSTM projections+recurrence, attention, heads) at the training shape, and
prints the analytic MXU FLOP count per stage so the gap to the hardware
roofline is attributable. Device-side fori_loop repetition (the remote
relay's ~28 ms per-dispatch RPC would floor per-stage numbers).

    python scripts/bench_components.py --batch_size 16
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
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    p.add_argument("--lstm_backend", type=str, default="pallas",
                   choices=["scan", "pallas"])
    args = p.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from music_transcription_tpu.config import AudioConfig
    from music_transcription_tpu.models import cnn_rnn as M

    acfg = AudioConfig(n_mels=args.n_mels)
    B, T, mels = args.batch_size, acfg.mel_frames_per_chunk, args.n_mels
    H, layers = 512, 3
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def timed(fn, *xs):
        # host-chained dispatches, fenced once (bench.py discipline): the
        # dispatch RPC pipelines under device time for these >=30 ms stages
        jfn = jax.jit(fn)
        _ = int(jfn(*xs))
        times = []
        for _i in range(args.iters):
            t0 = time.perf_counter()
            fences = [jfn(*xs) for _ in range(args.chain)]
            _ = [int(f) for f in fences]
            times.append((time.perf_counter() - t0) / args.chain)
        times.sort()
        return times[len(times) // 2] * 1e3

    def fwdbwd_loop(mod, x):
        # params passed as arguments (a closure would bake them into the
        # HLO as constants -- the 160 MB l0 projection blows the remote
        # relay's request size limit)
        v = mod.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                     x[:1], train=True)

        def fn(v, x0):
            def loss(q):
                out, _ = mod.apply(v, q, train=True,
                                   rngs={"dropout": jax.random.key(1)},
                                   mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))

            g = jax.grad(loss)(x0)
            return jnp.sum(g.astype(jnp.float32)).astype(jnp.int32)

        return fn, v

    results = {}

    # 1) conv stack (conv1 + res1 + pool + res2 + freq conv), as in the model
    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            x = M.ConvBNRelu(32, dtype=dt, name="conv1")(x, train)
            x = M._maxpool_freq(x)
            x = M.ResidualBlock(64, dtype=dt, name="res_block1")(x, train)
            x = M._maxpool_freq(x)
            x = M.ResidualBlock(128, dtype=dt, name="res_block2")(x, train)
            x = M.ConvBNRelu(256, kernel=(7, 3), dtype=dt, name="freq_aware_conv")(x, train)
            x = M._maxpool_freq(x)
            return x

    mel = jnp.asarray(rng.standard_normal((B, mels, T, 1)), dt)  # NHWC
    fn, v = fwdbwd_loop(ConvStack(), mel)
    results["conv_stack"] = timed(fn, v, mel)

    # 2) LSTM tier: xw projections + recurrences, main (3 layers) + local
    feat = jnp.asarray(rng.standard_normal((B, T, 256 * (mels // 8))), dt)

    class LstmTier(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            main = M.BiLSTMStack(x.shape[-1], H, layers, dropout=0.0, proj_dtype=dt,
                                 backend=args.lstm_backend, name="rnn_main")(x, train)
            local = M.BiLSTMStack(x.shape[-1], H // 2, 1, dropout=0.0, proj_dtype=dt,
                                  backend=args.lstm_backend, name="rnn_local")(x, train)
            return jnp.concatenate([main, local], axis=-1)

    fn, v = fwdbwd_loop(LstmTier(), feat)
    results["lstm_tier"] = timed(fn, v, feat)

    # 3) attention block (xla backend, as trained)
    comb = jnp.asarray(rng.standard_normal((B, T, 2 * H + H)), dt)
    attn = M.MultiHeadSelfAttention(hidden_dim=comb.shape[-1], num_heads=8,
                                    dropout=0.0, dtype=dt, backend="xla")
    fn, v = fwdbwd_loop(attn, comb)
    results["attention"] = timed(fn, v, comb)

    # ------------------------------------------------------------- roofline
    def conv_macs(cout, hw, k, cin):
        return B * cout * hw * k * cin

    hw1, hw2, hw3 = (mels // 2) * T, (mels // 4) * T, (mels // 8) * T
    lstm_in = 256 * (mels // 8)
    macs = {
        "conv_stack": (
            conv_macs(32, mels * T, 9, 1)
            + conv_macs(64, hw1, 9, 32) + conv_macs(64, hw1, 9, 64) + conv_macs(64, hw1, 1, 32)
            + conv_macs(128, hw2, 9, 64) + conv_macs(128, hw2, 9, 128) + conv_macs(128, hw2, 1, 64)
            + conv_macs(256, hw2, 21, 128)
        ),
        "lstm_tier": (
            B * T * lstm_in * 4 * H * 2            # main l1 xw (both dirs)
            + 2 * (B * T * 2 * H * 4 * H * 2)      # main l2, l3 xw
            + 3 * (T * 2 * B * H * 4 * H)          # main recurrences
            + B * T * lstm_in * 4 * (H // 2) * 2   # local xw
            + T * 2 * B * (H // 2) * 4 * (H // 2)  # local recurrence
        ),
        "attention": (
            B * T * 1536 * 3 * 1536 + 2 * B * 8 * T * T * 192 + B * T * 1536 * 1536
        ),
    }

    print(f"\nB={B} T={T} n_mels={mels} lstm={args.lstm_backend} "
          f"device={jax.devices()[0]}")
    total_ms, total_tflop = 0.0, 0.0
    for name, ms in results.items():
        tflop = 3 * 2 * macs[name] / 1e12  # fwd+bwd ~ 3x fwd
        eff = tflop / (ms / 1e3)
        total_ms += ms
        total_tflop += tflop
        print(f"{name:12s} fwd+bwd {ms:7.1f} ms | {tflop:6.2f} TFLOP | "
              f"{eff:6.1f} TFLOP/s achieved")
    print(f"{'SUM':12s}         {total_ms:7.1f} ms | {total_tflop:6.2f} TFLOP")
    print("(v5e bf16 peak ~197 TFLOP/s; fp32 recurrence runs below peak)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
