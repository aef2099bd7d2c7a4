#!/usr/bin/env python
"""Attention backend microbench: XLA vs Pallas flash, forward and fwd+bwd.

Times the large model's attention shape (8 heads, head_dim 192, combined
dim 1536) at several sequence lengths to locate the xla/pallas crossover
that backend="auto" uses. Chained dispatches, fenced by a device scalar
(CLAUDE.md timing discipline).

    python scripts/bench_attention.py [--t 938 2048 4096] [--batch 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, nargs="+", default=[938, 2048, 4096])
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head_dim", type=int, default=192)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chain", type=int, default=5)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.models.cnn_rnn import MultiHeadSelfAttention

    hidden = args.heads * args.head_dim
    print(f"[attn-bench] device={jax.devices()[0]} hidden={hidden} "
          f"heads={args.heads} b={args.batch}", file=sys.stderr)

    def timed(fn, *xs):
        # device-side repetition (fori_loop inside the jit): the remote
        # relay's ~28 ms per-dispatch RPC would otherwise floor the numbers
        fence = fn(*xs)
        _ = int(fence)  # compile + first run
        times = []
        for _i in range(args.iters):
            t0 = time.perf_counter()
            _ = int(fn(*xs))
            times.append((time.perf_counter() - t0) / args.chain)
        times.sort()
        return times[len(times) // 2] * 1e3

    for t in args.t:
        x = jnp.asarray(
            0.1 * np.random.default_rng(0).standard_normal((args.batch, t, hidden)),
            jnp.bfloat16,
        )
        for backend in ("xla", "pallas"):
            mod = MultiHeadSelfAttention(
                hidden_dim=hidden, num_heads=args.heads, dropout=0.0,
                dtype=jnp.bfloat16, backend=backend,
            )
            variables = mod.init(jax.random.key(0), x[:, :8], train=False)

            chain = args.chain

            @jax.jit
            def fwd(v, x):
                def body(_, xx):
                    return mod.apply(v, xx, train=False) * jnp.bfloat16(0.999)

                out = jax.lax.fori_loop(0, chain, body, x)
                return jnp.sum(out.astype(jnp.float32)).astype(jnp.int32)

            @jax.jit
            def fwdbwd(v, x):
                def one(xx):
                    return jax.grad(
                        lambda q: jnp.sum(mod.apply(v, q, train=True,
                                                    rngs={"dropout": jax.random.key(1)}
                                                    ).astype(jnp.float32))
                    )(xx)

                def body(_, xx):
                    return one(xx) * jnp.bfloat16(0.999)

                g = jax.lax.fori_loop(0, chain, body, x)
                return jnp.sum(g.astype(jnp.float32)).astype(jnp.int32)

            f_ms = timed(fwd, variables, x)
            fb_ms = timed(fwdbwd, variables, x)
            print(f"T={t:5d} {backend:6s} fwd={f_ms:8.2f}ms fwd+bwd={fb_ms:8.2f}ms")


if __name__ == "__main__":
    main()
