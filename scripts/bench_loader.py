#!/usr/bin/env python
"""Host input-pipeline throughput benchmark (SURVEY §7 step 6).

Measures what the training loop *consumes*: ``Loader`` (threaded item decode
+ collate) feeding ``device_prefetch`` (host->device transfer, sharded over a
mesh when present), in chunks/s. Compare against step demand:

  demand = batch_size / train_step_seconds * n_chips
  (flagship: 16 / 0.219 s = 73 chunks/s per chip -> 584 chunks/s for a v5e-8)

Two source paths, matching what training actually reads:

  * cache:  preprocessed npz/pt chunks (CachedDataset / Hybrid fallback) —
    the steady-state training path
  * raw:    WAV decode + resample + device-free mel on the fly
    (MaestroDataset) — the cold path

    python scripts/bench_loader.py --cache_dir _data/cache_v2_mels320 \\
        --batch_size 16 --batches 40
    python scripts/bench_loader.py --root_dir _data/synth_v2 --raw ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description="Input pipeline throughput")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--root_dir", type=str, default=None)
    p.add_argument("--raw", action="store_true",
                   help="force the raw WAV->mel path (ignore any cache)")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--passes", type=int, default=1,
                   help="epochs over the loader (small caches need >1 for "
                        "a stable rate)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--n_mels", type=int, default=320)
    p.add_argument("--chunk_length", type=float, default=30.0)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"],
                   help="cpu = host-side pipeline only; tpu = include the "
                        "device_put feed over the mesh")
    p.add_argument("--no_device", action="store_true",
                   help="measure Loader alone (no device_prefetch)")
    p.add_argument("--demand_step_ms", type=float, default=219.0,
                   help="train-step time used for the demand line")
    p.add_argument("--demand_chips", type=int, default=8)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: F401

    from music_transcription_tpu.config import AudioConfig
    from music_transcription_tpu.data.pipeline import Loader, device_prefetch

    acfg = AudioConfig(n_mels=args.n_mels, chunk_length=args.chunk_length)
    if args.cache_dir and not args.raw:
        from music_transcription_tpu.data.cache import CachedMaestroDataset

        ds = CachedMaestroDataset(args.cache_dir, split=args.split)
        source = "cache"
    else:
        if not args.root_dir:
            print("need --root_dir (raw) or --cache_dir", file=sys.stderr)
            return 2
        from music_transcription_tpu.data.maestro import MaestroDataset

        ds = MaestroDataset(args.root_dir, split=args.split,
                            chunk_length=args.chunk_length, audio_cfg=acfg)
        source = "raw"

    pad_to = acfg.mel_frames_per_chunk
    loader = Loader(ds, args.batch_size, shuffle=True, seed=0,
                    num_workers=args.num_workers, drop_last=True, pad_to=pad_to)
    n_batches = min(args.batches, len(loader))
    if n_batches < 2:
        print(f"dataset too small: {len(ds)} items", file=sys.stderr)
        return 2

    mesh = None
    if not args.no_device and len(jax.devices()) > 1:
        from music_transcription_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    def epoch_iter():
        it = iter(loader)
        if args.no_device:
            return it
        return device_prefetch(it, mesh=mesh, depth=2)

    # warm one batch (thread-pool spinup, file cache, device alloc)
    for batch in epoch_iter():
        jax.block_until_ready(batch) if not args.no_device else None
        break

    t0 = time.perf_counter()
    n = 0
    last = None
    for _ in range(args.passes):
        got = 0
        for batch in epoch_iter():
            last = batch
            n += 1
            got += 1
            if got >= n_batches:
                break
    if not args.no_device and last is not None:
        jax.block_until_ready(last)
    dt = time.perf_counter() - t0

    chunks_per_s = n * args.batch_size / dt
    audio_s_per_s = chunks_per_s * acfg.chunk_length
    demand = args.batch_size / (args.demand_step_ms / 1000.0)
    result = {
        "metric": "loader_throughput",
        "source": source,
        "value": round(chunks_per_s, 1),
        "unit": "chunks/s",
        "audio_s_per_s": round(audio_s_per_s, 0),
        "batches": n,
        "batch_size": args.batch_size,
        "num_workers": args.num_workers,
        "device_feed": not args.no_device,
        "demand_1chip": round(demand, 1),
        "demand_8chip": round(demand * args.demand_chips, 1),
        "headroom_vs_8chip": round(chunks_per_s / (demand * args.demand_chips), 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
