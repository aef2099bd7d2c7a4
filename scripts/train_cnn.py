#!/usr/bin/env python
"""Training CLI for the CNN-RNN transcription models.

Surface of reference scripts/train_cnn.py:64-363: dataset/training/model/
execution argument groups, hybrid cache-or-raw datasets, cache n_mels
validation, run directory with checkpoints + logs + loss curves, resume,
background self-respawn.

    python scripts/train_cnn.py --root_dir maestro-v3.0.0 --cache_dir cached \
        --model_type cnn_rnn_large --n_mels 320 --epochs 100 --batch_size 24
"""

import argparse
import os
import subprocess
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description="Train a transcription model (TPU-native)")
    d = p.add_argument_group("dataset")
    d.add_argument("--root_dir", type=str, default="maestro-v3.0.0")
    d.add_argument("--cache_dir", "--cached_dir", type=str, default=None,
                   help="preprocessed cache directory (auto-detected name if "
                        "omitted; --cached_dir is the reference spelling)")
    d.add_argument("--year", type=str, default=None)
    d.add_argument("--subset_size", type=int, default=None, help="Quick debug run")

    t = p.add_argument_group("training")
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--batch_size", type=int, default=24)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--weight_decay", type=float, default=1e-5)
    t.add_argument("--chunk_length", type=float, default=30.0)
    t.add_argument("--chunk_overlap", type=float, default=0.0)
    t.add_argument("--save_every", type=int, default=5)
    t.add_argument("--save_best_every", type=int, default=1,
                   help="write model_best at most every k epochs on val "
                        "improvement (k>1 amortizes slow device->host "
                        "checkpoint transfer; lag bounded at k-1 epochs)")
    t.add_argument("--early_stop_patience", type=int, default=0,
                   help="stop when val loss has not improved for N epochs "
                        "(0 = run all --epochs; model_best is exact either "
                        "way)")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--num_workers", type=int, default=8)
    t.add_argument("--start_epoch", type=int, default=1,
                   help="starting epoch number (auto-detected from the "
                        "--resume filename when left at 1)")

    m = p.add_argument_group("model")
    m.add_argument("--model_type", "--model", type=str, default="cnn_rnn_large",
                   choices=["cnn_rnn", "cnn_rnn_large"])
    m.add_argument("--n_mels", type=int, default=320)
    m.add_argument("--hidden_size", type=int, default=512)
    m.add_argument("--num_layers", type=int, default=3)
    m.add_argument("--dropout", type=float, default=0.2)
    m.add_argument("--no_attention", action="store_true")
    m.add_argument("--no_onset_offset_heads", action="store_true")
    # reference-parity no-ops (both are on by default; ref train_cnn.py:110-113)
    m.add_argument("--use_attention", action="store_true", default=True,
                   help=argparse.SUPPRESS)
    m.add_argument("--use_onset_offset_heads", action="store_true", default=True,
                   help=argparse.SUPPRESS)
    m.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    m.add_argument("--lstm_backend", type=str, default="auto",
                   choices=["auto", "scan", "pallas"],
                   help="auto = fused Pallas kernels on single-device TPU "
                        "(measured 24%% faster steps), scan when sharded/CPU")

    e = p.add_argument_group("execution")
    e.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    e.add_argument("--data_parallel", type=int, default=None,
                   help="number of data-parallel devices (default: all)")
    e.add_argument("--partitioning", type=str, default="dp",
                   choices=["dp", "zero1", "fsdp", "tp"],
                   help="train-state placement: dp = replicated, zero1 = "
                        "optimizer state sharded, fsdp = params + optimizer "
                        "state sharded largest-axis (for models that exceed "
                        "one chip), tp = column-parallel feature-axis "
                        "sharding (tensor parallelism: activations partition "
                        "over the model axis)")
    e.add_argument("--model_parallel", type=int, default=1,
                   help=">1 builds a 2-D (data, model) mesh; zero1/fsdp "
                        "state shards over the model axis")
    e.add_argument("--resume", type=str, default=None, help="checkpoint to resume from")
    e.add_argument("--run_dir", type=str, default=None)
    e.add_argument("--out_root", type=str, default="outputs")
    e.add_argument("--background", action="store_true",
                   help="re-spawn detached with logs redirected")
    e.add_argument("--log_file", type=str, default=None,
                   help="log file path for background mode "
                        "(auto-generated if not specified)")
    e.add_argument("--profile_steps", type=int, default=0,
                   help="trace the first N train steps with jax.profiler")
    e.add_argument("--rng_impl", type=str, default="auto",
                   choices=["auto", "threefry2x32", "rbg"],
                   help="dropout PRNG: auto = rbg on TPU (cheaper mask "
                        "generation, ~3%% step), threefry on CPU")
    e.add_argument("--stall_timeout", "--stall-timeout", type=float, default=0.0,
                   help="abort (exit 66) when no train/val step completes "
                        "for this many seconds — the tunneled backend can "
                        "wedge an RPC permanently and a wedged process "
                        "cannot flush its best state; a supervisor then "
                        "resumes from the last --save_best_every flush. "
                        "0 = off; set above the worst first-step compile")
    e.add_argument("--device_data", "--device-data", type=str, default="auto",
                   choices=["auto", "on", "off", "slab"],
                   help="stage the dataset in device HBM once and gather "
                        "batches on device (zero per-step H2D; bounds the "
                        "axon client's per-transfer host retention). auto = "
                        "single-chip TPU runs whose data fits, slab rotation "
                        "when it doesn't; 'slab' forces rotation")
    e.add_argument("--slab_gb", "--slab-gb", type=float, default=3.5,
                   help="HBM budget per slab for slab-rotation feeding "
                        "(double-buffered: peak data HBM = 2 slabs). Used "
                        "when the cache outgrows whole-cache staging")
    e.add_argument("--slab_passes", "--slab-passes", type=int, default=1,
                   help="passes over each staged slab before rotating (>1 "
                        "amortizes slow-link staging at a sampling-"
                        "correlation cost)")
    e.add_argument("--rss_watermark_gb", "--rss-watermark-gb", type=float,
                   default=0.0,
                   help="planned process recycle: checkpoint + exit 67 when "
                        "host RSS crosses this at an epoch boundary (the "
                        "tunneled client retains H2D payloads; a supervisor "
                        "loop with --resume auto makes multi-hour runs "
                        "bounded-memory). 0 = off")
    return p


def spawn_background(args, run_dir):
    """Detached self-respawn (reference scripts/train_cnn.py:123-154)."""
    os.makedirs(run_dir, exist_ok=True)
    log_path = args.log_file or os.path.join(run_dir, "train.log")
    argv = [a for a in sys.argv[1:] if a != "--background"]
    argv += ["--run_dir", run_dir]
    with open(log_path, "a") as log:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + argv,
            stdout=log, stderr=subprocess.STDOUT, start_new_session=True,
        )
    print(f"Training started in background (pid {proc.pid})")
    print(f"Logs: {log_path}")
    print(f"Check: ps aux | grep {proc.pid}")


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.run_dir is None:
        timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        args.run_dir = os.path.join(args.out_root, timestamp)
    if args.background:
        spawn_background(args, args.run_dir)
        return 0

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.train.loop import install_graceful_sigterm

    install_graceful_sigterm()  # `kill <pid>` flushes model_best like Ctrl-C

    from music_transcription_tpu.parallel.distributed import (
        ProcessShard,
        local_batch_size,
        maybe_initialize_distributed,
    )

    # Multi-host (pod) support: must run before first device use. No-op on
    # single-host; on a pod each host then loads only its ProcessShard slice.
    multihost = maybe_initialize_distributed()

    from music_transcription_tpu.config import (
        AudioConfig, CompatibilityError, ModelConfig, TrainConfig, validate_compatibility,
    )
    from music_transcription_tpu.data.cache import HybridMaestroDataset, load_metadata, metadata_path
    from music_transcription_tpu.data.pipeline import Loader
    from music_transcription_tpu.train.checkpoints import epoch_from_checkpoint_name
    from music_transcription_tpu.train.loop import train_model

    lstm_backend = args.lstm_backend
    if lstm_backend == "auto":
        # fused kernels on any TPU topology (multi-device training runs the
        # explicit-SPMD shard_map step); scan on CPU — and scan under
        # zero1/fsdp, whose sharded state needs the compiler-partitioned path.
        lstm_backend = (
            "pallas"
            if jax.devices()[0].platform != "cpu" and args.partitioning == "dp"
            else "scan"
        )

    audio_cfg = AudioConfig(n_mels=args.n_mels, chunk_length=args.chunk_length)
    model_cfg = ModelConfig(
        model_type=args.model_type,
        n_mels=args.n_mels,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        dropout=args.dropout,
        use_attention=not args.no_attention,
        use_onset_offset_heads=not args.no_onset_offset_heads,
        compute_dtype=args.compute_dtype,
        lstm_backend=lstm_backend,
    )
    train_cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        chunk_length=args.chunk_length,
        chunk_overlap=args.chunk_overlap,
        save_every=args.save_every,
        save_best_every=args.save_best_every,
        early_stop_patience=args.early_stop_patience,
        seed=args.seed,
        data_parallel=args.data_parallel,
        partitioning=args.partitioning,
        model_parallel=args.model_parallel,
        rng_impl=args.rng_impl,
        stall_timeout_s=args.stall_timeout,
        rss_watermark_gb=args.rss_watermark_gb,
        num_workers=args.num_workers,
    )

    if args.cache_dir is None:
        auto = "cached_dataset" if args.n_mels == 229 else f"cached_dataset_mels{args.n_mels}"
        args.cache_dir = auto

    # Cache/model n_mels validation (reference scripts/train_cnn.py:208-225)
    if os.path.exists(metadata_path(args.cache_dir, "train")):
        meta = load_metadata(args.cache_dir, "train")
        try:
            for w in validate_compatibility(
                model_n_mels=args.n_mels, cache_meta=meta, audio=audio_cfg
            ):
                print(f"Warning: {w}")
        except CompatibilityError as exc:
            print(f"Error: {exc}")
            return 1

    common = dict(
        root_dir=args.root_dir, cache_dir=args.cache_dir,
        chunk_length=args.chunk_length, audio_cfg=audio_cfg,
        year=args.year, subset_size=args.subset_size,
    )
    train_set = HybridMaestroDataset(split="train", overlap=args.chunk_overlap, **common)
    val_set = HybridMaestroDataset(split="validation", overlap=0.0, **common)
    print(f"Train set size: {len(train_set)} chunks")
    print(f"Validation set size: {len(val_set)} chunks")

    loader_batch = args.batch_size  # global batch; each host loads its share
    if multihost:
        train_set = ProcessShard(train_set)
        val_set = ProcessShard(val_set)
        loader_batch = local_batch_size(args.batch_size)

    pad_to = audio_cfg.mel_frames_per_chunk  # fixed-shape batches: one compile
    # Transfer-once feeding (pipeline.DeviceStagedLoader): when the dataset
    # fits in HBM on a single chip, stage it once and gather batches on
    # device — zero per-step H2D traffic, and it bounds the axon client's
    # per-transfer host retention (measured: streamed feeding grows host RSS
    # by ~1 batch/step and OOMs multi-hour runs).
    # Compact staging under bf16 compute: mel stages as bfloat16 (the first
    # conv performs the identical round-to-nearest cast, so training numerics
    # are unchanged) and the binary roll as uint8 (exact) — ~43% of fp32
    # bytes, so caches up to ~25 GB fp32 stage whole on a 16 GB chip.
    compact_staged = args.compute_dtype == "bfloat16"
    per_frame = (args.n_mels * 2 + 88 * 1) if compact_staged \
        else 4 * (args.n_mels + 88)
    est_bytes = (len(train_set) + len(val_set)) * pad_to * per_frame
    staged_kw = dict(bf16_fields=(0,), u8_fields=(1,)) if compact_staged else {}
    single_chip = (jax.devices()[0].platform != "cpu"
                   and len(jax.devices()) == 1 and not multihost)
    use_staged = (args.device_data == "on"
                  or (args.device_data == "auto" and single_chip
                      and est_bytes < 11e9))
    # Caches that outgrow HBM: slab rotation (bounded-HBM, bounded-RSS-per-
    # rotation transfer-once feeding) — the MAESTRO-scale input path. auto
    # falls through to it on single-chip TPU; 'slab' forces it anywhere.
    use_slab = (not use_staged
                and (args.device_data == "slab"
                     or (args.device_data == "auto" and single_chip)))
    if use_staged:
        from music_transcription_tpu.data.pipeline import DeviceStagedLoader

        train_loader = DeviceStagedLoader(
            train_set, loader_batch, shuffle=True, seed=args.seed,
            num_workers=args.num_workers, drop_last=True, pad_to=pad_to,
            verbose=True, **staged_kw,
        )
        val_loader = DeviceStagedLoader(
            val_set, loader_batch, num_workers=max(1, args.num_workers // 2),
            pad_to=pad_to, pad_last_batch=True, verbose=True, **staged_kw,
        )
    elif use_slab:
        from music_transcription_tpu.data.pipeline import (
            DeviceStagedLoader,
            SlabRotatingLoader,
        )

        train_loader = SlabRotatingLoader(
            train_set, loader_batch, shuffle=True, seed=args.seed,
            num_workers=args.num_workers, pad_to=pad_to,
            slab_bytes=args.slab_gb * 1e9, passes_per_slab=args.slab_passes,
            verbose=True, **staged_kw,
        )
        # validation is small next to the train split; stage it whole
        val_loader = DeviceStagedLoader(
            val_set, loader_batch, num_workers=max(1, args.num_workers // 2),
            pad_to=pad_to, pad_last_batch=True, verbose=True, **staged_kw,
        )
    else:
        train_loader = Loader(
            train_set, loader_batch, shuffle=True, seed=args.seed,
            num_workers=args.num_workers, drop_last=True, pad_to=pad_to,
        )
        # Validation keeps the tail batch (the reference's val loader does
        # not drop_last): it pads to the full batch size with lengths==0
        # rows, which the masked loss excludes exactly — same static shape,
        # every sample seen.
        val_loader = Loader(
            val_set, loader_batch, num_workers=max(1, args.num_workers // 2),
            pad_to=pad_to, pad_last_batch=True,
        )
    if len(val_loader) == 0:
        val_loader = None

    if args.resume == "auto":
        # supervisor-friendly: newest full checkpoint in this run dir, or a
        # fresh start when there is none yet. Composes with exit 66 (stall)
        # and exit 67 (planned RSS recycle):
        #   until python scripts/train_cnn.py --run_dir D --resume auto ...;
        #   do :; done
        from music_transcription_tpu.train.checkpoints import (
            latest_resumable_checkpoint,
        )

        args.resume = latest_resumable_checkpoint(args.run_dir)
        print(f"--resume auto -> {args.resume or 'fresh start'}")

    start_epoch = args.start_epoch
    if args.resume and args.start_epoch == 1:
        # auto-detect only when the user didn't pass --start_epoch
        # (reference scripts/train_cnn.py:293-305)
        parsed = epoch_from_checkpoint_name(args.resume)
        if parsed is not None:
            start_epoch = parsed + 1
            print(f"Resuming from epoch {parsed}; starting at {start_epoch}")

    from music_transcription_tpu.train.loop import HostMemoryRecycle
    from music_transcription_tpu.train.watchdog import RECYCLE_EXIT_CODE

    try:
        train_model(
            model_cfg=model_cfg,
            train_cfg=train_cfg,
            audio_cfg=audio_cfg,
            train_loader=train_loader,
            val_loader=val_loader,
            run_dir=args.run_dir,
            resume_from=args.resume,
            start_epoch=start_epoch,
            profile_steps=args.profile_steps,
        )
    except HostMemoryRecycle as r:
        print(f"\nRecycle requested: {r}")
        return RECYCLE_EXIT_CODE
    print(f"\nTraining complete. Artifacts in {args.run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
