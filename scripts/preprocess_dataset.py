#!/usr/bin/env python
"""Preprocess/cache CLI: MAESTRO -> per-chunk cache files.

Surface of reference scripts/preprocess_dataset.py:522-833: per-split caching
with skip-if-exists/--force, mutually-exclusive --mel/--waveform, --tokenize
(requires --waveform), auto cache-dir naming by data type and n_mels,
--dry_run preview, --show_cache_info, --verify integrity check, --background
respawn, disk-space warning.

TPU addition: with an accelerator attached, mel features are computed on
device in fixed-shape batches (exactly equal to the host path; see
data/preprocess.py).
"""

import argparse
import os
import shutil
import subprocess
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description="Preprocess and cache the MAESTRO dataset")
    p.add_argument("--root_dir", type=str, default="maestro-v3.0.0")
    p.add_argument("--cache_dir", type=str, default=None,
                   help="auto-named by data type / n_mels when omitted")
    p.add_argument("--splits", type=str, default="train,validation,test")
    p.add_argument("--chunk_length", type=float, default=30.0)
    p.add_argument("--overlap", type=float, default=0.0)
    p.add_argument("--n_mels", type=int, default=229)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--hop_length", type=int, default=512)
    g = p.add_mutually_exclusive_group()
    g.add_argument("--mel", action="store_true", help="cache mel spectrograms (default)")
    g.add_argument("--waveform", action="store_true", help="cache raw waveforms (AST)")
    p.add_argument("--tokenize", action="store_true",
                   help="pre-tokenize rolls to REMI tokens (requires --waveform)")
    p.add_argument("--token_len", type=int, default=512,
                   help="token cap for --tokenize caches (pad/truncate length; "
                        "dense 30s chunks need ~1024 to avoid truncation)")
    p.add_argument("--compact", action="store_true",
                   help="store waveforms as int16 at PCM16 scale and binary "
                        "rolls as uint8 (~2.2x smaller waveform caches; "
                        "exact for 16-bit-PCM sources, half-LSB error after "
                        "resampling). Readers dequantize transparently")
    p.add_argument("--force", action="store_true", help="recompute existing chunks")
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    p.add_argument("--device_batch", type=int, default=32)
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--show_cache_info", action="store_true")
    p.add_argument("--verify", action="store_true", help="verify cache integrity after run")
    p.add_argument("--background", action="store_true")
    p.add_argument("--log_file", type=str, default=None,
                   help="custom log file path (only with --background; "
                        "ref preprocess_dataset.py:630)")
    return p


def show_cache_info(cache_dir):
    from music_transcription_tpu.data.cache import load_metadata, metadata_path

    print("=" * 70)
    print(f"CACHE INFO: {cache_dir}")
    print("=" * 70)
    found = False
    for split in ("train", "validation", "test"):
        if not os.path.exists(metadata_path(cache_dir, split)):
            continue
        found = True
        meta = load_metadata(cache_dir, split)
        split_dir = os.path.join(cache_dir, split)
        n_files = (
            len([f for f in os.listdir(split_dir) if f.startswith("chunk_")])
            if os.path.isdir(split_dir)
            else 0
        )
        size = 0
        if os.path.isdir(split_dir):
            for f in os.scandir(split_dir):
                size += f.stat().st_size
        kind = "tokens" if meta.get("tokenize") else (
            "waveform" if meta.get("return_waveform") else f"mel (n_mels={meta.get('n_mels')})")
        print(f"{split}: {meta['num_chunks']} chunks ({n_files} files, "
              f"{size/1e9:.2f} GB), {meta.get('chunk_length')}s chunks, "
              f"overlap={meta.get('overlap')}, type={kind}")
    if not found:
        print("(no cache metadata found)")


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.tokenize and not args.waveform:
        print("Error: --tokenize requires --waveform")
        return 1

    if args.cache_dir is None:
        if args.tokenize:
            args.cache_dir = "cached_dataset_tokens"
        elif args.waveform:
            args.cache_dir = "cached_dataset_waveform"
        elif args.n_mels == 229:
            args.cache_dir = "cached_dataset"
        else:
            args.cache_dir = f"cached_dataset_mels{args.n_mels}"

    if args.show_cache_info:
        show_cache_info(args.cache_dir)
        return 0

    splits = [s.strip() for s in args.splits.split(",")]
    for s in splits:
        if s not in ("train", "validation", "test"):
            print(f"Error: Invalid split '{s}'. Must be one of: train, validation, test")
            return 1

    if not os.path.isdir(args.root_dir):
        print(f"Error: dataset root not found: {args.root_dir}")
        return 1

    if args.dry_run:
        print("=" * 70)
        print("PREPROCESSING - DRY RUN")
        print("=" * 70)
        print(f"Root:        {args.root_dir}")
        print(f"Cache dir:   {args.cache_dir}")
        print(f"Splits:      {', '.join(splits)}")
        print(f"Chunks:      {args.chunk_length}s, overlap={args.overlap}")
        kind = "waveform+tokens" if args.tokenize else ("waveform" if args.waveform else "mel")
        print(f"Data type:   {kind}" + ("" if args.waveform else f" (n_mels={args.n_mels})"))
        print(f"Workers:     {args.num_workers}")
        print("This is a DRY RUN - nothing will be written.")
        return 0

    # Disk-space warning (reference :339-352)
    free_gb = shutil.disk_usage(os.path.dirname(os.path.abspath(args.cache_dir)) or ".").free / 1e9
    if free_gb < 40 and not args.waveform:
        print(f"Warning: only {free_gb:.0f} GB free; a full n_mels={args.n_mels} "
              f"mel cache needs tens of GB.")

    if args.background:
        os.makedirs(args.cache_dir, exist_ok=True)
        log_path = args.log_file or os.path.join(
            args.cache_dir, f"preprocess_{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}.log"
        )
        argv_bg = [a for a in sys.argv[1:] if a != "--background"]
        with open(log_path, "a") as log:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)] + argv_bg,
                stdout=log, stderr=subprocess.STDOUT, start_new_session=True,
            )
        print(f"Preprocessing started in background (pid {proc.pid}); logs: {log_path}")
        return 0

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.config import AudioConfig
    from music_transcription_tpu.data.cache import verify_cache
    from music_transcription_tpu.data.preprocess import preprocess_split

    audio_cfg = AudioConfig(
        sample_rate=args.sr, hop_length=args.hop_length, n_mels=args.n_mels,
        chunk_length=args.chunk_length,
    )
    use_device = None if args.device is None else (args.device == "tpu")

    for split in splits:
        print(f"Preprocessing split '{split}'...")
        preprocess_split(
            root_dir=args.root_dir, cache_dir=args.cache_dir, split=split,
            audio_cfg=audio_cfg, chunk_length=args.chunk_length, overlap=args.overlap,
            return_waveform=args.waveform, tokenize=args.tokenize, force=args.force,
            num_workers=args.num_workers, use_device=use_device,
            device_batch=args.device_batch, compact=args.compact,
            token_len=args.token_len,
        )
        if args.verify:
            ok, msg = verify_cache(args.cache_dir, split)
            print(f"[{split}] verify: {'OK' if ok else 'FAILED'} — {msg}")
            if not ok:
                return 1
    print(f"Done. Cache at {args.cache_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
