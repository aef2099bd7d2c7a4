#!/usr/bin/env python
"""Serving daemon: transcribe recordings continuously with a resident model.

Production-serving counterpart of the one-shot main.py CLI (capability beyond
the reference): the model loads and compiles once, then either

  * watch mode — poll a directory for new audio files, write MIDI next to
    them (or into --out_dir), move failures aside:

        python scripts/serve.py --model ckpt --watch_dir incoming/ \
            --out_dir done/ [--poll 2.0] [--once]

  * stdin mode — read audio paths on stdin (one per line), print the output
    MIDI path per line (scriptable backend for a queue worker):

        find . -name '*.wav' | python scripts/serve.py --model ckpt --stdin

Shape-stable by construction (30 s chunk batches, power-of-two chunk-count
buckets), so steady-state latency is the bench.py number, not a recompile.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_EXTS = (".wav", ".mp3", ".flac", ".ogg")


def build_parser():
    p = argparse.ArgumentParser(description="Resident transcription server")
    p.add_argument("--model", type=str, required=True, help="checkpoint (.pth or orbax dir)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--watch_dir", type=str, help="poll this directory for audio files")
    mode.add_argument("--stdin", action="store_true", help="read audio paths from stdin")
    p.add_argument("--out_dir", type=str, default=None,
                   help="where MIDI goes (default: next to the input)")
    p.add_argument("--poll", type=float, default=2.0, help="watch-mode poll interval (s)")
    p.add_argument("--overlap", type=float, default=0.0,
                   help="chunk overlap in seconds (stitched interior-keep "
                        "inference, see main.py --overlap)")
    p.add_argument("--constrained", action="store_true",
                   help="AST checkpoints only: grammar-constrained token "
                        "decoding (see main.py --constrained)")
    p.add_argument("--beam", type=int, default=1,
                   help="AST checkpoints only: beam size for token "
                        "decoding (see main.py --beam)")
    p.add_argument("--once", action="store_true",
                   help="watch mode: process what's there now, then exit")
    return p


def _out_path(audio_path, out_dir):
    stem = os.path.splitext(os.path.basename(str(audio_path)))[0]
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        return os.path.join(out_dir, stem + ".mid")
    return os.path.splitext(str(audio_path))[0] + ".mid"


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.transcribe import Transcriber

    print(f"Loading model from {args.model} (devices: {jax.devices()})...", flush=True)
    server = Transcriber(args.model, threshold=args.threshold,
                         overlap=args.overlap, constrained=args.constrained,
                         beam=args.beam)

    def handle(path) -> str | None:
        t0 = time.perf_counter()
        try:
            out = server.transcribe_file(path, _out_path(path, args.out_dir))
        except Exception as e:  # keep serving on per-file failures
            print(f"ERROR {path}: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
            return None
        dt = time.perf_counter() - t0
        print(f"{path} -> {out} ({dt:.2f}s)", flush=True)
        return out

    if args.stdin:
        failed = 0
        for line in sys.stdin:
            path = line.strip()
            if path and handle(path) is None:
                failed += 1
        return 1 if failed else 0

    # watch mode
    done: set[str] = set()
    print(f"Watching {args.watch_dir} (poll every {args.poll}s)...", flush=True)
    while True:
        try:
            names = sorted(os.listdir(args.watch_dir))
        except FileNotFoundError:
            print(f"Error: watch dir {args.watch_dir} does not exist", file=sys.stderr)
            return 1
        for name in names:
            path = os.path.join(args.watch_dir, name)
            if path in done or not name.lower().endswith(AUDIO_EXTS):
                continue
            out = _out_path(path, args.out_dir)
            if os.path.exists(out):
                done.add(path)
                continue
            handle(path)
            done.add(path)
        if args.once:
            return 0
        time.sleep(args.poll)


if __name__ == "__main__":
    sys.exit(main())
