#!/usr/bin/env python
"""Inference CLI: transcribe an audio file to MIDI.

Drop-in surface of the reference CLI (reference main.py:290-363):

    python main.py song.wav checkpoint [-o out.mid] [-t 0.5] [-d tpu|cpu]

``checkpoint`` is either a native orbax checkpoint directory (carries its
model/audio config) or a reference-format ``.pth`` state_dict (converted on
load; reads an ``X.json`` config sidecar beside ``X.pth`` when present,
else assumes the shipped cnn_rnn_large/n_mels=320 configuration, reference
main.py:16-24).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(
        description="Transcribe audio files to MIDI using a trained transcription model"
    )
    parser.add_argument("audio_file", type=str, help="Path to input audio file (wav)")
    parser.add_argument(
        "model_file", type=str, help="Path to model checkpoint (.pth or orbax dir)"
    )
    parser.add_argument("-o", "--output", type=str, default=None, help="Output MIDI path")
    parser.add_argument(
        "-d",
        "--device",
        type=str,
        choices=["cpu", "tpu"],
        default=None,
        help="Platform to run on (default: auto-detect)",
    )
    parser.add_argument(
        "-t", "--threshold", type=float, default=0.5, help="Note prediction threshold"
    )
    parser.add_argument(
        "-w", "--window", type=float, default=None,
        help="Inference window in seconds (default: the checkpoint's chunk "
             "length, 30 s). Long windows (e.g. 120) run as one jitted "
             "program with flash attention. Measured (DESIGN.md): frame/"
             "onset F1 match the chunked path — the win is seam removal "
             "(no chunk boundaries bisecting sustained notes), at ~T/30x "
             "the per-audio-second cost. Use for seam-sensitive output, "
             "not for quality.",
    )
    parser.add_argument(
        "--overlap", type=float, default=0.0,
        help="Chunk overlap in seconds (e.g. 4). Chunks are run overlapped "
             "and each output frame is taken from a window where it sits in "
             "the interior — removing chunk-seam artifacts at ~chunk/"
             "(chunk-overlap)x cost (cheaper than --window for the same "
             "effect). 0 = reference-exact non-overlapping chunks.",
    )
    parser.add_argument(
        "--beam", type=int, default=1,
        help="AST checkpoints only: beam size for token decoding "
             "(default 1 = greedy). Vectorized beam search with length "
             "normalization; composes with --constrained. Measured sign is "
             "checkpoint-dependent (beam-4+grammar won +5-22%% relative at "
             "the round-5 checkpoints, lost -12%% at the round-4 one; "
             "DESIGN.md 'AST decoding') - worth measuring on yours.",
    )
    parser.add_argument(
        "--constrained", action="store_true",
        help="AST checkpoints only: grammar-constrained token decoding "
             "(the tokenizer's transition mask vetoes illegal successors, "
             "e.g. REMI NOTE_ON must be followed by VELOCITY). Counters "
             "free-running drift; no effect on CNN-RNN checkpoints "
             "(rejected with an error).",
    )
    args = parser.parse_args()
    if args.overlap and args.window:
        print("Error: --overlap and --window are alternative seam "
              "strategies; pass one.")
        sys.exit(1)

    if args.device:
        os.environ["JAX_PLATFORMS"] = {"tpu": "axon,tpu,cpu", "cpu": "cpu"}[args.device]

    if not os.path.exists(args.audio_file):
        print(f"Error: Audio file not found: {args.audio_file}")
        sys.exit(1)
    if not os.path.exists(args.model_file):
        print(f"Error: Model file not found: {args.model_file}")
        sys.exit(1)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.transcribe import transcribe_audio

    print("=" * 60)
    print("Music Transcription Pipeline (TPU-native)")
    print("=" * 60)
    print(f"Devices: {jax.devices()}")

    try:
        output_path = transcribe_audio(
            args.audio_file, args.model_file, args.output,
            threshold=args.threshold, window=args.window,
            overlap=args.overlap, constrained=args.constrained,
            beam=args.beam,
        )
        print("=" * 60)
        print("Transcription completed successfully!")
        print(f"Output: {output_path}")
        print("=" * 60)
    except Exception as e:
        print(f"Error during transcription: {e}")
        import traceback

        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
