#!/usr/bin/env python
"""Evaluation CLI: framewise F1 over a split, with threshold tuning.

Surface of reference scripts/evaluate.py:762-1071: cache/raw auto-detection,
model-config autodetect from checkpoint/cache metadata, normal mode (summary
txt + per-sample MIDIs + confusion matrix PNG), --headless (prints exactly
``EVAL_MEAN_F1=<v>``), coarse-to-fine --tune_threshold, --dry_run,
--show_results, --verify_compatibility, --background.

TPU improvement over the reference: probabilities are computed once in
device batches; every threshold in the tuning sweep reuses them
(the reference recomputes the full forward per candidate,
scripts/evaluate.py:524-553).
"""

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate a transcription model (framewise F1)")
    p.add_argument("--model", type=str, required=False, help="checkpoint (.pth or orbax dir)")
    p.add_argument("--split", type=str, default="test", choices=["train", "validation", "test"])
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--subset", type=int, default=None, help="evaluate only N samples")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--root_dir", type=str, default="maestro-v3.0.0")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--data_source", type=str, default="auto",
                   choices=["auto", "cache", "full"],
                   help="auto-detect, cached chunks, or full raw files "
                        "(reference scripts/evaluate.py:833)")
    p.add_argument("--year", type=str, default=None,
                   help="year filter (full files only, e.g. 2017)")
    p.add_argument("--log_file", type=str, default=None,
                   help="custom log file path (only with --background)")
    p.add_argument("--out_dir", type=str, default="eval_outputs")
    p.add_argument("--no_midi", action="store_true")
    p.add_argument("--midi_limit", type=int, default=50)
    p.add_argument("--headless", action="store_true",
                   help="print only EVAL_MEAN_F1=<v> (for scripts/benchmarks)")
    p.add_argument("--onset_f1", action="store_true",
                   help="also report note-level onset F1 (±50 ms tolerance)")
    p.add_argument("--full_pieces", action="store_true",
                   help="evaluate whole raw recordings through the real "
                        "inference pipeline (chunk -> batched forward -> "
                        "concatenated roll, transcribe.py semantics) against "
                        "full-length MIDI rolls, with seam-vs-interior F1 "
                        "breakdown. Raw data source only; uses --threshold "
                        "(tune it on a cache/val split first).")
    p.add_argument("--overlap", type=float, default=0.0,
                   help="chunk overlap in seconds for --full_pieces "
                        "(transcribe.stitch_rolls interior-keep stitching); "
                        "0 = reference-exact non-overlapping chunks")
    p.add_argument("--seam_frames", type=int, default=8,
                   help="half-width (frames, 31.25 fps) of the boundary band "
                        "around chunk seams for --full_pieces analysis")
    p.add_argument("--window", type=float, default=None,
                   help="evaluate at this inference window in seconds instead "
                        "of the checkpoint's chunk length (main.py --window "
                        "semantics: one program at large T, flash attention "
                        "via the auto backend). Raw data source only — the "
                        "cache stores fixed-length chunks.")
    p.add_argument("--onset_tolerance", type=float, default=0.05)
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    # model config overrides (autodetected from checkpoint sidecar when present)
    p.add_argument("--model_type", type=str, default=None)
    p.add_argument("--n_mels", type=int, default=None)
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_layers", type=int, default=None)
    p.add_argument("--dropout", type=float, default=None,
                   help="model dropout rate (inactive at eval; accepted for "
                        "reference CLI parity, ref evaluate.py:883)")
    # threshold tuning (reference scripts/evaluate.py:556-618)
    p.add_argument("--tune_threshold", action="store_true")
    p.add_argument("--tune_split", type=str, default="validation",
                   choices=["train", "validation", "test"],
                   help="split the threshold is tuned on (default: validation). "
                        "The reference tunes on the eval split itself "
                        "(scripts/evaluate.py:556-618), leaking the test set "
                        "into the reported number; pass --tune_split equal to "
                        "--split to reproduce that (a leakage warning is "
                        "printed).")
    p.add_argument("--tune_rounds", type=int, default=6)
    p.add_argument("--tune_range", type=float, nargs=2, default=[0.05, 0.95])
    p.add_argument("--tune_step", type=float, default=0.1)
    p.add_argument("--tune_min_step", type=float, default=0.01)
    # modes
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--show_results", type=str, default=None, metavar="RUN_DIR")
    p.add_argument("--verify_compatibility", action="store_true")
    p.add_argument("--background", action="store_true")
    return p


def detect_data_source(args):
    """--data_source override, else cache if a matching metadata pickle
    exists, else raw (reference scripts/evaluate.py:103-126)."""
    from music_transcription_tpu.data.cache import metadata_path

    if args.data_source == "full":
        return "raw", args.root_dir
    if args.cache_dir and os.path.exists(metadata_path(args.cache_dir, args.split)):
        return "cache", args.cache_dir
    for cand in ("cached_dataset_mels320", "cached_dataset"):
        if args.cache_dir is None and os.path.exists(metadata_path(cand, args.split)):
            return "cache", cand
    if args.data_source == "cache":
        raise SystemExit(
            f"Error: --data_source cache but no metadata found for split "
            f"'{args.split}' in {args.cache_dir or 'cached_dataset[_mels320]'}"
        )
    return "raw", args.root_dir


def full_piece_eval(args, loaded, audio_cfg, n_mels, source_path):
    """Whole-recording evaluation through the production inference path.

    Every piece runs exactly what ``main.py`` runs — 30 s chunks as one
    device batch, thresholded rolls concatenated along time
    (transcribe.py:101-169, reference main.py:86-97,164-186) — and is scored
    against its full-length MIDI roll. Reports per-piece framewise F1 (and
    onset F1 with --onset_f1), plus F1 restricted to the ±--seam_frames band
    around chunk boundaries vs the interior: the chunk-seam machinery's
    quality number (VERDICT r3 weak #3).

    Note the concatenated prediction timeline runs at mel frames per chunk
    (938 per 30 s) while the target roll runs at 31.25 fps (937.5 per 30 s)
    — the reference's own concat semantics; the +0.5 frame/chunk drift is
    part of what this mode measures."""
    import numpy as np

    from music_transcription_tpu import eval as E
    from music_transcription_tpu.config import AudioConfig
    from music_transcription_tpu.data.audio import split_into_chunks
    from music_transcription_tpu.data.maestro import MaestroDataset
    from music_transcription_tpu.transcribe import transcribe_chunks

    ds = MaestroDataset(
        source_path, split=args.split, chunk_length=None, year=args.year,
        return_waveform=True,
        audio_cfg=AudioConfig(n_mels=n_mels, chunk_length=audio_cfg.chunk_length),
    )
    n_eval = min(args.subset, len(ds)) if args.subset else len(ds)
    if n_eval == 0:
        print(f"Error: no pieces in split '{args.split}'")
        return 1
    t_chunk = audio_cfg.mel_frames_per_chunk
    w = max(1, args.seam_frames)
    hop_samples = hop_frames = None
    if args.overlap and args.overlap > 0.0:
        # mirror Transcriber(overlap=...): hop snapped to the mel hop grid
        hop_samples = audio_cfg.chunk_samples - int(
            round(args.overlap * audio_cfg.sample_rate))
        hop_samples = max(audio_cfg.hop_length,
                          (hop_samples // audio_cfg.hop_length)
                          * audio_cfg.hop_length)
        hop_frames = hop_samples // audio_cfg.hop_length
    f1s, onset_f1s = [], []
    seam = np.zeros(3, np.int64)  # tp, fp, fn on boundary-band frames
    interior = np.zeros(3, np.int64)
    for i in range(n_eval):
        wave, roll = ds[i]
        chunks = split_into_chunks(np.asarray(wave), audio_cfg.chunk_samples,
                                   hop_samples=hop_samples)
        pred = np.asarray(transcribe_chunks(loaded, chunks,
                                            threshold=args.threshold,
                                            hop_frames=hop_frames))
        t = min(pred.shape[1], roll.shape[1])
        p, g = pred[:, :t] > 0, np.asarray(roll)[:, :t] > 0
        f1s.append(E.f1_from_counts(int((p & g).sum()), int((p & ~g).sum()),
                                    int((~p & g).sum())))
        if args.onset_f1:
            _, _, of1 = E.note_onset_prf(
                p.astype(np.float32), g.astype(np.float32),
                fs=audio_cfg.frame_rate, tolerance_s=args.onset_tolerance)
            onset_f1s.append(of1)
        # seam band: ±w frames around the points where the output switches
        # source chunk — k*t_chunk for the concat layout; the stitch switch
        # points k*hop + (t_chunk-hop)//2 for the overlapped layout
        idx = np.arange(t)
        near = np.zeros(t, bool)
        for k in range(1, chunks.shape[0]):
            if hop_frames is not None:
                b = k * hop_frames + (t_chunk - hop_frames) // 2
            else:
                b = k * t_chunk
            near |= np.abs(idx - b) < w
        for mask, acc in ((near, seam), (~near, interior)):
            pm, gm = p[:, mask], g[:, mask]
            acc += np.array([(pm & gm).sum(), (pm & ~gm).sum(),
                             (~pm & gm).sum()], np.int64)
        if not args.headless:
            print(f"  piece {i + 1}/{n_eval}: {chunks.shape[0]} chunks, "
                  f"F1={f1s[-1]:.4f}")
    mean = float(np.mean(f1s))
    seam_f1 = E.f1_from_counts(*seam.tolist())
    interior_f1 = E.f1_from_counts(*interior.tolist())
    if args.headless:
        print(f"EVAL_MEAN_F1={mean:.6f}")
        print(f"EVAL_SEAM_F1={seam_f1:.6f}")
        print(f"EVAL_INTERIOR_F1={interior_f1:.6f}")
        if onset_f1s:
            print(f"EVAL_ONSET_F1={float(np.mean(onset_f1s)):.6f}")
        return 0
    print(f"Raw full-piece mean F1: {mean:.6f} over {n_eval} pieces "
          f"(threshold {args.threshold})")
    print(f"Seam-band F1 (±{w} frames around chunk boundaries): {seam_f1:.6f}")
    print(f"Interior F1: {interior_f1:.6f}")
    if onset_f1s:
        print(f"Onset F1 (±{args.onset_tolerance * 1000:.0f} ms): "
              f"{float(np.mean(onset_f1s)):.6f}")
    from datetime import datetime as _dt

    run_dir = os.path.join(args.out_dir, _dt.now().strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    extra = {"model": args.model, "split": args.split, "source": "raw full pieces",
             "seam F1 (±{} frames)".format(w): f"{seam_f1:.6f}",
             "interior F1": f"{interior_f1:.6f}"}
    if hop_frames is not None:
        extra["overlap"] = (f"{args.overlap}s (hop {hop_frames} frames, "
                            f"stitched)")
    if onset_f1s:
        extra["mean onset F1"] = f"{float(np.mean(onset_f1s)):.6f}"
    E.write_summary(os.path.join(run_dir, "eval_summary.txt"),
                    np.asarray(f1s), args.threshold, extra=extra)
    print(f"Results written to {run_dir}")
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.show_results:
        path = os.path.join(args.show_results, "eval_summary.txt")
        if not os.path.exists(path):
            print(f"Error: Summary file not found: {path}")
            return 1
        print(open(path).read())
        return 0

    if args.model is None:
        print("Error: --model is required")
        return 1

    if args.background:
        os.makedirs(args.out_dir, exist_ok=True)
        log_path = args.log_file or os.path.join(
            args.out_dir, f"eval_{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}.log"
        )
        argv_bg = [a for a in sys.argv[1:] if a != "--background"]
        with open(log_path, "a") as log:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)] + argv_bg,
                stdout=log, stderr=subprocess.STDOUT, start_new_session=True,
            )
        print(f"Evaluation started in background (pid {proc.pid}); logs: {log_path}")
        return 0

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.parallel.distributed import (
        ProcessShard,
        maybe_initialize_distributed,
    )

    # Multi-host: each host forwards only its sample shard (no collectives in
    # the forward); metrics are reduced globally below. No-op single-host.
    multihost = maybe_initialize_distributed()
    is_main = jax.process_index() == 0

    from music_transcription_tpu import eval as E
    from music_transcription_tpu.config import (
        AudioConfig, CompatibilityError, ModelConfig, validate_compatibility,
    )
    from music_transcription_tpu.data.cache import CachedMaestroDataset, load_metadata
    from music_transcription_tpu.data.maestro import MaestroDataset
    from music_transcription_tpu.data.pipeline import Loader
    from music_transcription_tpu.transcribe import load_model

    source, source_path = detect_data_source(args)

    # Model config: sidecar (orbax) else CLI overrides else shipped defaults.
    overrides = {}
    for k in ("model_type", "n_mels", "hidden_size", "num_layers", "dropout"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    model_cfg = ModelConfig(**overrides) if overrides else None
    # Reject AST checkpoints by reading the sidecar directly: CLI overrides
    # would otherwise mask the checkpoint's true model_type in loaded.config.
    sidecar_path = os.path.join(args.model, "config.json")
    if os.path.isfile(sidecar_path):
        try:
            saved_type = json.load(open(sidecar_path)).get("model", {}).get("model_type")
        except Exception:
            saved_type = None
        if saved_type == "ast":
            print("Error: this is an AST (token-route) checkpoint; framewise "
                  "evaluation needs frame logits. Use scripts/evaluate_ast.py.")
            return 1
    loaded = load_model(args.model, model_cfg=model_cfg)
    if loaded.model.config.is_ast:
        print("Error: this is an AST (token-route) checkpoint; framewise "
              "evaluation needs frame logits. Use scripts/evaluate_ast.py.")
        return 1
    audio_cfg = loaded.audio_cfg
    n_mels = loaded.model.config.n_mels

    if args.window:
        # Long-window evaluation (VERDICT r3 weak #2: the mode's quality was
        # never measured as F1). Mirrors Transcriber's --window handling:
        # larger chunk_length, attention flips to flash via "auto" once the
        # fp32 score tensor outgrows HBM headroom.
        if source == "cache":
            print("Error: --window needs the raw data source (the cache "
                  "stores fixed-length chunks); pass --data_source full.")
            return 1
        import dataclasses

        from music_transcription_tpu.models.transcription import (
            TranscriptionModel as _TM,
        )
        from music_transcription_tpu.transcribe import LoadedModel

        audio_cfg = dataclasses.replace(audio_cfg, chunk_length=float(args.window))
        model = loaded.model
        if model.config.attention_backend != "pallas":
            model = _TM(dataclasses.replace(model.config, attention_backend="auto"))
        loaded = LoadedModel(model=model, variables=loaded.variables,
                             audio_cfg=audio_cfg)

    if args.full_pieces:
        if source == "cache":
            print("Error: --full_pieces needs the raw data source (whole "
                  "recordings); pass --data_source full.")
            return 1
        return full_piece_eval(args, loaded, audio_cfg, n_mels, source_path)

    def _make_dataset(split):
        if source == "cache":
            return CachedMaestroDataset(source_path, split, verbose=not args.headless)
        return MaestroDataset(
            source_path, split=split, chunk_length=audio_cfg.chunk_length,
            year=args.year,
            audio_cfg=AudioConfig(n_mels=n_mels, chunk_length=audio_cfg.chunk_length),
        )

    if source == "cache":
        meta = load_metadata(source_path, args.split)
        try:
            for w in validate_compatibility(model_n_mels=n_mels, cache_meta=meta, audio=audio_cfg):
                print(f"Warning: {w}")
        except CompatibilityError as exc:
            print(f"Error: {exc}")
            return 1
        if args.verify_compatibility:
            print("Compatibility check passed.")
            return 0
        dataset = _make_dataset(args.split)
    else:
        if args.verify_compatibility:
            print("Raw data source; nothing to verify beyond file presence.")
            return 0
        dataset = _make_dataset(args.split)

    n_total = len(dataset)
    n_eval = min(args.subset, n_total) if args.subset else n_total

    if args.dry_run:
        print("=" * 70)
        print("MODEL EVALUATION - DRY RUN")
        print("=" * 70)
        print(f"Checkpoint:  {args.model}")
        print(f"Model type:  {loaded.model.config.model_type}")
        print(f"n_mels:      {n_mels}")
        print(f"Split:       {args.split}")
        print(f"Data source: {source} ({source_path})")
        print(f"Samples:     {n_eval}{f' (of {n_total})' if n_eval != n_total else ''}")
        print(f"Threshold:   {args.threshold}")
        if args.tune_threshold:
            print(f"Tuning:      rounds={args.tune_rounds} range={args.tune_range} "
                  f"step={args.tune_step} min_step={args.tune_min_step} "
                  f"tune_split={args.tune_split}")
        print("This is a DRY RUN - no evaluation will be performed.")
        return 0

    if args.subset:
        class _Subset:
            def __init__(self, ds, n):
                self.ds, self.n = ds, n
            def __len__(self):
                return self.n
            def __getitem__(self, i):
                return self.ds[i]
        dataset = _Subset(dataset, n_eval)

    grid_fn = None
    if multihost:
        import numpy as np
        from jax.experimental import multihost_utils

        n_procs = jax.process_count()
        dataset = ProcessShard(dataset, exact=True)

        def _global_per_sample(local):
            """Gather per-sample arrays from all hosts back into global
            round-robin order (shard item i on host p = global i*P+p)."""
            m = -(-n_eval // n_procs)
            padded = np.full(m, np.nan, np.float32)
            padded[: len(local)] = local
            gathered = np.asarray(multihost_utils.process_allgather(padded))  # (P, M)
            return gathered.T.reshape(-1)[:n_eval].astype(np.float64)

        def grid_fn(cached, thresholds):
            sums, count = E.grid_f1_sums(cached, thresholds)
            packed = np.concatenate([sums, [float(count)]]).astype(np.float32)
            g = np.asarray(multihost_utils.process_allgather(packed))  # (P, K+1)
            return g[:, :-1].sum(axis=0) / max(1.0, float(g[:, -1].sum()))

    loader = Loader(dataset, args.batch_size, num_workers=4,
                    pad_to=audio_cfg.mel_frames_per_chunk)
    cached = E.predict_probs(loaded.model, loaded.variables, loader,
                             verbose=not args.headless and is_main,
                             pad_batch_to=args.batch_size)

    if args.tune_threshold:
        # Tune on a disjoint split by default (the reference tunes on the eval
        # split itself, scripts/evaluate.py:556-618 — that leaks the reported
        # set into the threshold choice). The tuned threshold is frozen, then
        # the eval split is scored once at that threshold.
        if args.tune_split == args.split:
            if is_main:
                print(f"Warning: --tune_split equals --split ('{args.split}'): "
                      f"the threshold is tuned on the split it is reported on "
                      f"(reference-parity behavior; the reported F1 is "
                      f"optimistically biased).")
            cached_tune = cached
        else:
            try:
                tune_ds = _make_dataset(args.tune_split)
            except Exception as exc:
                print(f"Error: cannot load --tune_split '{args.tune_split}' "
                      f"from {source} source {source_path}: {exc}\n"
                      f"Pass --tune_split {args.split} to tune on the eval "
                      f"split (reference behavior, leaks the eval set).")
                return 1
            if len(tune_ds) == 0:
                print(f"Error: --tune_split '{args.tune_split}' is empty in "
                      f"{source} source {source_path}.")
                return 1
            if multihost:
                tune_ds = ProcessShard(tune_ds, exact=True)
            tune_loader = Loader(tune_ds, args.batch_size, num_workers=4,
                                 pad_to=audio_cfg.mel_frames_per_chunk)
            cached_tune = E.predict_probs(
                loaded.model, loaded.variables, tune_loader,
                verbose=not args.headless and is_main, pad_batch_to=args.batch_size)
        best_t, best_f1 = E.tune_threshold(
            cached_tune, rounds=args.tune_rounds, tune_range=tuple(args.tune_range),
            step=args.tune_step, min_step=args.tune_min_step,
            verbose=not args.headless and is_main, grid_fn=grid_fn,
        )
        if args.headless:
            if is_main:
                print(f"EVAL_BEST_THRESHOLD={best_t:.6f}")
        elif is_main:
            print(f"Best threshold: {best_t:.6f} (tuned on '{args.tune_split}', "
                  f"tune-split mean F1 {best_f1:.6f})")
        args.threshold = best_t

    f1_scores = E.per_sample_f1(cached, args.threshold)
    if multihost:
        f1_scores = _global_per_sample(f1_scores)
    mean = float(f1_scores.mean()) if f1_scores.size else 0.0

    onset_scores = None
    if args.onset_f1:
        onset_scores = E.per_sample_onset_f1(
            cached, args.threshold, fs=audio_cfg.frame_rate,
            tolerance_s=args.onset_tolerance,
        )
        if multihost:
            onset_scores = _global_per_sample(onset_scores)

    if args.headless:
        if is_main:
            print(f"EVAL_MEAN_F1={mean:.6f}")
            if onset_scores is not None:
                print(f"EVAL_ONSET_F1={float(onset_scores.mean()):.6f}")
        return 0

    confusion = E.global_confusion(cached, args.threshold)
    if multihost:
        # all processes participate in the gather; only process 0 writes
        confusion = np.asarray(
            multihost_utils.process_allgather(confusion.astype(np.float64))
        ).sum(axis=0)
        if not is_main:
            return 0

    run_dir = os.path.join(args.out_dir, datetime.now().strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    extra = {"model": args.model, "split": args.split, "source": source}
    if args.tune_threshold:
        extra["threshold tuned on"] = args.tune_split
    if onset_scores is not None:
        extra["mean onset F1 (±{:.0f} ms)".format(args.onset_tolerance * 1000)] = (
            f"{float(onset_scores.mean()):.6f}"
        )
    E.write_summary(
        os.path.join(run_dir, "eval_summary.txt"), f1_scores, args.threshold, extra=extra,
    )
    E.plot_confusion(os.path.join(run_dir, "confusion_matrix.png"), confusion)
    if not args.no_midi:
        # multihost: process 0 writes MIDIs for its own shard only (probs of
        # other hosts' samples never cross DCN)
        E.write_sample_midis(
            cached, args.threshold, os.path.join(run_dir, "midis"),
            fs=audio_cfg.frame_rate, limit=args.midi_limit,
        )
    print(f"Mean F1: {mean:.6f} over {len(f1_scores)} samples")
    print(f"Results written to {run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
