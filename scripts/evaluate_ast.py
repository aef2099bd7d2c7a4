#!/usr/bin/env python
"""AST (token-route) evaluation CLI: generate -> decode -> note-level F1.

CLI port of the reference's notebook evaluation driver (reference
transformer_draft.ipynb cell 11: ``_trim_tokens`` / ``midi_to_note_events`` /
``note_f1`` / ``evaluate_one_sample``): for each sample, autoregressively
generate tokens from audio, trim at <eos>/skip <pad>, decode generated and
ground-truth sequences to MIDI, and score with greedy onset matching
(|onset| <= onset_tol and |pitch| <= pitch_tol).

    python scripts/evaluate_ast.py --model outputs/ast_xxx/model_final \
        --root_dir maestro-v3.0.0 --split test --subset 8 --headless
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate the AST token route")
    p.add_argument("--model", type=str, required=True,
                   help="checkpoint dir (with config.json sidecar)")
    p.add_argument("--root_dir", "--root-dir", type=str, default="maestro-v3.0.0")
    p.add_argument("--cache_dir", "--cached_dir", "--cached-dir", type=str,
                   default=None, help="waveform/tokenized cache (optional)")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--year", type=str, default=None)
    p.add_argument("--subset", type=int, default=None,
                   help="evaluate only the first N samples")
    p.add_argument("--max_len", "--max-len", type=int, default=1024,
                   help="generation token budget (ref cell 11: 1024)")
    p.add_argument("--gen_batch_size", "--gen-batch-size", type=int, default=8,
                   help="samples generated per device dispatch (one compiled "
                        "program; per-call RPC overhead on the tunneled "
                        "backend is ~28 ms, so batching cuts eval wall-clock "
                        "nearly linearly)")
    p.add_argument("--onset_tol", "--onset-tol", type=float, default=0.1,
                   help="onset tolerance in seconds (ref example: 0.1)")
    p.add_argument("--pitch_tol", "--pitch-tol", type=float, default=0.5,
                   help="pitch tolerance in semitones (ref example: 0.5)")
    p.add_argument("--tokenizer", type=str, default=None,
                   choices=["remi", "event"],
                   help="remi = pianoroll walk (models/remi_tokenizer.py), "
                        "event = NOTE_ON/OFF/TIME_SHIFT (models/event_tokenizer.py); "
                        "defaults to the checkpoint's trained vocabulary "
                        "(config.json sidecar)")
    p.add_argument("--out_dir", "--out-dir", type=str, default=None,
                   help="write per-sample gen_<i>.mid / gt_<i>.mid here")
    p.add_argument("--midi_limit", type=int, default=8,
                   help="cap on per-sample MIDI pairs written")
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    p.add_argument("--frame_f1", "--frame-f1", action="store_true",
                   help="also report frame-level P/R/F1 of the decoded rolls "
                        "vs the ground-truth rolls (reference "
                        "scripts/transformer-draft.ipynb cell 31)")
    p.add_argument("--teacher_forced", "--teacher-forced", action="store_true",
                   help="skip generation: measure teacher-forced next-token "
                        "accuracy (all tokens, and NOTE_ON pitch tokens only). "
                        "Separates 'the model cannot read pitch from audio' "
                        "from 'free-running generation drifts' — the round-4 "
                        "diagnostic that located the AST quality gap")
    p.add_argument("--beam", type=int, default=1,
                   help="beam size for generation (default 1 = greedy). "
                        "Vectorized beam search with GNMT length "
                        "normalization; composes with --constrained")
    p.add_argument("--length_penalty", "--length-penalty", type=float,
                   default=0.6, help="beam length-normalization exponent")
    p.add_argument("--constrained", action="store_true",
                   help="grammar-constrained decoding: mask logits with the "
                        "tokenizer's transition_mask() so generation can only "
                        "emit sequences the encoder could produce (e.g. REMI "
                        "NOTE_ON must be followed by VELOCITY). Targets "
                        "free-running drift; no reference counterpart")
    p.add_argument("--headless", action="store_true",
                   help="print a final EVAL_AST_NOTE_F1= line")
    return p




def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.teacher_forced and (args.constrained or args.beam > 1):
        parser.error("--teacher_forced scores the forward pass only; "
                     "--constrained/--beam shape generation and would be "
                     "silently ignored — drop one side")

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    # one definition of the token-route metric, shared with train_ast's
    # --val_note_f1_every generation validation
    from music_transcription_tpu.eval import (
        decode_tokens_to_notes,
        note_f1,
        trim_tokens,
    )

    from music_transcription_tpu.config import AudioConfig, ModelConfig
    from music_transcription_tpu.data.cache import CachedMaestroDataset, metadata_path
    from music_transcription_tpu.data.maestro import MaestroDataset
    from music_transcription_tpu.data.midi import notes_to_midi, save_midi
    from music_transcription_tpu.models.event_tokenizer import EventMIDITokenizer
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.train.checkpoints import load_checkpoint

    cfg_path = os.path.join(args.model, "config.json")
    if not os.path.exists(cfg_path):
        print(f"Error: no config.json sidecar at {args.model}")
        return 1
    cfg = json.load(open(cfg_path))
    model_cfg = ModelConfig(**cfg["model"])
    audio_cfg = AudioConfig(**cfg.get("audio", {}))
    if not model_cfg.is_ast:
        print(f"Error: {args.model} is not an AST checkpoint "
              f"(model_type={model_cfg.model_type}); use scripts/evaluate.py.")
        return 1

    model = TranscriptionModel(model_cfg)
    like = model.init(jax.random.key(0),
                      jnp.zeros((1, audio_cfg.chunk_samples), jnp.float32))
    variables = load_checkpoint(args.model, like={"params": like["params"]})

    if args.tokenizer is None:
        # decode with the vocabulary the checkpoint was trained on
        args.tokenizer = getattr(model_cfg, "tokenizer", "remi")
        print(f"Tokenizer: {args.tokenizer} (from checkpoint config)")
    elif args.tokenizer != getattr(model_cfg, "tokenizer", "remi"):
        print(f"Warning: --tokenizer {args.tokenizer} differs from the "
              f"checkpoint's trained vocabulary "
              f"({getattr(model_cfg, 'tokenizer', 'remi')}); decoded notes "
              f"will be garbage unless you know better.")

    fr = audio_cfg.frame_rate
    if args.tokenizer == "event":
        tokenizer = EventMIDITokenizer(vocab_size=model_cfg.remi_vocab_size,
                                       frame_rate=fr)
    else:
        tokenizer = REMITokenizer(vocab_size=model_cfg.remi_vocab_size)

    pretokenized = False
    if args.cache_dir and os.path.exists(metadata_path(args.cache_dir, args.split)):
        dataset = CachedMaestroDataset(args.cache_dir, args.split)
        meta = dataset.metadata
        if not (meta.get("return_waveform") or meta.get("tokenize")):
            print(f"Error: cache {args.cache_dir} holds mel features; AST "
                  f"evaluation needs a --waveform (or --tokenize) cache.")
            return 1
        pretokenized = meta.get("tokenize", False)
        if pretokenized and args.tokenizer != "remi":
            print("Error: pre-tokenized caches are REMI-encoded; rerun with "
                  "--tokenizer remi or point at a waveform cache.")
            return 1
    else:
        if args.cache_dir:
            print(f"Warning: no cache metadata at {args.cache_dir} for split "
                  f"'{args.split}'; falling back to the raw dataset at "
                  f"{args.root_dir}")
        dataset = MaestroDataset(
            args.root_dir, split=args.split,
            year=None if args.year in (None, "all") else args.year,
            chunk_length=audio_cfg.chunk_length, return_waveform=True,
            audio_cfg=audio_cfg,
        )

    n = len(dataset)
    if args.subset:
        n = min(n, args.subset)
    print(f"Evaluating {n} samples (tokenizer={args.tokenizer}, "
          f"max_len={args.max_len}, onset_tol={args.onset_tol}s)")
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    def decode_notes(tokens):
        return decode_tokens_to_notes(tokens, tokenizer, frame_rate=fr)

    if args.teacher_forced:
        # One jitted forward per fixed-size batch; logits[:, t] predicts
        # tokens[:, t+1] (the training alignment, train/loop.py token route).
        bs = min(8, n)
        # variables as an argument, not a closure: closures bake the full
        # parameter tree into the program as constants (slow relay compile)
        fwd = jax.jit(lambda v, w, tk: model.apply(v, w, train=False,
                                                   targets=tk))
        n_eff = (n // bs) * bs
        tot = {"ok": 0, "valid": 0, "pitch_ok": 0, "pitch": 0}
        pitch_lo = tokenizer.note_on_base
        # REMI ids cover the 88 piano keys; the event vocab keeps full MIDI 0..127
        pitch_hi = pitch_lo + (128 if args.tokenizer == "event" else 88)
        for b0 in range(0, n_eff, bs):
            ws, tks = [], []
            for i in range(b0, b0 + bs):
                wave, second = dataset[i]
                if pretokenized:
                    tk = np.asarray(second).astype(np.int32)
                else:
                    tk = np.asarray(tokenizer.encode_from_pianoroll(
                        np.asarray(second), max_len=args.max_len),
                        dtype=np.int32)
                ws.append(np.asarray(wave))
                tks.append(tk)
            w = jnp.asarray(np.stack(ws))
            tk = jnp.asarray(np.stack(tks))
            pred = np.asarray(jnp.argmax(fwd(variables, w, tk), -1))
            tgt = np.asarray(tk)[:, 1:]
            prd = pred[:, : tgt.shape[1]]
            valid = tgt != tokenizer.pad
            is_pitch = (tgt >= pitch_lo) & (tgt < pitch_hi) & valid
            tot["ok"] += int(((prd == tgt) & valid).sum())
            tot["valid"] += int(valid.sum())
            tot["pitch_ok"] += int(((prd == tgt) & is_pitch).sum())
            tot["pitch"] += int(is_pitch.sum())
        acc = tot["ok"] / max(1, tot["valid"])
        pacc = tot["pitch_ok"] / max(1, tot["pitch"])
        print(f"Teacher-forced next-token acc={acc:.4f} "
              f"NOTE_ON-pitch acc={pacc:.4f} "
              f"({tot['pitch']} pitch tokens of {tot['valid']} valid, "
              f"{n_eff} samples; chance ~1/88)")
        if args.headless:
            print(f"EVAL_AST_TF_ACC={acc:.6f}")
            print(f"EVAL_AST_TF_PITCH_ACC={pacc:.6f}")
        return 0

    totals = {"tp": 0, "fp": 0, "fn": 0}
    frame = {"tp": 0, "pred": 0, "gt": 0}
    per_sample = []
    gen_kwargs = {}
    if args.constrained:
        gen_kwargs["allowed_next"] = jnp.asarray(tokenizer.transition_mask())
    if args.beam > 1:
        gen_kwargs["beam_size"] = args.beam
        gen_kwargs["length_penalty"] = args.length_penalty
        gen_kwargs["eos_id"] = tokenizer.eos
        gen_kwargs["pad_id"] = tokenizer.pad
    # one jitted program per run: shapes are fixed (gen_batch, chunk) x
    # max_len, so the tunneled backend pays one compile and one dispatch per
    # BATCH instead of per sample (per-call RPC overhead is ~28 ms; beam
    # search already rides the batch dimension, so the two compose)
    bs = max(1, min(args.gen_batch_size, n))
    pad_len = audio_cfg.chunk_samples
    gen_fn = jax.jit(lambda v, w: model.apply(
        v, w, train=False, targets=None,
        generate_max_len=args.max_len, **gen_kwargs))
    for b0 in range(0, n, bs):
        idxs = range(b0, min(b0 + bs, n))
        waves, gts, seconds = [], [], []
        for i in idxs:
            wave, second = dataset[i]
            # zero-pad to the chunk length (the training collate's pad_to
            # contract, and one compiled shape for every batch)
            w = np.asarray(wave, np.float32)[:pad_len]
            if w.shape[-1] < pad_len:
                w = np.pad(w, (0, pad_len - w.shape[-1]))
            waves.append(w)
            seconds.append(second)
            if pretokenized:
                gts.append([int(t) for t in np.asarray(second).tolist()])
            else:
                gts.append(tokenizer.encode_from_pianoroll(
                    np.asarray(second), max_len=args.max_len))
        while len(waves) < bs:  # tail batch: pad rows, drop their outputs
            waves.append(np.zeros(pad_len, np.float32))
        gen = np.asarray(gen_fn(variables, jnp.asarray(np.stack(waves))))
        for row, i in enumerate(idxs):
            gen_tokens = trim_tokens(gen[row].tolist(),
                                     eos_id=tokenizer.eos, pad_id=tokenizer.pad)
            gt_tokens = trim_tokens(gts[row], eos_id=tokenizer.eos,
                                    pad_id=tokenizer.pad)

            gen_notes = decode_notes(gen_tokens)
            gt_notes = decode_notes(gt_tokens)
            m = note_f1(gen_notes, gt_notes, onset_tol=args.onset_tol,
                        pitch_tol=args.pitch_tol)
            per_sample.append(m["f1"])
            for k in totals:
                totals[k] += m[k]
            print(f"[{i}] gen {len(gen_notes):4d} notes / gt {len(gt_notes):4d}: "
                  f"P={m['precision']:.3f} R={m['recall']:.3f} F1={m['f1']:.3f}")

            if args.frame_f1 and not pretokenized:
                gt_roll = (np.asarray(seconds[row]) > 0.5)
                gen_roll = tokenizer.decode_to_pianoroll(
                    gen_tokens, max_t=gt_roll.shape[-1]) > 0.5
                t_min = min(gt_roll.shape[-1], gen_roll.shape[-1])
                gp, pp = gt_roll[:, :t_min], gen_roll[:, :t_min]
                frame["tp"] += int((gp & pp).sum())
                # truncation is not free: frames past t_min count as misses
                frame["pred"] += int(gen_roll.sum())
                frame["gt"] += int(gt_roll.sum())

            if args.out_dir and i < args.midi_limit:
                from music_transcription_tpu.data.midi import Note

                for tag, trip in (("gen", gen_notes), ("gt", gt_notes)):
                    midi = notes_to_midi(
                        [Note(pitch=p, start=s, end=e, velocity=80)
                         for p, s, e in trip])
                    save_midi(midi, os.path.join(args.out_dir, f"{tag}_{i}.mid"))

    tp, fp, fn = totals["tp"], totals["fp"], totals["fn"]
    prec = tp / (tp + fp + 1e-9)
    rec = tp / (tp + fn + 1e-9)
    micro = 2 * prec * rec / (prec + rec + 1e-9)
    mean = float(np.mean(per_sample)) if per_sample else 0.0
    print(f"\nNote-level micro P={prec:.4f} R={rec:.4f} F1={micro:.4f} "
          f"(mean per-sample F1={mean:.4f}, {n} samples)")
    if args.frame_f1 and frame["gt"]:
        fp_ = frame["tp"] / (frame["pred"] + 1e-9)
        fr_ = frame["tp"] / (frame["gt"] + 1e-9)
        ff1 = 2 * fp_ * fr_ / (fp_ + fr_ + 1e-9)
        print(f"Frame-level micro P={fp_:.4f} R={fr_:.4f} F1={ff1:.4f}")
        if args.headless:
            print(f"EVAL_AST_FRAME_F1={ff1:.6f}")
    if args.headless:
        print(f"EVAL_AST_NOTE_F1={micro:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
