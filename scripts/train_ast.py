#!/usr/bin/env python
"""AST training CLI (experimental tier).

Surface of reference scripts/train_ast.py:112-298: dataclass-style config via
argparse with BooleanOptionalAction, "all"/0 sentinel conversion for
subset_size, sanity checks (dataset sample + tokenizer round-trip) before
training, mock-encoder mode for dependency-free smoke tests.

    python scripts/train_ast.py --root_dir maestro-v3.0.0 --epochs 2 \
        --batch_size 4 --mock_encoder --subset_size 8
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    # Every flag also accepts the reference's dash spelling (ref
    # scripts/train_ast.py:142-169 uses --subset-size style) so reference
    # command lines are drop-in.
    p = argparse.ArgumentParser(description="Train the AST token-generation model")
    p.add_argument("--root_dir", "--root-dir", type=str, default="maestro-v3.0.0")
    p.add_argument("--cache_dir", "--cached_dir", "--cached-dir", type=str,
                   default=None, help="tokenized or waveform cache (optional)")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--year", type=str, default=None)
    p.add_argument("--subset_size", "--subset-size", type=str, default="all",
                   help="'all' or an integer (0 == all)")
    p.add_argument("--epochs", "--num_epochs", "--num-epochs", type=int, default=5)
    p.add_argument("--batch_size", "--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--model_type", "--model-type", type=str, default="ast",
                   choices=["ast"])
    p.add_argument("--chunk_length", "--chunk-length", type=float, default=10.0)
    p.add_argument("--chunk_overlap", "--chunk-overlap", type=float, default=0.0)
    p.add_argument("--max_token_len", "--max-token-len", type=int, default=256)
    p.add_argument("--decoder_layers", "--decoder-layers", type=int, default=4)
    p.add_argument("--decoder_dim", "--decoder-dim", type=int, default=384)
    p.add_argument("--decoder_heads", "--decoder-heads", type=int, default=6)
    p.add_argument("--remi_vocab_size", "--remi-vocab-size", type=int, default=512)
    p.add_argument("--tokenizer", type=str, default="remi",
                   choices=["remi", "event"],
                   help="remi = pianoroll walk (models/remi_tokenizer.py); "
                        "event = NOTE_ON/OFF/TIME_SHIFT straight from note "
                        "events (models/event_tokenizer.py, ref "
                        "transformer_draft.ipynb cell 5)")
    p.add_argument("--dropout", type=float, default=0.2)
    # mel-patch encoder geometry (shared by the AST model and the
    # frame-supervised pretrainer; must match between the two runs)
    p.add_argument("--encoder_layers", "--encoder-layers", type=int, default=4)
    p.add_argument("--encoder_dim", "--encoder-dim", type=int, default=384)
    p.add_argument("--encoder_heads", "--encoder-heads", type=int, default=6)
    p.add_argument("--patch_frames", "--patch-frames", type=int, default=4)
    p.add_argument("--encoder_n_mels", "--encoder-n-mels", type=int, default=128)
    # Pretrain/freeze/finetune recipe (the reference's architecture pattern
    # — frozen pretrained encoder + trained decoder, transformer_model.py:35,
    # 94-97 — built from in-environment resources):
    #   1. train_ast.py --pretrain_frames ...          (framewise 88-key head)
    #   2. train_ast.py --encoder_init RUN/model_best --freeze-encoder ...
    p.add_argument("--pretrain_frames", "--pretrain-frames",
                   action=argparse.BooleanOptionalAction, default=False,
                   help="pretrain ONLY the mel-patch encoder with a framewise "
                        "88-key head (masked BCE against piano rolls) instead "
                        "of training the token model")
    p.add_argument("--encoder_init", "--encoder-init", type=str, default=None,
                   help="checkpoint from a --pretrain_frames run; its encoder "
                        "subtrees are transplanted into the AST model "
                        "(combine with --freeze-encoder for the reference's "
                        "frozen-pretrained-encoder pattern)")
    p.add_argument("--mock_encoder", "--use_mock_encoder", "--use-mock-encoder",
                   action=argparse.BooleanOptionalAction, default=False)
    # Deviation from the reference default (True): it freezes a *pretrained*
    # encoder; ours is from-scratch, so freezing would silently cap quality
    # (see PARITY.md / config.py:96-99).
    p.add_argument("--freeze_encoder", "--freeze-encoder",
                   action=argparse.BooleanOptionalAction, default=False)
    p.add_argument("--val_split", "--val-split", type=str, default=None,
                   help="track per-epoch CE on this split (e.g. 'validation') "
                        "and retain the best-CE params for model_best")
    p.add_argument("--val_batches", "--val-batches", type=int, default=16,
                   help="cap on validation batches per epoch")
    p.add_argument("--val_note_f1_every", "--val-note-f1-every", type=int,
                   default=0,
                   help="every N epochs, autoregressively generate on the "
                        "first --val_note_f1_batches validation batches and "
                        "log note-level micro F1 (the metric that matters: "
                        "measured on hardware, token CE and generated note-F1 "
                        "decouple — scheduled sampling lowered CE with flat "
                        "F1, beam trails greedy). 0 = off; needs --val_split")
    p.add_argument("--val_note_f1_batches", "--val-note-f1-batches", type=int,
                   default=2,
                   help="validation batches to generate on per note-F1 pass "
                        "(generation is ~max_token_len sequential decode "
                        "steps per batch — keep small)")
    p.add_argument("--best_metric", "--best-metric", type=str, default="ce",
                   choices=["ce", "note_f1"],
                   help="metric that selects model_best and drives early "
                        "stopping: 'ce' = validation token cross-entropy "
                        "(every epoch), 'note_f1' = generated note-level F1 "
                        "(computed on --val_note_f1_every epochs only; "
                        "requires it)")
    p.add_argument("--early_stop_patience", "--early-stop-patience", type=int,
                   default=0,
                   help="stop when val CE has not improved for N epochs "
                        "(0 = run all --epochs); needs --val_split")
    p.add_argument("--save_best_every", "--save-best-every", type=int, default=0,
                   help="flush the device-retained best params to model_best "
                        "every N epochs, not just at exit (train/loop.py's "
                        "_flush_best rationale). A wedged tunnel RPC cannot "
                        "honor the exit flush — the flush itself needs the "
                        "dead connection — so cadenced flushes bound what a "
                        "SIGKILL loses to N epochs")
    p.add_argument("--device_data", "--device-data", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="stage the whole dataset in device HBM once and feed "
                        "the step index vectors (zero per-step H2D traffic; "
                        "also bounds the axon client's per-transfer host "
                        "retention). auto = on-TPU when the data fits")
    p.add_argument("--stall_timeout", "--stall-timeout", type=float, default=0.0,
                   help="abort (exit 66) when no train/val step completes "
                        "for this many seconds — the tunneled backend can "
                        "wedge an RPC permanently and a wedged process "
                        "cannot flush its best state; a supervisor then "
                        "resumes from the last --save_best_every flush. "
                        "0 = off; set above the worst first-step compile")
    p.add_argument("--compact_data", "--compact-data",
                   action=argparse.BooleanOptionalAction, default=False,
                   help="stage waveforms as int16 at PCM16 scale (half the "
                        "HBM footprint and staging transfer, dequantized on "
                        "device after the gather): exact for 16-bit-PCM-"
                        "decoded audio, ~96 dB SNR after resampling. Doubles "
                        "how much data --device_data can hold")
    p.add_argument("--scheduled_sampling", "--scheduled-sampling", type=float,
                   default=0.0,
                   help="exposure-bias fix (Bengio et al. 2015 curriculum): "
                        "with probability p, decoder input positions are "
                        "replaced by the model's own teacher-forced argmax "
                        "predictions (two-pass step; first pass is "
                        "gradient-stopped). p ramps linearly from 0 to this "
                        "value over --ss_ramp_epochs. Motivated by the "
                        "round-4 diagnostic: teacher-forced pitch accuracy "
                        "0.57 vs free-running note-F1 0.11 -- the gap IS "
                        "exposure bias")
    p.add_argument("--ss_ramp_epochs", "--ss-ramp-epochs", type=int, default=10,
                   help="epochs to ramp --scheduled_sampling from 0 to its "
                        "final value")
    p.add_argument("--pitch_loss_weight", "--pitch-loss-weight", type=float,
                   default=1.0,
                   help="CE weight on NOTE_ON/NOTE_OFF target tokens "
                        "(torch CrossEntropyLoss(weight=...) semantics; "
                        "1.0 = off). Targets the measured failure mode: "
                        "token CE improves on timing/structure tokens while "
                        "pitched-note accuracy stalls. Validation CE stays "
                        "unweighted so runs remain comparable. Measured A/B "
                        "(eval_outputs/2026-08-19_v5ab): 3.0 beats 1.0 by "
                        "+30%% relative held-out note-F1; recommended start")
    p.add_argument("--sanity_checks", "--run_sanity_checks", "--run-sanity-checks",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--sanity_max_len", "--sanity-max-len", type=int, default=256,
                   help="token budget used by the sanity round-trip check")
    p.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    p.add_argument("--run_dir", "--run-dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume params from (cold optimizer)")
    p.add_argument("--seed", type=int, default=0)
    return p


def run_sanity_checks(dataset, tokenizer, max_token_len):
    """Dataset sample + tokenizer round trip (reference scripts/train_ast.py:205-243)."""
    import numpy as np

    print("Running sanity checks...")
    wave, roll = dataset[0]
    dur = wave.shape[-1] / 16000
    print(f"  sample 0: waveform {wave.shape} ({dur:.1f}s), roll {roll.shape}")
    seq = tokenizer.encode_from_pianoroll(roll, max_len=max_token_len)
    decoded = tokenizer.decode_to_pianoroll(seq, max_t=roll.shape[-1])
    t = decoded.shape[1]
    agree = float((decoded == np.asarray(roll)[:, :t]).mean()) if t else 1.0
    print(f"  tokenizer round-trip: {len(seq)} tokens, {agree:.1%} frame agreement")
    if agree < 0.95:
        print("  ⚠ round-trip agreement below 95% (roll longer than token budget?)")
    print("Sanity checks passed.")


def pretrain_main(args, subset):
    """--pretrain_frames: frame-supervised pretraining of the mel-patch
    encoder (ASTEncoderPretrainer). The synthetic corpus gives framewise
    88-key labels for free; the CNN tier proves they teach acoustics to
    F1 0.92 — this distills the same signal into the AST encoder, standing
    in for the reference's unfetchable AudioSet pretraining
    (reference models/transformer_model.py:35,94-97)."""
    import json
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from music_transcription_tpu.config import AudioConfig, config_to_dict
    from music_transcription_tpu.data.cache import CachedMaestroDataset, metadata_path
    from music_transcription_tpu.data.maestro import MaestroDataset
    from music_transcription_tpu.data.pipeline import Loader, collate_wave_roll
    from music_transcription_tpu.models.transformer import ASTEncoderPretrainer
    from music_transcription_tpu.ops.losses import masked_bce_loss
    from music_transcription_tpu.train.checkpoints import save_checkpoint

    audio_cfg = AudioConfig(chunk_length=args.chunk_length)

    def make_ds(split, sub=None):
        if args.cache_dir and os.path.exists(metadata_path(args.cache_dir, split)):
            ds = CachedMaestroDataset(args.cache_dir, split, subset_size=sub,
                                      prefer_roll=True)
            meta = ds.metadata
            if not meta.get("return_waveform"):
                raise SystemExit(
                    f"Error: cache {args.cache_dir} (split '{split}') has no "
                    f"waveforms; encoder pretraining needs a --waveform or "
                    f"--tokenize cache.")
            if meta.get("chunk_length") not in (None, args.chunk_length):
                raise SystemExit(
                    f"Error: cache chunk_length={meta.get('chunk_length')}s != "
                    f"--chunk_length {args.chunk_length}.")
            return ds
        return MaestroDataset(
            args.root_dir, split=split,
            year=None if args.year in (None, "all") else args.year,
            chunk_length=args.chunk_length, overlap=args.chunk_overlap,
            subset_size=sub, return_waveform=True, audio_cfg=audio_cfg)

    dataset = make_ds(args.split, subset)
    print(f"Pretrain set: {len(dataset)} chunks (frame-supervised)")
    collate = partial(collate_wave_roll, roll_pad_to=audio_cfg.roll_frames_per_chunk)

    wave_bytes = 2 if args.compact_data else 4
    est_bytes = len(dataset) * (wave_bytes * audio_cfg.chunk_samples
                                + 4 * 88 * audio_cfg.roll_frames_per_chunk)
    staged = args.device_data == "on" or (
        args.device_data == "auto"
        and jax.devices()[0].platform != "cpu"
        and est_bytes < 11e9)
    loader = None
    if not staged:
        loader = Loader(dataset, args.batch_size, shuffle=True, seed=args.seed,
                        num_workers=4, drop_last=True, collate=collate,
                        pad_to=audio_cfg.chunk_samples)

    model = ASTEncoderPretrainer(
        encoder_layers=args.encoder_layers, encoder_dim=args.encoder_dim,
        encoder_heads=args.encoder_heads, patch_frames=args.patch_frames,
        n_mels=args.encoder_n_mels, dropout=args.dropout)
    sample = jnp.zeros((1, audio_cfg.chunk_samples), jnp.float32)
    variables = model.init(jax.random.key(args.seed), sample, train=False)
    if args.resume:
        from music_transcription_tpu.train.checkpoints import load_checkpoint

        payload = load_checkpoint(args.resume, like={"params": variables["params"]})
        variables = {**variables, "params": payload["params"]}
        print(f"Resumed params from {args.resume}")
    n_params = sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
    print(f"Encoder pretrainer: {n_params / 1e6:.1f}M params "
          f"({args.encoder_layers}L x {args.encoder_dim}d, "
          f"patch_frames={args.patch_frames}, n_mels={args.encoder_n_mels})")
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    def step_core(params, opt_state, wave, roll, lengths, rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, wave, train=True,
                                 rngs={"dropout": rng})
            return masked_bce_loss(logits, roll, lengths)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step_core)

    def _take_wave(wave_all, idx):
        # gather the (possibly int16-compacted) staged waveforms, then
        # dequantize — trace-time dtype branch, static under jit
        w = jnp.take(wave_all, idx, axis=0)
        return dequantize_i16(w) if w.dtype == jnp.int16 else w

    @jax.jit
    def step_staged(params, opt_state, wave_all, roll_all, len_all, idx, rng):
        # device-side gather: the only per-step host->device payload is idx
        return step_core(params, opt_state,
                         _take_wave(wave_all, idx),
                         jnp.take(roll_all, idx, axis=0),
                         jnp.take(len_all, idx, axis=0), rng)

    def eval_core(params, wave, roll, lengths):
        logits = model.apply({"params": params}, wave, train=False)
        loss = masked_bce_loss(logits, roll, lengths)
        # framewise tp/fp/fn at threshold 0.5 on the valid frames: a direct
        # read on acoustic quality, comparable to the CNN tier's F1
        t = roll.shape[-1]
        from music_transcription_tpu.ops.losses import interpolate_time_linear

        pred = interpolate_time_linear(logits, t) > 0.0
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, :]
        pos = (roll > 0.5) & mask
        tp = jnp.sum(pred & pos)
        fp = jnp.sum(pred & ~pos & mask)
        fn = jnp.sum(~pred & pos)
        return loss, tp, fp, fn

    eval_step = jax.jit(eval_core)

    @jax.jit
    def eval_staged(params, wave_all, roll_all, len_all, idx):
        return eval_core(params,
                         _take_wave(wave_all, idx),
                         jnp.take(roll_all, idx, axis=0),
                         jnp.take(len_all, idx, axis=0))

    from music_transcription_tpu.data.pipeline import (
        dequantize_i16,
        epoch_index_batches,
        stage_to_device,
    )

    compact = (0,) if args.compact_data else ()
    train_dev = n_train = None
    if staged:
        train_dev, n_train = stage_to_device(
            dataset, collate, pad_to=audio_cfg.chunk_samples, verbose=True,
            compact_fields=compact)
        print(f"Device-staged training data: {n_train} chunks")

    val_loader = None
    val_dev = n_val = None
    if args.val_split:
        val_ds = make_ds(args.val_split)
        if len(val_ds) < args.batch_size:
            raise SystemExit(
                f"Error: --val_split '{args.val_split}' has {len(val_ds)} "
                f"chunks < batch_size {args.batch_size}.")
        if staged:
            # only the first val_batches * batch_size chunks are ever scored
            # (deterministic order) — stage exactly those
            val_dev, n_val = stage_to_device(
                val_ds, collate, pad_to=audio_cfg.chunk_samples,
                limit=args.val_batches * args.batch_size, verbose=True,
                compact_fields=compact)
        else:
            val_loader = Loader(val_ds, args.batch_size, shuffle=False,
                                seed=args.seed, num_workers=2, drop_last=True,
                                collate=collate, pad_to=audio_cfg.chunk_samples)
        print(f"Validation set: {len(val_ds)} chunks "
              f"(up to {args.val_batches} batches/epoch)")

    run_dir = args.run_dir or os.path.join(
        "outputs", "ast_pretrain_" + datetime.now().strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    params = variables["params"]
    rng = jax.random.key(args.seed + 1)
    best_val, best_params, best_epoch = float("inf"), None, 0
    log_path = os.path.join(run_dir, "training_log.txt")

    sidecar = {
        "pretrain_encoder": {
            "encoder_layers": args.encoder_layers,
            "encoder_dim": args.encoder_dim,
            "encoder_heads": args.encoder_heads,
            "patch_frames": args.patch_frames,
            "encoder_n_mels": args.encoder_n_mels,
        },
        "audio": config_to_dict(audio_cfg),
    }

    def save(name, p):
        ckpt = os.path.join(run_dir, name)
        save_checkpoint(ckpt, {"params": jax.tree.map(np.asarray, p)})
        with open(os.path.join(ckpt, "config.json"), "w") as f:
            json.dump(sidecar, f)
        print(f"Saved {ckpt}")

    ops = _RunOps(args, save)
    beat = ops.beat
    try:
        for epoch in range(1, args.epochs + 1):
            total, n = 0.0, 0
            if staged:
                for idx in epoch_index_batches(n_train, args.batch_size,
                                               seed=args.seed, epoch=epoch):
                    rng, sub = jax.random.split(rng)
                    params, opt_state, loss = step_staged(
                        params, opt_state, *train_dev, jnp.asarray(idx), sub)
                    total += float(loss)
                    beat()
                    n += 1
            else:
                for wave, roll, lengths in loader:
                    rng, sub = jax.random.split(rng)
                    params, opt_state, loss = step(
                        params, opt_state, jnp.asarray(wave), jnp.asarray(roll),
                        jnp.asarray(lengths), sub)
                    total += float(loss)
                    beat()
                    n += 1
            line = f"Epoch {epoch}/{args.epochs}: train_loss={total / max(1, n):.4f}"
            if val_loader is not None or val_dev is not None:
                vtotal, vn = 0.0, 0
                tp = fp = fn_ = 0
                if staged:
                    for idx in epoch_index_batches(n_val, args.batch_size,
                                                   shuffle=False):
                        vloss, btp, bfp, bfn = eval_staged(
                            params, *val_dev, jnp.asarray(idx))
                        vtotal += float(vloss)
                        beat()
                        tp += int(btp); fp += int(bfp); fn_ += int(bfn)
                        vn += 1
                        if vn >= args.val_batches:
                            break
                else:
                    for wave, roll, lengths in val_loader:
                        vloss, btp, bfp, bfn = eval_step(
                            params, jnp.asarray(wave), jnp.asarray(roll),
                            jnp.asarray(lengths))
                        vtotal += float(vloss)
                        beat()
                        tp += int(btp); fp += int(bfp); fn_ += int(bfn)
                        vn += 1
                        if vn >= args.val_batches:
                            break
                vloss = vtotal / max(1, vn)
                f1 = 2 * tp / max(1, 2 * tp + fp + fn_)
                line += f" val_loss={vloss:.4f} val_frame_f1={f1:.4f}"
                if vloss < best_val:
                    best_val, best_params, best_epoch = vloss, params, epoch
                    ops.on_best(best_params, best_val, epoch)
            print(line, flush=True)
            with open(log_path, "a") as f:
                f.write(line + "\n")
            if (args.early_stop_patience
                    and (val_loader is not None or val_dev is not None)
                    and epoch - best_epoch >= args.early_stop_patience):
                print(f"Early stop: no val improvement since epoch {best_epoch} "
                      f"(patience {args.early_stop_patience})")
                break
    finally:
        ops.finish(params, best_params, best_val, best_epoch)
    return 0


def transplant_encoder(variables, ckpt_path, model_cfg):
    """Copy encoder subtrees from a --pretrain_frames checkpoint into the AST
    model's params (geometry must match; shapes are verified leaf by leaf)."""
    import json

    import jax

    from music_transcription_tpu.models.transformer import encoder_param_subtrees
    from music_transcription_tpu.train.checkpoints import load_checkpoint

    sidecar_path = os.path.join(ckpt_path, "config.json")
    if os.path.isfile(sidecar_path):
        pre = json.load(open(sidecar_path)).get("pretrain_encoder")
        if pre:
            for k, want in (
                ("encoder_layers", model_cfg.encoder_layers),
                ("encoder_dim", model_cfg.encoder_dim),
                ("encoder_heads", model_cfg.encoder_heads),
                ("patch_frames", model_cfg.patch_frames),
                ("encoder_n_mels", model_cfg.encoder_n_mels),
            ):
                if pre.get(k, want) != want:
                    raise SystemExit(
                        f"Error: --encoder_init geometry mismatch: checkpoint "
                        f"{k}={pre.get(k)} vs model {k}={want}. Pass matching "
                        f"--{k} flags.")
    target = encoder_param_subtrees(variables["params"])
    if not target:
        raise SystemExit("Error: --encoder_init with --mock_encoder: the mock "
                         "encoder has no parameters to initialize.")
    # load with a like-tree restricted to the encoder subtrees + frame_head
    # (the pretrain checkpoint also stores frame_head, which the AST model
    # does not have — restore only what transplants)
    payload = load_checkpoint(ckpt_path)
    src = payload["params"]
    out = dict(variables["params"])
    import numpy as np

    for k, sub in target.items():
        if k not in src:
            raise SystemExit(f"Error: --encoder_init checkpoint lacks encoder "
                             f"subtree '{k}' (is this a --pretrain_frames "
                             f"checkpoint?)")
        want_shapes = jax.tree.map(lambda a: a.shape, sub)
        got_shapes = jax.tree.map(lambda a: a.shape, src[k])
        if want_shapes != got_shapes:
            raise SystemExit(
                f"Error: --encoder_init subtree '{k}' shape mismatch: "
                f"{got_shapes} vs model {want_shapes}")
        out[k] = jax.tree.map(lambda a: np.asarray(a), src[k])
    return {**variables, "params": out}


class _RunOps:
    """Wedge-proofing shared by both training loops: stall watchdog +
    cadenced best-state flush (see --stall_timeout / --save_best_every).
    One implementation so a fix to the cadence or the disarm ordering can
    never apply to one loop and miss the other."""

    def __init__(self, args, save, metric_name="val_loss", sign=1.0):
        self.watchdog = None
        if args.stall_timeout:
            from music_transcription_tpu.train.watchdog import StallWatchdog

            self.watchdog = StallWatchdog(args.stall_timeout)
        self.every = args.save_best_every
        self.save = save
        # best-state selection is always lower-is-better on the tracked
        # score; metrics where higher is better (note_f1) are tracked
        # negated, so displaying uses sign = -1
        self.metric_name, self.sign = metric_name, sign
        self.flushed_val = float("inf")
        self.last_flush_epoch = -(10**9)

    def beat(self):
        if self.watchdog is not None:
            self.watchdog.beat()

    def on_best(self, best_params, best_val, epoch):
        """Call on a val improvement: flush at most every N epochs."""
        if self.every and epoch - self.last_flush_epoch >= self.every:
            self.save("model_best", best_params)
            self.flushed_val, self.last_flush_epoch = best_val, epoch

    def finish(self, params, best_params, best_val, best_epoch):
        """The loop's finally: clean end OR abort (Ctrl-C, NaN) must flush
        the device-resident best state (train/loop.py's _flush_best)."""
        # disarm BEFORE the exit saves: they are legitimately slow over the
        # tunneled host link and must not trip a stall exit mid-flush
        if self.watchdog is not None:
            self.watchdog.stop()
        self.save("model_final", params)
        if best_params is not None:
            print(f"Best {self.metric_name} {self.sign * best_val:.4f} "
                  f"at epoch {best_epoch}")
            if best_val < self.flushed_val:  # cadence may already hold it
                self.save("model_best", best_params)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.save_best_every and not args.val_split:
        raise SystemExit(
            "Error: --save_best_every needs --val_split — the cadence "
            "flushes the best-validation-CE params, and without validation "
            "tracking there is never a best state to flush (a wedged run "
            "would silently lose everything, the exact failure the flag "
            "exists to bound).")
    if args.val_note_f1_every and not args.val_split:
        raise SystemExit(
            "Error: --val_note_f1_every needs --val_split — generation "
            "validation runs on validation batches.")
    if args.best_metric == "note_f1" and not args.val_note_f1_every:
        raise SystemExit(
            "Error: --best_metric note_f1 needs --val_note_f1_every N — "
            "the metric only exists on epochs where generation validation "
            "runs.")
    if args.val_note_f1_every and args.pretrain_frames:
        raise SystemExit(
            "Error: --val_note_f1_every is a token-route metric; the "
            "--pretrain_frames loop already tracks val_frame_f1 every epoch.")
    subset = None if args.subset_size in ("all", "0") else int(args.subset_size)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from music_transcription_tpu.train.loop import install_graceful_sigterm

    install_graceful_sigterm()  # `kill <pid>` flushes model_best like Ctrl-C

    if args.pretrain_frames:
        return pretrain_main(args, subset)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from music_transcription_tpu.config import AudioConfig, ModelConfig
    from music_transcription_tpu.data.cache import CachedMaestroDataset, metadata_path
    from music_transcription_tpu.data.maestro import MaestroDataset
    from music_transcription_tpu.data.pipeline import Loader, collate_tokens
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer
    from music_transcription_tpu.models.transcription import TranscriptionModel
    from music_transcription_tpu.train.checkpoints import save_checkpoint

    audio_cfg = AudioConfig(chunk_length=args.chunk_length)
    if args.tokenizer == "event":
        from music_transcription_tpu.models.event_tokenizer import EventMIDITokenizer

        tokenizer = EventMIDITokenizer(vocab_size=args.remi_vocab_size,
                                       frame_rate=audio_cfg.frame_rate)
    else:
        tokenizer = REMITokenizer(vocab_size=args.remi_vocab_size)

    def check_cache_meta(meta, split):
        """AST needs waveforms: a mel cache or mismatched chunking would
        silently mis-pair audio and tokens (train_cnn validates the same
        class of conflicts; mirror that here — for the train AND val splits,
        a mismatched val cache corrupts the CE that selects model_best)."""
        if not (meta.get("return_waveform") or meta.get("tokenize")):
            raise SystemExit(
                f"Error: cache {args.cache_dir} (split '{split}') holds mel "
                f"features; the AST model needs a --waveform (or --tokenize) "
                f"cache.")
        if meta.get("chunk_length") not in (None, args.chunk_length):
            raise SystemExit(
                f"Error: cache (split '{split}') chunk_length="
                f"{meta.get('chunk_length')}s does not match --chunk_length "
                f"{args.chunk_length}.")
        tokenized = meta.get("tokenize", False)
        if tokenized and args.tokenizer != "remi":
            raise SystemExit(
                f"Error: pre-tokenized caches are REMI-encoded (split "
                f"'{split}'); use --tokenizer remi or a waveform cache.")
        return tokenized

    if args.cache_dir and os.path.exists(metadata_path(args.cache_dir, args.split)):
        dataset = CachedMaestroDataset(args.cache_dir, args.split,
                                       subset_size=subset)
        pretokenized = check_cache_meta(dataset.metadata, args.split)
    else:
        if args.cache_dir:
            print(f"Warning: no cache metadata at {args.cache_dir} for split "
                  f"'{args.split}'; falling back to the raw dataset at "
                  f"{args.root_dir}")
        dataset = MaestroDataset(
            args.root_dir, split=args.split,
            year=None if args.year in (None, "all") else args.year,
            chunk_length=args.chunk_length, overlap=args.chunk_overlap,
            subset_size=subset, return_waveform=True, audio_cfg=audio_cfg,
        )
        pretokenized = False
    print(f"Train set: {len(dataset)} chunks (pretokenized={pretokenized})")

    if args.sanity_checks and not pretokenized:
        run_sanity_checks(dataset, tokenizer, args.sanity_max_len)

    class TokenizingView:
        """waveform+roll -> waveform+tokens on the fly (collate_ast role)."""

        def __init__(self, ds, tokenized=None):
            self.ds = ds
            self.tokenized = pretokenized if tokenized is None else tokenized

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            wave, second = self.ds[i]
            if self.tokenized:
                return wave, second
            tokens = tokenizer.encode_from_pianoroll(second, max_len=args.max_token_len)
            return wave, np.asarray(tokens, np.int64)

    # Transfer-once feeding when the data fits in HBM (see --device_data /
    # pipeline.DeviceStagedLoader; both loops here use drop_last, so the
    # staged loader never pads — tokens are safe as the last field)
    wave_bytes = 2 if args.compact_data else 4
    est_bytes = len(dataset) * (wave_bytes * audio_cfg.chunk_samples
                                + 8 * args.max_token_len)
    staged = args.device_data == "on" or (
        args.device_data == "auto"
        and jax.devices()[0].platform != "cpu"
        and est_bytes < 11e9)
    loader_cls = Loader
    staged_kw = {}
    if staged:
        from music_transcription_tpu.data.pipeline import DeviceStagedLoader

        loader_cls = DeviceStagedLoader
        if args.compact_data:
            staged_kw["compact_fields"] = (0,)  # the waveform field
    loader = loader_cls(
        TokenizingView(dataset), args.batch_size, shuffle=True, seed=args.seed,
        num_workers=4, drop_last=True, collate=collate_tokens,
        pad_to=audio_cfg.chunk_samples, **staged_kw,
    )

    model_cfg = ModelConfig(
        model_type="ast", dropout=args.dropout, remi_vocab_size=args.remi_vocab_size,
        decoder_layers=args.decoder_layers, decoder_dim=args.decoder_dim,
        decoder_heads=args.decoder_heads,
        encoder_layers=args.encoder_layers, encoder_dim=args.encoder_dim,
        encoder_heads=args.encoder_heads, patch_frames=args.patch_frames,
        encoder_n_mels=args.encoder_n_mels, use_mock_encoder=args.mock_encoder,
        freeze_encoder=args.freeze_encoder, tokenizer=args.tokenizer,
    )
    model = TranscriptionModel(model_cfg)
    sample_wave = jnp.zeros((1, audio_cfg.chunk_samples), jnp.float32)
    variables = model.init(jax.random.key(args.seed), sample_wave)
    if args.encoder_init:
        variables = transplant_encoder(variables, args.encoder_init, model_cfg)
        print(f"Initialized encoder from {args.encoder_init}"
              + (" (frozen)" if args.freeze_encoder else ""))
    if args.resume:
        from music_transcription_tpu.train.checkpoints import load_checkpoint

        # weight-only resume (cold Adam moments — same semantics as the
        # reference's .pth resume in train_cnn)
        payload = load_checkpoint(args.resume, like={"params": variables["params"]})
        variables = {**variables, "params": payload["params"]}
        print(f"Resumed params from {args.resume}")
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    use_ss = args.scheduled_sampling > 0.0

    # --pitch_loss_weight: per-class CE weights on NOTE_ON/NOTE_OFF targets
    # (None = the model's plain token CE; val CE below stays unweighted)
    class_w = None
    if args.pitch_loss_weight != 1.0:
        import numpy as _np

        w = _np.ones(args.remi_vocab_size, _np.float32)
        w[tokenizer.note_token_mask()] = args.pitch_loss_weight
        class_w = jnp.asarray(w)

    @jax.jit
    def step(params, opt_state, wave, tokens, rng, ss_p):
        def loss_fn(p):
            # Next-token objective: the decoder consumes tokens[:, :-1] and
            # predicts tokens[:, 1:]. (The reference trains UNSHIFTED —
            # logits at t scored against the token just fed at t — which a
            # decoder solves by copying its input and never learns
            # generation; fixed here deliberately.)
            inp = tokens[:, :-1]
            if use_ss:
                # Scheduled sampling: a gradient-stopped teacher-forced pass
                # produces the model's own next-token argmax; with prob ss_p
                # each input position (never the <sos>) is replaced by that
                # prediction, so training sees the mistake distribution
                # generation will actually condition on.
                tf_logits = model.module.apply(
                    {"params": p}, wave, targets=inp, train=False)
                # logits[:, t] predicts tokens[:, t+1] == inp[:, t+1]
                pred_in = jnp.concatenate(
                    [inp[:, :1],
                     jnp.argmax(tf_logits[:, :-1], -1).astype(inp.dtype)], 1)
                pred_in = jax.lax.stop_gradient(pred_in)
                mix_rng, _ = jax.random.split(jax.random.fold_in(rng, 1))
                mask = jax.random.bernoulli(mix_rng, ss_p, inp.shape)
                mask = mask.at[:, 0].set(False)
                inp = jnp.where(mask, pred_in, inp)
            logits = model.module.apply(
                {"params": p}, wave, targets=inp, train=True,
                rngs={"dropout": rng},
            )
            if class_w is not None:
                from music_transcription_tpu.ops.losses import token_cross_entropy

                return token_cross_entropy(logits, tokens[:, 1:],
                                           class_weights=class_w)
            return model.loss(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, wave, tokens):
        logits = model.module.apply(
            {"params": params}, wave, targets=tokens[:, :-1], train=False)
        return model.loss(logits, tokens[:, 1:])

    val_loader = None
    if args.val_split:
        val_tokenized = False
        if args.cache_dir and os.path.exists(metadata_path(args.cache_dir, args.val_split)):
            val_ds = CachedMaestroDataset(args.cache_dir, args.val_split)
            val_tokenized = check_cache_meta(val_ds.metadata, args.val_split)
        else:
            val_ds = MaestroDataset(
                args.root_dir, split=args.val_split,
                chunk_length=args.chunk_length, overlap=0.0,
                return_waveform=True, audio_cfg=audio_cfg)
        if len(val_ds) < args.batch_size:
            # drop_last=True would yield zero val batches -> val_loss 0.0
            # silently becomes best_val on epoch 1 and drives early stop
            raise SystemExit(
                f"Error: --val_split '{args.val_split}' has {len(val_ds)} "
                f"chunks < batch_size {args.batch_size}; validation would "
                f"see zero batches. Shrink --batch_size or use more data.")
        val_kw = {}
        if staged:
            # only the first val_batches * batch_size chunks are ever scored
            val_kw["limit"] = args.val_batches * args.batch_size
        val_loader = loader_cls(
            TokenizingView(val_ds, tokenized=val_tokenized), args.batch_size, shuffle=False,
            seed=args.seed, num_workers=2, drop_last=True,
            collate=collate_tokens, pad_to=audio_cfg.chunk_samples,
            **val_kw, **staged_kw)
        print(f"Validation set: {len(val_ds)} chunks "
              f"(up to {args.val_batches} batches/epoch)")

    run_dir = args.run_dir or os.path.join(
        "outputs", "ast_" + datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(run_dir, exist_ok=True)
    params = variables["params"]
    rng = jax.random.key(args.seed + 1)
    best_val, best_params, best_epoch = float("inf"), None, 0
    log_path = os.path.join(run_dir, "training_log.txt")

    import json

    from music_transcription_tpu.config import config_to_dict

    sidecar = {"model": config_to_dict(model_cfg), "audio": config_to_dict(audio_cfg)}

    def save(name, p):
        ckpt = os.path.join(run_dir, name)
        save_checkpoint(ckpt, {"params": jax.tree.map(np.asarray, p)})
        with open(os.path.join(ckpt, "config.json"), "w") as f:
            json.dump(sidecar, f)
        print(f"Saved {ckpt}")

    by_f1 = args.best_metric == "note_f1"
    ops = _RunOps(args, save,
                  metric_name="val_note_f1" if by_f1 else "val_loss",
                  sign=-1.0 if by_f1 else 1.0)

    gen_val = None
    if args.val_note_f1_every:
        from music_transcription_tpu.eval import (
            decode_tokens_to_notes,
            note_f1,
            trim_tokens,
        )

        # one jitted generation program for the whole run (fixed batch and
        # token-budget shapes; the tunneled backend pays one compile)
        gen_fn = jax.jit(lambda p, w: model.module.apply(
            {"params": p}, w, targets=None, train=False,
            generate_max_len=args.max_token_len))

        def gen_val(params):
            """Micro note-F1 of free-running generation on the first
            --val_note_f1_batches validation batches (same matching and
            tolerances as scripts/evaluate_ast.py defaults: onset 0.1 s,
            pitch 0.5 — numbers are comparable across the two surfaces)."""
            tot = {"tp": 0, "fp": 0, "fn": 0}
            bn = 0
            for wave, tokens in val_loader:
                gen = np.asarray(gen_fn(params, jnp.asarray(wave)))
                ops.beat()
                for g, t in zip(gen, np.asarray(tokens)):
                    notes = [
                        decode_tokens_to_notes(
                            trim_tokens(seq.tolist(), eos_id=tokenizer.eos,
                                        pad_id=tokenizer.pad),
                            tokenizer, frame_rate=audio_cfg.frame_rate)
                        for seq in (g, t)
                    ]
                    m = note_f1(notes[0], notes[1], onset_tol=0.1, pitch_tol=0.5)
                    for k in tot:
                        tot[k] += m[k]
                bn += 1
                if bn >= args.val_note_f1_batches:
                    break
            prec = tot["tp"] / (tot["tp"] + tot["fp"] + 1e-9)
            rec = tot["tp"] / (tot["tp"] + tot["fn"] + 1e-9)
            return 2 * prec * rec / (prec + rec + 1e-9)

    try:
        for epoch in range(1, args.epochs + 1):
            total, n = 0.0, 0
            # linear ramp 0 -> scheduled_sampling over ss_ramp_epochs
            ss_p = args.scheduled_sampling * min(
                1.0, epoch / max(1, args.ss_ramp_epochs))
            for wave, tokens in loader:
                tk = np.asarray(tokens)
                if tk.min() < 0 or tk.max() >= args.remi_vocab_size:
                    # reference transformer_draft.ipynb cell 7 assert_tokens_ok
                    raise ValueError(
                        f"Token id out of range: min={tk.min()}, max={tk.max()}, "
                        f"vocab={args.remi_vocab_size}"
                    )
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(wave), jnp.asarray(tokens),
                    sub, jnp.float32(ss_p),
                )
                total += float(loss)  # device fetch: blocks on the RPC
                ops.beat()
                n += 1
            line = f"Epoch {epoch}/{args.epochs}: train_loss={total / max(1, n):.4f}"
            if use_ss:
                line += f" ss_p={ss_p:.2f}"
            if val_loader is not None:
                vtotal, vn = 0.0, 0
                for wave, tokens in val_loader:
                    vtotal += float(eval_step(params, jnp.asarray(wave),
                                              jnp.asarray(tokens)))
                    ops.beat()
                    vn += 1
                    if vn >= args.val_batches:
                        break
                vloss = vtotal / max(1, vn)
                line += f" val_loss={vloss:.4f}"
                score = vloss
                # the final epoch always computes the selection metric when
                # note-F1 selects model_best: a cadence longer than the run
                # (epochs < every) must still produce a best checkpoint
                force_f1 = by_f1 and epoch == args.epochs
                if gen_val is not None and (
                        epoch % args.val_note_f1_every == 0 or force_f1):
                    nf1 = gen_val(params)
                    line += f" val_note_f1={nf1:.4f}"
                    if by_f1:
                        score = -nf1
                elif by_f1:
                    score = None  # the selection metric was not computed
                if score is not None and score < best_val:
                    # retain on device (arrays are immutable; no copy needed),
                    # flush at the --save_best_every cadence + once at exit —
                    # per-epoch orbax saves over the tunneled host link cost
                    # ~60 s each (train_cnn's --save_best_every rationale)
                    best_val, best_params, best_epoch = score, params, epoch
                    ops.on_best(best_params, best_val, epoch)
            print(line)
            with open(log_path, "a") as f:
                f.write(line + "\n")
            if (args.early_stop_patience and val_loader is not None
                    and epoch - best_epoch >= args.early_stop_patience):
                print(f"Early stop: no val improvement since epoch {best_epoch} "
                      f"(patience {args.early_stop_patience})")
                break
    finally:
        ops.finish(params, best_params, best_val, best_epoch)
    return 0


if __name__ == "__main__":
    sys.exit(main())
