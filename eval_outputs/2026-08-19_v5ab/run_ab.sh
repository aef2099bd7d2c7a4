#!/bin/bash
# Round-5 continuation: reduced-scale AST experiments on the fresh machine.
# Stage 1 (CPU): 10 s waveform+token cache from /root/synth_v5ab.
# Stage 2 (TPU): encoder pretrain -> baseline decoder -> pitch-weighted decoder.
# Sequential so only one first-compile is ever in flight (CLAUDE.md).
set -uo pipefail
cd /root/repo
R=/root/synth_v5ab
C=/root/cache_v5ab_c10
OUT=/root/runs_v5ab
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> /root/run_ab.log; }

log "preprocess start"
python scripts/preprocess_dataset.py --root_dir "$R" --cache_dir "$C" \
    --chunk_length 10 --waveform --tokenize --compact --num_workers 1 \
    >> /root/run_ab.log 2>&1 || { log "preprocess FAILED"; exit 1; }
log "preprocess done"

# Wait for the TPU prober to report recovery.
while ! grep -q RECOVERED /root/tpu_probe.log 2>/dev/null; do sleep 30; done
log "tpu recovered; pretrain start"

run_train() {  # $1 = run_dir; rest = extra train_ast args. Retries resume
  local rd="$1"; shift        # weight-only from the last best flush.
  while :; do
    local extra=()
    [[ -d "$rd/model_best" ]] && extra=(--resume "$rd/model_best")
    timeout 2700 python scripts/train_ast.py \
        --cache_dir "$C" --chunk_length 10 --batch_size 16 --lr 1e-4 \
        --val_split validation --save_best_every 4 --stall_timeout 600 \
        --run_dir "$rd" "${extra[@]}" "$@" >> /root/run_ab.log 2>&1 && break
    log "$rd retry (exit $?)"; sleep 10
  done
  log "$rd done"
}

run_train "$OUT/pretrain" --pretrain_frames --epochs 24 --early_stop_patience 8
log "baseline decoder start"
run_train "$OUT/dec_base" --encoder_init "$OUT/pretrain/model_best" \
    --epochs 30 --early_stop_patience 12 --val_note_f1_every 2 \
    --best_metric note_f1
log "pitch-weighted decoder start"
run_train "$OUT/dec_pitch" --encoder_init "$OUT/pretrain/model_best" \
    --epochs 30 --early_stop_patience 12 --val_note_f1_every 2 \
    --best_metric note_f1 --pitch_loss_weight 3.0
log "ALL DONE"
