#!/usr/bin/env bash
# End-to-end workflow driver (reference example.sh:22-280 surface):
#   ./example.sh preprocess   # cache the dataset (background)
#   ./example.sh train        # train on the cache (background)
#   ./example.sh eval         # evaluate the latest run's best checkpoint
#   ./example.sh all          # the whole pipeline, with confirmations
set -euo pipefail

# ------------------------- configuration (edit here) -------------------------
ROOT_DIR="${ROOT_DIR:-maestro-v3.0.0}"
N_MELS="${N_MELS:-320}"
CACHE_DIR="${CACHE_DIR:-cached_dataset_mels${N_MELS}}"
MODEL_TYPE="${MODEL_TYPE:-cnn_rnn_large}"
EPOCHS="${EPOCHS:-100}"
BATCH_SIZE="${BATCH_SIZE:-24}"
LR="${LR:-1e-4}"
CHUNK_LENGTH="${CHUNK_LENGTH:-30.0}"
HIDDEN_SIZE="${HIDDEN_SIZE:-512}"
NUM_LAYERS="${NUM_LAYERS:-3}"
OUT_ROOT="${OUT_ROOT:-outputs}"
NUM_WORKERS="${NUM_WORKERS:-8}"
EVAL_SPLIT="${EVAL_SPLIT:-test}"
PYTHON="${PYTHON:-python}"

here="$(cd "$(dirname "$0")" && pwd)"

confirm() {
    read -r -p "$1 [y/N] " ans
    [[ "$ans" == "y" || "$ans" == "Y" ]]
}

run_preprocess() {
    echo "=== Preprocessing ${ROOT_DIR} -> ${CACHE_DIR} (n_mels=${N_MELS}) ==="
    echo "Note: a full MAESTRO mel cache at n_mels=320 needs tens of GB of disk."
    "$PYTHON" "$here/scripts/preprocess_dataset.py" \
        --root_dir "$ROOT_DIR" --cache_dir "$CACHE_DIR" \
        --n_mels "$N_MELS" --chunk_length "$CHUNK_LENGTH" \
        --num_workers "$NUM_WORKERS" --verify --background
}

run_train() {
    if [[ ! -d "$CACHE_DIR" ]]; then
        echo "Warning: cache $CACHE_DIR not found; training will fall back to raw loading."
    fi
    echo "=== Training ${MODEL_TYPE} for ${EPOCHS} epochs (bs ${BATCH_SIZE}) ==="
    "$PYTHON" "$here/scripts/train_cnn.py" \
        --root_dir "$ROOT_DIR" --cache_dir "$CACHE_DIR" \
        --model_type "$MODEL_TYPE" --n_mels "$N_MELS" \
        --hidden_size "$HIDDEN_SIZE" --num_layers "$NUM_LAYERS" \
        --epochs "$EPOCHS" --batch_size "$BATCH_SIZE" --lr "$LR" \
        --chunk_length "$CHUNK_LENGTH" --num_workers "$NUM_WORKERS" \
        --out_root "$OUT_ROOT" --background
}

latest_checkpoint() {
    # newest run dir with a best (fallback: final) checkpoint
    local run best
    run=$(ls -1dt "$OUT_ROOT"/*/ 2>/dev/null | head -1 || true)
    [[ -z "$run" ]] && return 1
    best="$run/checkpoints/model_best"
    [[ -d "$best" ]] || best="$run/checkpoints/model_final"
    [[ -d "$best" ]] || return 1
    echo "$best"
}

run_eval() {
    local ckpt
    if ! ckpt=$(latest_checkpoint); then
        echo "Error: no trained checkpoint found under $OUT_ROOT/"
        exit 1
    fi
    echo "=== Evaluating $ckpt on split '$EVAL_SPLIT' (threshold tuning) ==="
    "$PYTHON" "$here/scripts/evaluate.py" \
        --model "$ckpt" --split "$EVAL_SPLIT" \
        --cache_dir "$CACHE_DIR" --root_dir "$ROOT_DIR" \
        --tune_threshold
}

run_all() {
    confirm "Run preprocessing (background)?" && run_preprocess
    confirm "Run training (background)? (wait for preprocessing to finish first)" && run_train
    confirm "Run evaluation now? (requires a finished training run)" && run_eval
}

case "${1:-}" in
    preprocess) run_preprocess ;;
    train) run_train ;;
    eval) run_eval ;;
    all) run_all ;;
    *)
        echo "Usage: $0 {preprocess|train|eval|all}"
        echo "Config via env vars: ROOT_DIR N_MELS CACHE_DIR MODEL_TYPE EPOCHS BATCH_SIZE ..."
        exit 1
        ;;
esac
