"""music_transcription_tpu — a TPU-native automatic piano-transcription framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch pipeline (cs4247/music-transcription): audio -> log-mel -> framewise
88-key piano-roll -> MIDI, trained on MAESTRO.

Layering (bottom-up):
  ops/       pure jittable numerics: log-mel frontend, LSTM scan, attention,
             framewise metrics, Pallas kernels for the hot paths
  models/    flax model definitions (CNNRNN, CNNRNNLarge, AST) + the unified
             TranscriptionModel wrapper (loss / predict semantics of the
             reference models/transcription_model.py)
  data/      MAESTRO metadata, chunk indexing, preprocessing cache, host
             audio/MIDI substrate (WAV decode, resample, MIDI parse/write)
  parallel/  device mesh + sharding policy (data-parallel training over ICI,
             batch-sharded chunk inference)
  train/     training loop, optax optimization, orbax checkpoints, metrics

Public CLI surface mirrors the reference: main.py (transcribe),
scripts/{train_cnn,evaluate,preprocess_dataset,train_ast}.py, example.sh.
"""

__version__ = "0.1.0"

from music_transcription_tpu.config import (  # noqa: F401
    AudioConfig,
    ModelConfig,
    TrainConfig,
)
