"""Typed configuration layer.

The reference scatters its configuration across module constants
(reference main.py:16-24), argparse groups (reference scripts/train_cnn.py:65-119)
and cache metadata pickles. Here every subsystem consumes one of three frozen
dataclasses, and cross-artifact compatibility (cache vs model vs request) is
*validated*, never silently coerced — the same convention the reference
enforces at scripts/train_cnn.py:208-225 and scripts/evaluate.py:175-236.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping

# The piano-roll "ABI" shared by every layer (reference data/dataset.py:141-146):
# 88 keys, MIDI notes 21..108 (A0..C8).
NUM_KEYS = 88
MIN_MIDI = 21


@dataclass(frozen=True)
class AudioConfig:
    """Audio frontend configuration.

    Defaults reproduce the reference's shipped configuration
    (reference main.py:16-24): sr=16000, hop=512, n_mels=320, 30 s chunks.
    ``frame_rate`` is the piano-roll frame rate, 31.25 fps (main.py:274).
    """

    sample_rate: int = 16000
    hop_length: int = 512
    n_fft: int = 2048
    win_length: int | None = None  # defaults to n_fft (librosa semantics)
    n_mels: int = 320
    fmin: float = 0.0
    fmax: float | None = None  # defaults to sample_rate / 2
    chunk_length: float = 30.0
    power: float = 2.0
    top_db: float = 80.0
    amin: float = 1e-10

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    @property
    def chunk_samples(self) -> int:
        return int(self.chunk_length * self.sample_rate)

    @property
    def mel_frames_per_chunk(self) -> int:
        # librosa center=True: 1 + n_samples // hop  (938 for the default config)
        return 1 + self.chunk_samples // self.hop_length

    @property
    def roll_frames_per_chunk(self) -> int:
        # np.linspace over int(chunk_length * frame_rate) points
        # (reference data/dataset.py:141-144) -> 937 for the default config.
        return int(self.chunk_length * self.frame_rate)

    @property
    def effective_fmax(self) -> float:
        return self.sample_rate / 2.0 if self.fmax is None else self.fmax

    @property
    def effective_win_length(self) -> int:
        return self.n_fft if self.win_length is None else self.win_length


@dataclass(frozen=True)
class ModelConfig:
    """Model architecture configuration.

    Mirrors the constructor surface of the reference unified wrapper
    (reference models/transcription_model.py:26-79).
    """

    model_type: str = "cnn_rnn_large"  # cnn_rnn | cnn_rnn_large | ast
    n_mels: int = 320
    hidden_size: int = 512
    num_layers: int = 3
    dropout: float = 0.2
    use_attention: bool = True
    use_onset_offset_heads: bool = True
    num_attention_heads: int = 8
    # AST-specific (reference models/transformer_model.py:33-45)
    remi_vocab_size: int = 512
    # Token vocabulary: "remi" (models/remi_tokenizer.py) or "event"
    # (models/event_tokenizer.py). Both share ids < 512 but their ranges
    # MEAN different things — persisted here so checkpoints decode with the
    # vocabulary they were trained on.
    tokenizer: str = "remi"
    decoder_layers: int = 4
    decoder_dim: int = 384
    decoder_heads: int = 6
    max_output_len: int = 1024
    # AST mel-patch encoder geometry (models/transformer.py). encoder_n_mels
    # is the encoder's own mel frontend resolution — independent of the
    # CNN-tier ``n_mels`` above.
    encoder_layers: int = 4
    encoder_dim: int = 384
    encoder_heads: int = 6
    patch_frames: int = 4
    encoder_n_mels: int = 128
    use_mock_encoder: bool = False
    # The reference freezes its *pretrained* encoder; ours trains from
    # scratch (no pretrained weights fetchable), so freezing would cap the
    # model at random-feature quality — default False, opt in explicitly.
    freeze_encoder: bool = False
    # TPU-native numerics policy: bf16 matmul/conv compute, fp32 params and
    # fp32 recurrent carries (analogue of the reference's FP32-LSTM AMP rule,
    # reference models/cnn_rnn_model.py:69,309).
    compute_dtype: str = "bfloat16"
    # LSTM recurrence backend: "scan" (lax.scan; shardable under SPMD) or
    # "pallas" (fused TPU kernels, single-device; differentiable via a
    # custom-VJP backward-through-time kernel).
    lstm_backend: str = "scan"
    # Attention backend: "xla", "pallas" (clamped flash kernel, fwd + custom
    # VJP bwd), or "auto" (flash past the measured T crossover, else xla).
    attention_backend: str = "xla"

    def __post_init__(self):
        canon = canonical_model_type(self.model_type)
        object.__setattr__(self, "model_type", canon)

    @property
    def is_ast(self) -> bool:
        return self.model_type == "ast"

    @property
    def is_large(self) -> bool:
        return self.model_type == "cnn_rnn_large"


def canonical_model_type(model_type: str) -> str:
    """Normalize model-type aliases (reference models/transcription_model.py:44-79)."""
    mt = model_type.lower()
    if mt in ("cnn_rnn", "cnn+rnn"):
        return "cnn_rnn"
    if mt in ("cnn_rnn_large", "large"):
        return "cnn_rnn_large"
    if mt in ("ast", "transformer", "audio_transformer"):
        return "ast"
    raise ValueError(f"Unknown model type: {model_type}")


@dataclass(frozen=True)
class TrainConfig:
    """Training configuration.

    Defaults follow the reference recipe (reference scripts/train_cnn.py:290,
    example.sh:29-36): Adam(lr=1e-4, eps=1e-8, weight_decay=1e-5), global-norm
    clip 1.0, 100 epochs, batch 24.
    """

    epochs: int = 100
    batch_size: int = 24
    learning_rate: float = 1e-4
    adam_eps: float = 1e-8
    weight_decay: float = 1e-5
    max_grad_norm: float = 1.0
    chunk_length: float = 30.0
    chunk_overlap: float = 0.0
    save_every: int = 5
    # model_best WRITE cadence: the loop always retains the true best state
    # (device-resident copy, exact), but flushes it to disk at most every k
    # epochs plus once at loop exit (clean end OR abort). Early training
    # improves every epoch; on hosts with slow device->host transfer the
    # per-epoch best-writes can dominate wall time (measured ~60 s/epoch vs
    # 0.6 s compute). k=1 = reference per-improvement behavior. The only
    # unsafe window is a hard kill (SIGKILL) between flushes.
    save_best_every: int = 1
    # Stop when validation loss has not improved for this many epochs
    # (0 = run all epochs; the true best state is retained/flushed either
    # way). Extension over the reference, which always runs the full budget.
    early_stop_patience: int = 0
    seed: int = 0
    max_nan_batches: int = 10  # abort after this many NaN/Inf losses
    # Parallelism: number of data-parallel shards; None -> all local devices.
    data_parallel: int | None = None
    # State partitioning: "dp" (replicated state), "zero1" (optimizer state
    # sharded), "fsdp" (params + optimizer state sharded, largest-axis),
    # "tp" (params + optimizer state sharded column-parallel on the feature
    # axis — activations partition over the model axis). Non-dp modes use
    # the compiler-partitioned path (parallel/partitioning.py).
    partitioning: str = "dp"
    # >1 builds a 2-D (data, model) mesh; state shards over the model axis.
    model_parallel: int = 1
    # Dropout PRNG: "auto" -> "rbg" on TPU (hardware RNG path; measured
    # 220.5 -> 213.9 ms/step at bs16 — threefry mask generation is ~3% of
    # the step), "threefry2x32" on CPU (cross-backend reproducible streams).
    # Dropout only consumes the stream, so the impl is not a numerics-parity
    # concern.
    rng_impl: str = "auto"
    # Abort the process when no train/val step completes for this many
    # seconds (0 = off). The tunneled backend can wedge an in-flight RPC
    # permanently; a wedged process can't even flush its best state, so a
    # loud fast exit (train/watchdog.py, code 66) + supervisor resume from
    # the last --save_best_every flush beats a silent hang. Set it above
    # the worst first-step compile (minutes over the remote relay).
    stall_timeout_s: float = 0.0
    # Planned process recycling (0 = off): when host RSS crosses this many
    # GB at an epoch boundary, write a full-resume checkpoint and exit with
    # code 67 (train/watchdog.py RECYCLE_EXIT_CODE). The tunneled axon
    # client retains every H2D payload host-side, so ANY feeding mode's RSS
    # grows without bound over hours (per batch when streaming, per slab
    # under slab rotation); a supervisor loop + `--resume auto` makes the
    # run's effective memory profile a bounded sawtooth instead of an
    # OOM-killer death. No reference counterpart (local CUDA doesn't leak).
    rss_watermark_gb: float = 0.0
    # Host input pipeline
    num_workers: int = 8
    prefetch_batches: int = 2

    def __post_init__(self):
        if self.save_best_every < 1:
            raise ValueError(
                f"save_best_every must be >= 1, got {self.save_best_every}"
            )
        if self.save_every < 0:
            raise ValueError(f"save_every must be >= 0, got {self.save_every}")


# ---------------------------------------------------------------------------
# Compatibility validation (the reference validates, never coerces)
# ---------------------------------------------------------------------------


class CompatibilityError(ValueError):
    """Raised when cache / model / request configurations disagree."""


def validate_compatibility(
    *,
    model_n_mels: int | None = None,
    cache_meta: Mapping[str, Any] | None = None,
    audio: AudioConfig | None = None,
) -> list[str]:
    """Cross-check n_mels / sr / hop / chunk between artifacts.

    Returns a list of warning strings; raises CompatibilityError on hard
    mismatches (the reference's behavior at scripts/train_cnn.py:208-225 and
    scripts/evaluate.py:199-214).
    """
    warnings: list[str] = []
    if cache_meta is not None:
        cache_n_mels = cache_meta.get("n_mels")
        if (
            model_n_mels is not None
            and cache_n_mels is not None
            and not cache_meta.get("return_waveform", False)
            and cache_n_mels != model_n_mels
        ):
            raise CompatibilityError(
                f"Cache n_mels={cache_n_mels} does not match model n_mels="
                f"{model_n_mels}. Re-run preprocessing with --n_mels {model_n_mels} "
                f"or use a matching cache directory."
            )
        if audio is not None:
            for key, want in (
                ("sr", audio.sample_rate),
                ("hop_length", audio.hop_length),
            ):
                have = cache_meta.get(key)
                if have is not None and have != want:
                    raise CompatibilityError(
                        f"Cache {key}={have} does not match requested {key}={want}."
                    )
            have_chunk = cache_meta.get("chunk_length")
            if have_chunk is not None and have_chunk != audio.chunk_length:
                warnings.append(
                    f"Cache chunk_length={have_chunk}s differs from requested "
                    f"{audio.chunk_length}s; the cache will be bypassed and "
                    f"chunks loaded from raw audio (slow)."
                )
    return warnings


# ---------------------------------------------------------------------------
# Serialization helpers (run manifests, cache metadata)
# ---------------------------------------------------------------------------


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def config_from_dict(cls, d: Mapping[str, Any]):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


def dump_run_manifest(path, *, audio=None, model=None, train=None, extra=None):
    """Write a JSON run manifest (the parameters.txt analogue,
    reference scripts/train_cnn.py:228-255)."""
    payload = {}
    if audio is not None:
        payload["audio"] = config_to_dict(audio)
    if model is not None:
        payload["model"] = config_to_dict(model)
    if train is not None:
        payload["train"] = config_to_dict(train)
    if extra:
        payload["extra"] = dict(extra)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.write("\n")
    return payload
