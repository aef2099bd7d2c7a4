"""Unified model wrapper — the public model API.

The functional JAX counterpart of the reference's TranscriptionModel
(reference models/transcription_model.py:16-267): model-type dispatch,
loss computation, and thresholded prediction, but with explicit
(variables, rng) state instead of mutable nn.Module state.

Usage:
    model = TranscriptionModel(ModelConfig(model_type="cnn_rnn_large"))
    variables = model.init(jax.random.key(0))
    logits = model.apply(variables, mel)                       # (B, 88, T)
    loss   = model.loss(logits, roll, lengths)
    roll   = model.predict(variables, mel, threshold=0.5)      # binary
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from music_transcription_tpu.config import ModelConfig
from music_transcription_tpu.models.cnn_rnn import CNNRNN, CNNRNNLarge
from music_transcription_tpu.ops import losses


def build_module(cfg: ModelConfig):
    """ModelConfig -> flax module (reference models/transcription_model.py:44-79)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.model_type == "cnn_rnn":
        return CNNRNN(
            n_mels=cfg.n_mels,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            dropout=cfg.dropout,
            compute_dtype=dtype,
            lstm_backend=cfg.lstm_backend,
        )
    if cfg.model_type == "cnn_rnn_large":
        return CNNRNNLarge(
            n_mels=cfg.n_mels,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            dropout=cfg.dropout,
            use_attention=cfg.use_attention,
            use_onset_offset_heads=cfg.use_onset_offset_heads,
            num_attention_heads=cfg.num_attention_heads,
            compute_dtype=dtype,
            lstm_backend=cfg.lstm_backend,
            attention_backend=cfg.attention_backend,
        )
    if cfg.model_type == "ast":
        from music_transcription_tpu.models.transformer import ASTTranscriber

        return ASTTranscriber(
            remi_vocab_size=cfg.remi_vocab_size,
            decoder_layers=cfg.decoder_layers,
            decoder_dim=cfg.decoder_dim,
            decoder_heads=cfg.decoder_heads,
            dropout=cfg.dropout,
            max_output_len=cfg.max_output_len,
            encoder_layers=cfg.encoder_layers,
            encoder_dim=cfg.encoder_dim,
            encoder_heads=cfg.encoder_heads,
            patch_frames=cfg.patch_frames,
            n_mels=cfg.encoder_n_mels,
            use_mock_encoder=cfg.use_mock_encoder,
            freeze_encoder=cfg.freeze_encoder,
            compute_dtype=dtype,
        )
    raise ValueError(f"Unknown model type: {cfg.model_type}")


class TranscriptionModel:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.module = build_module(config)

    # ------------------------------------------------------------- lifecycle
    def example_input(self, batch: int = 1, t: int = 938) -> jnp.ndarray:
        if self.config.is_ast:
            return jnp.zeros((batch, 16000), jnp.float32)  # 1 s of audio
        return jnp.zeros((batch, 1, self.config.n_mels, t), jnp.float32)

    def init(self, rng, sample_input=None) -> dict:
        """Returns the full variables dict: {'params', 'batch_stats'}."""
        if sample_input is None:
            sample_input = self.example_input(t=64)
        kwargs = {}
        if self.config.is_ast:
            kwargs["targets"] = jnp.zeros((sample_input.shape[0], 8), jnp.int32)
        return self.module.init({"params": rng}, sample_input, train=False, **kwargs)

    # --------------------------------------------------------------- forward
    def apply(
        self,
        variables: dict,
        x: jnp.ndarray,
        train: bool = False,
        return_all_heads: bool = False,
        rngs: dict | None = None,
        **kwargs,
    ):
        """Forward pass. When train=True, returns (logits, new_batch_stats)."""
        call_kwargs = dict(kwargs)
        if not self.config.is_ast and (
            self.config.model_type == "cnn_rnn_large" and self.config.use_onset_offset_heads
        ):
            call_kwargs["return_all_heads"] = return_all_heads
        if train:
            out, mutated = self.module.apply(
                variables, x, train=True, rngs=rngs, mutable=["batch_stats"], **call_kwargs
            )
            return out, mutated.get("batch_stats", variables.get("batch_stats", {}))
        return self.module.apply(variables, x, train=False, **call_kwargs)

    # ------------------------------------------------------------------ loss
    def loss(self, logits, targets, lengths=None) -> jnp.ndarray:
        if self.config.is_ast:
            return losses.token_cross_entropy(logits, targets)
        return losses.transcription_loss(logits, targets, lengths)

    # --------------------------------------------------------------- predict
    def predict(self, variables, x, threshold: float = 0.5,
                constrained: bool = False, **kwargs):
        """Binary (B, 88, T) piano roll (reference models/transcription_model.py:219-267).

        ``constrained=True`` (AST route only) applies the trained tokenizer's
        ``transition_mask()`` during generation — grammar-constrained
        decoding, see TranscriptionTransformer.generate."""
        if self.config.is_ast:
            max_t = kwargs.pop("max_T", 1024)  # tokenizer arg, not a model kwarg
            # decode with the vocabulary the checkpoint was trained on
            # (cfg.tokenizer; event and remi ids overlap but mean different
            # things — frame arithmetic is rate-independent either way)
            if getattr(self.config, "tokenizer", "remi") == "event":
                from music_transcription_tpu.models.event_tokenizer import (
                    EventMIDITokenizer,
                )

                tok = EventMIDITokenizer(vocab_size=self.config.remi_vocab_size)
            else:
                from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

                tok = REMITokenizer(vocab_size=self.config.remi_vocab_size)
            if constrained:
                kwargs["allowed_next"] = jnp.asarray(tok.transition_mask())
            token_ids = self.apply(variables, x, train=False, **kwargs)  # (B, L)
            import numpy as np

            rolls = [
                tok.decode_to_pianoroll(list(np.asarray(token_ids[i])), max_t=max_t)
                for i in range(token_ids.shape[0])
            ]
            max_t = max((r.shape[1] for r in rolls), default=0)
            out = np.zeros((len(rolls), 88, max_t), np.float32)
            for i, r in enumerate(rolls):
                out[i, :, : r.shape[1]] = r
            return jnp.asarray(out)
        logits = self.apply(variables, x, train=False, **kwargs)
        probs = jax.nn.sigmoid(logits)
        return (probs > threshold).astype(jnp.float32)

    def jit_forward(self):
        """A jitted eval-mode forward closed over the module (for serving)."""

        @partial(jax.jit, static_argnames=())
        def fwd(variables, x):
            return self.module.apply(variables, x, train=False)

        return fwd


def param_count(variables: dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(variables.get("params", variables)))
