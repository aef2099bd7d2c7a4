"""Optimizer factory matching the reference recipe.

Reference: torch.optim.Adam(lr=1e-4, eps=1e-8, weight_decay=1e-5) with
grad-clip 1.0 applied before the step (reference scripts/train_cnn.py:290,
train/train_transcriber.py:132-134). torch Adam's weight_decay is classic
L2-into-gradient (not AdamW), and clipping happens on the raw gradients, so
the optax chain is: clip_by_global_norm -> add_decayed_weights ->
scale_by_adam -> scale(-lr).
"""

from __future__ import annotations

import optax

from music_transcription_tpu.config import TrainConfig


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    parts = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.adam_eps))
    parts.append(optax.scale(-cfg.learning_rate))
    return optax.chain(*parts)
