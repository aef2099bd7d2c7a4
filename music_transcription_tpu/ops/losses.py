"""Loss functions with the reference's exact semantics.

Re-implements reference models/transcription_model.py:110-217 as pure
jittable functions:

  * numerically-stable BCE-with-logits
  * length-masked mean with denominator ``mask.sum() * 88`` (clamped >= 1)
  * torch ``F.interpolate(mode='linear', align_corners=False)`` time
    resampling of logits when T_logits != T_targets
  * multi-head loss 0.5*frame + 0.25*onset + 0.25*offset with onset/offset
    targets derived from frame-target diffs (clamp(diff, min=0) and
    clamp(-diff, min=0))
  * token cross-entropy with ignore_index=2 (<pad>) for the AST tier
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_TOKEN = 2  # REMI <pad> (reference models/remi_tokenizer.py:26)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (stable log-sum-exp form)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def interpolate_time_linear(x: jnp.ndarray, out_t: int) -> jnp.ndarray:
    """(B, P, T_in) -> (B, P, out_t), torch F.interpolate(mode='linear',
    align_corners=False) semantics (reference models/transcription_model.py:139-141)."""
    in_t = x.shape[-1]
    if in_t == out_t:
        return x
    scale = in_t / out_t
    pos = (jnp.arange(out_t, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_t - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_t - 1)
    w = pos - lo.astype(jnp.float32)
    return x[..., lo] * (1.0 - w) + x[..., hi] * w


def _length_mask(lengths: jnp.ndarray | None, b: int, t: int) -> jnp.ndarray | None:
    if lengths is None:
        return None
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)  # (B, T)


def masked_bce_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Single-head frame loss (reference models/transcription_model.py:137-162).

    logits (B, P, T'), targets (B, P, T): logits are linearly resampled to T
    if needed; with lengths, padded frames are masked and the mean divides by
    mask.sum() * P (clamped to >= 1).
    """
    b, p, t = targets.shape
    logits = interpolate_time_linear(logits, t)
    per_elem = bce_with_logits(logits, targets)
    mask = _length_mask(lengths, b, t)
    if mask is None:
        return per_elem.mean()
    masked = per_elem * mask[:, None, :]
    denom = jnp.maximum(mask.sum() * p, 1.0)
    return masked.sum() / denom


def derive_onset_offset_targets(targets: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frame targets (B, P, T) -> (onset, offset) targets
    (reference models/transcription_model.py:178-185): onset[t] = max(y[t]-y[t-1], 0)
    for t >= 1; offset[t] = max(y[t]-y[t+1], 0) for t < T-1; borders zero."""
    t = targets.shape[-1]
    onset = jnp.zeros_like(targets)
    offset = jnp.zeros_like(targets)
    if t > 1:
        diff = targets[..., 1:] - targets[..., :-1]
        onset = onset.at[..., 1:].set(jnp.maximum(diff, 0.0))
        offset = offset.at[..., :-1].set(jnp.maximum(-diff, 0.0))
    return onset, offset


def multi_head_loss(
    logits: dict, targets: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> jnp.ndarray:
    """0.5*frame + 0.25*onset + 0.25*offset
    (reference models/transcription_model.py:164-194)."""
    onset_t, offset_t = derive_onset_offset_targets(targets)
    return (
        0.5 * masked_bce_loss(logits["frame"], targets, lengths)
        + 0.25 * masked_bce_loss(logits["onset"], onset_t, lengths)
        + 0.25 * masked_bce_loss(logits["offset"], offset_t, lengths)
    )


def transcription_loss(logits, targets, lengths=None) -> jnp.ndarray:
    """Dispatch: dict -> multi-head, array -> single-head
    (reference models/transcription_model.py:110-162)."""
    if isinstance(logits, dict):
        return multi_head_loss(logits, targets, lengths)
    return masked_bce_loss(logits, targets, lengths)


def token_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = PAD_TOKEN,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flattened CE with ignore_index (reference models/transcription_model.py:125-131,
    criterion at :84). Mean over non-ignored positions.

    ``class_weights`` — optional (V,) per-target-id weights (torch
    ``CrossEntropyLoss(weight=...)`` semantics: weighted sum over positions
    divided by the sum of the weights at the target ids, so all-ones
    reproduces the unweighted mean exactly). Used by train_ast's
    ``--pitch_loss_weight`` to upweight NOTE_ON/NOTE_OFF targets — the
    measured AST failure mode is CE improving on timing/structure tokens
    while pitched-note accuracy stalls."""
    v = logits.shape[-1]
    logits = logits.reshape(-1, v).astype(jnp.float32)
    targets = targets.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    keep = (targets != ignore_index).astype(jnp.float32)
    if class_weights is not None:
        keep = keep * class_weights.astype(jnp.float32)[targets]
    return (nll * keep).sum() / jnp.maximum(keep.sum(), 1.0)
