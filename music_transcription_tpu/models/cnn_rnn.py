"""CNN-(Bi)LSTM transcription models in flax.linen.

Functional re-designs of the reference architectures with identical math:

  * ``CNNRNN``      — reference models/cnn_rnn_model.py:5-74   (~36M params)
  * ``CNNRNNLarge`` — reference models/cnn_rnn_model.py:142-348 (~89M params)

TPU-first decisions (vs the reference's CUDA/NCHW/cuDNN formulation):

  * Convolutions run in NHWC layout — (B, freq, time, channels) — the native
    TPU conv layout; the public API still accepts the reference's
    (B, 1, n_mels, T) tensors and converts at the boundary.
  * The BiLSTMs are ``lax.scan`` recurrences with the input projection hoisted
    into one large MXU matmul per layer and both directions fused into a
    single scan (ops/lstm.py).
  * Conv/dense compute can run in bfloat16 (``compute_dtype``); LSTM
    recurrences and the attention softmax stay float32 — the same numerics
    discipline as the reference's AMP policy (fp32 LSTMs, clamped attention
    logits, models/cnn_rnn_model.py:69,131,309).
  * Feature flattening preserves the reference's (C-major, then freq) order
    — (B, T, C*F) with index c*F + f — so torch checkpoints convert 1:1.

BatchNorm matches torch semantics: momentum 0.1 on running stats, eps 1e-5.
(The one intentional deviation: flax tracks biased running variance while
torch uses the unbiased estimator — irrelevant for converted checkpoints,
negligible during training.)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_transcription_tpu.config import NUM_KEYS
from music_transcription_tpu.ops.lstm import bilstm_stack


def _maxpool_freq(x: jnp.ndarray) -> jnp.ndarray:
    """(2,1) max-pool over the freq axis of NHWC (floor semantics, VALID).

    Stays on ``nn.max_pool``/reduce_window deliberately: the train-step
    xplane trace prices pooling at 14.6 ms/step (fwd reduce_window 5.4 +
    bwd select-and-scatter 9.1 of a 210 ms step), and a reshape+max-over-
    size-2-axis rewrite (forward element-identical, cheaper compare/select
    backward) was measured SLOWER end-to-end — 239.1 vs 218.7 ms/step — the
    strided (B,F/2,2,T,C) view poisons XLA's layout assignment the same way
    the space-to-depth conv1 experiment did (DESIGN.md).
    """
    return nn.max_pool(x, window_shape=(2, 1), strides=(2, 1), padding="VALID")


class ConvBNRelu(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None  # sync-BN axis under shard_map/pmap

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, padding="SAME", dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
            axis_name=self.bn_axis_name, name="bn",
        )(x.astype(jnp.float32))
        return nn.relu(x).astype(self.dtype)


class ResidualBlock(nn.Module):
    """Residual conv block (reference models/cnn_rnn_model.py:76-99)."""

    features: int
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
            axis_name=self.bn_axis_name, name=name,
        )
        identity = x
        if x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip_conv")(x)
            identity = bn("skip_bn")(identity.astype(jnp.float32))
        out = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out.astype(jnp.float32)))
        out = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(
            out.astype(self.dtype)
        )
        out = bn("bn2")(out.astype(jnp.float32))
        out = nn.relu(out + identity.astype(jnp.float32))
        return out.astype(self.dtype)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with the reference's ±10 logit clamp
    (reference models/cnn_rnn_model.py:102-139)."""

    hidden_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    clip_val: float = 10.0
    dtype: Any = jnp.float32
    # "xla" | "pallas" (flash kernel, differentiable via custom VJP) |
    # "auto" (flash once the fp32 score tensor outgrows HBM headroom)
    backend: str = "xla"
    # Crossover rule for "auto", measured on v5e (d=192, 8 heads, bf16,
    # scripts/bench_attention.py): XLA wins while the (B, H, T, T) fp32
    # scores fit — 938/2048/3072 all favor xla fwd+bwd (3.7/10.0/15.9 ms vs
    # flash 4.7/12.3/22.0) — and collapses once they don't (T=4096, B=2:
    # 2.1 GB scores -> 170 ms vs flash 35.9 ms). Threshold sits between the
    # measured 1.2 GB-fine and 2.1 GB-collapsed points.
    auto_score_bytes: float = 1.5e9

    @nn.compact
    def __call__(self, x, train: bool):
        b, t, c = x.shape
        head_dim = self.hidden_dim // self.num_heads
        qkv = nn.Dense(3 * self.hidden_dim, dtype=self.dtype, name="qkv")(x.astype(self.dtype))
        qkv = qkv.reshape(b, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, H, D)
        scale = head_dim**-0.5
        backend = self.backend
        if backend == "auto":
            score_bytes = 4.0 * b * self.num_heads * t * t  # fp32 softmax
            backend = "pallas" if score_bytes > self.auto_score_bytes else "xla"
        if backend == "pallas":
            from music_transcription_tpu.ops.attention_pallas import flash_attention_clamped

            out = flash_attention_clamped(q, k, v, scale=scale, clip_val=self.clip_val)
            # The kernel has no in-scores dropout; under the flash path the
            # attention dropout moves to the attention OUTPUT (same expected
            # scale, different correlation structure than the reference's
            # on-probabilities placement — exact-parity training uses xla).
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        else:
            attn = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32) * scale
            attn = jnp.clip(attn, -self.clip_val, self.clip_val)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum(
                "bhts,bshd->bthd", attn.astype(self.dtype), v, preferred_element_type=jnp.float32
            )
        out = out.reshape(b, t, self.hidden_dim)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))


class BiLSTMStack(nn.Module):
    """linen wrapper owning the ops/lstm.py parameter pytree."""

    input_size: int
    hidden_size: int
    num_layers: int
    dropout: float = 0.0
    proj_dtype: Any = jnp.float32
    backend: str = "scan"  # "scan" | "pallas" (fused kernels, single-device)

    @nn.compact
    def __call__(self, x, train: bool):
        k = 1.0 / jnp.sqrt(jnp.float32(self.hidden_size))

        def u(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        from music_transcription_tpu.ops.lstm import combined_bias_init

        def b_init(key, shape):
            return combined_bias_init(key, shape, k)

        layers = []
        in_size = self.input_size
        for li in range(self.num_layers):
            layer = {}
            for d in ("fwd", "bwd"):
                layer[f"wi_{d}"] = self.param(f"l{li}_wi_{d}", u, (in_size, 4 * self.hidden_size))
                layer[f"wh_{d}"] = self.param(
                    f"l{li}_wh_{d}", u, (self.hidden_size, 4 * self.hidden_size)
                )
                layer[f"b_{d}"] = self.param(f"l{li}_b_{d}", b_init, (4 * self.hidden_size,))
            layers.append(layer)
            in_size = 2 * self.hidden_size
        rng = self.make_rng("dropout") if (train and self.dropout > 0 and self.num_layers > 1) else None
        if self.backend == "pallas":
            from music_transcription_tpu.ops.lstm_pallas import bilstm_stack_pallas

            return bilstm_stack_pallas(
                x, layers, proj_dtype=self.proj_dtype,
                dropout_rate=self.dropout, deterministic=not train, dropout_rng=rng,
            )
        return bilstm_stack(
            x, layers, dropout_rate=self.dropout, deterministic=not train,
            dropout_rng=rng, proj_dtype=self.proj_dtype,
        )


def _to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Accept (B, 1, n_mels, T) [reference layout] or (B, n_mels, T); return
    (B, n_mels, T, 1) NHWC."""
    if x.ndim == 3:
        x = x[:, None]
    return jnp.transpose(x, (0, 2, 3, 1))


def _flatten_ct(feat: jnp.ndarray) -> jnp.ndarray:
    """NHWC (B, F, T, C) -> (B, T, C*F) with the reference's c*F+f ordering
    (reference models/cnn_rnn_model.py:60-62,292-294)."""
    b, f, t, c = feat.shape
    feat = jnp.transpose(feat, (0, 2, 3, 1))  # (B, T, C, F)
    return feat.reshape(b, t, c * f)


class CNNRNN(nn.Module):
    """Base model: 2 conv blocks -> 3-layer BiLSTM -> Dense(88).

    Input (B, 1, n_mels, T) or (B, n_mels, T); output logits (B, 88, T).
    """

    n_mels: int = 229
    hidden_size: int = 256
    num_layers: int = 2
    dropout: float = 0.3
    compute_dtype: Any = jnp.float32
    lstm_backend: str = "scan"
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _to_nhwc(x).astype(self.compute_dtype)
        h = ConvBNRelu(32, dtype=self.compute_dtype, bn_axis_name=self.bn_axis_name,
                       name="block1")(h, train)
        h = _maxpool_freq(h)
        h = ConvBNRelu(64, dtype=self.compute_dtype, bn_axis_name=self.bn_axis_name,
                       name="block2")(h, train)
        h = _maxpool_freq(h)
        feats = _flatten_ct(h)  # (B, T, 64 * n_mels//4)
        if feats.shape[1] == 0:  # zero-length defensive path (ref :64-66)
            return jnp.zeros((x.shape[0], NUM_KEYS, 1), jnp.float32)
        rnn_out = BiLSTMStack(
            input_size=64 * (self.n_mels // 4),
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=self.dropout,
            proj_dtype=self.compute_dtype,
            backend=self.lstm_backend,
            name="rnn",
        )(feats, train)
        logits = nn.Dense(NUM_KEYS, dtype=jnp.float32, name="fc")(rnn_out)
        return jnp.swapaxes(logits, 1, 2)  # (B, 88, T)


class CNNRNNLarge(nn.Module):
    """Large model: residual CNN + freq-aware conv + dual BiLSTM + clamped
    self-attention + frame/onset/offset heads.

    Output: dict {frame, onset, offset} of (B, 88, T) when
    ``return_all_heads`` and heads are enabled, else frame logits (B, 88, T).
    """

    n_mels: int = 229
    hidden_size: int = 512
    num_layers: int = 3
    dropout: float = 0.2
    use_attention: bool = True
    use_onset_offset_heads: bool = True
    num_attention_heads: int = 8
    compute_dtype: Any = jnp.float32
    lstm_backend: str = "scan"
    attention_backend: str = "xla"
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_all_heads: bool = False):
        dt = self.compute_dtype
        ax = self.bn_axis_name
        h = _to_nhwc(x).astype(dt)

        h = ConvBNRelu(32, dtype=dt, bn_axis_name=ax, name="conv1")(h, train)
        h = _maxpool_freq(h)

        h = ResidualBlock(64, dtype=dt, bn_axis_name=ax, name="res_block1")(h, train)
        h = _maxpool_freq(h)
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)  # Dropout2d

        h = ResidualBlock(128, dtype=dt, bn_axis_name=ax, name="res_block2")(h, train)
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)

        h = ConvBNRelu(256, kernel=(7, 3), dtype=dt, bn_axis_name=ax,
                       name="freq_aware_conv")(h, train)
        h = _maxpool_freq(h)
        h = nn.Dropout(0.15, broadcast_dims=(1, 2), deterministic=not train)(h)

        feats = _flatten_ct(h)  # (B, T, 256 * n_mels//8)
        b = x.shape[0]
        if feats.shape[1] == 0:  # zero-length defensive path (ref :296-304)
            zero = jnp.zeros((b, NUM_KEYS, 1), jnp.float32)
            if self.use_onset_offset_heads and return_all_heads:
                return {"frame": zero, "onset": zero, "offset": zero}
            return zero

        lstm_input = 256 * (self.n_mels // 8)
        rnn_main = BiLSTMStack(
            input_size=lstm_input,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=self.dropout if self.num_layers > 1 else 0.0,
            proj_dtype=dt,
            backend=self.lstm_backend,
            name="rnn_main",
        )(feats, train)
        rnn_local = BiLSTMStack(
            input_size=lstm_input,
            hidden_size=self.hidden_size // 2,
            num_layers=1,
            proj_dtype=dt,
            backend=self.lstm_backend,
            name="rnn_local",
        )(feats, train)
        rnn_out = jnp.concatenate([rnn_main, rnn_local], axis=-1)  # (B, T, 3H)
        combined_dim = 2 * self.hidden_size + self.hidden_size  # 1536 @ H=512

        if self.use_attention:
            attn_out = MultiHeadSelfAttention(
                hidden_dim=combined_dim,
                num_heads=self.num_attention_heads,
                dropout=self.dropout,
                dtype=dt,
                backend=self.attention_backend,
                name="attention",
            )(rnn_out, train)
            rnn_out = nn.LayerNorm(epsilon=1e-6, name="attention_norm")(
                rnn_out + attn_out.astype(jnp.float32)
            )

        if self.use_onset_offset_heads:
            shared = nn.relu(nn.Dense(self.hidden_size, dtype=dt, name="shared_fc")(rnn_out.astype(dt)))
            shared = nn.Dropout(self.dropout * 1.5, deterministic=not train)(shared)
            # All three heads are always materialized (the reference creates
            # them in __init__); XLA dead-code-eliminates the unused ones
            # when only the frame output is consumed.
            frame = jnp.swapaxes(nn.Dense(NUM_KEYS, dtype=jnp.float32, name="frame_head")(shared), 1, 2)
            onset = jnp.swapaxes(nn.Dense(NUM_KEYS, dtype=jnp.float32, name="onset_head")(shared), 1, 2)
            offset = jnp.swapaxes(
                nn.Dense(NUM_KEYS, dtype=jnp.float32, name="offset_head")(shared), 1, 2
            )
            if not return_all_heads:
                return frame
            return {"frame": frame, "onset": onset, "offset": offset}
        logits = nn.Dense(NUM_KEYS, dtype=jnp.float32, name="fc")(rnn_out.astype(dt))
        logits = nn.Dropout(self.dropout * 1.5, deterministic=not train)(logits)
        return jnp.swapaxes(logits, 1, 2)
