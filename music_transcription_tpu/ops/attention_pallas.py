"""Pallas TPU flash attention with the reference's ±10 logit clamp.

The large model attends over T=938 frames with 8 heads of dim 192
(reference models/cnn_rnn_model.py:102-139). The XLA formulation
materializes the (B, 8, T, T) score tensor in HBM; this kernel computes the
same result tiled with an online softmax so scores never leave VMEM:

  * sequences are padded to a multiple of the 128-wide tiles; padded KEYS
    are masked to -1e9 *after* the clamp (clamping first would resurrect
    them at -clip), padded QUERY rows are sliced away on return
  * the clamp is applied to the scaled logits exactly as the reference does
    (clip, then softmax) — it commutes with the online max/exp rescaling
  * fp32 softmax statistics, bf16-friendly matmuls with fp32 accumulation

Inference-path kernel (no dropout; attention dropout only exists in
training, where the XLA path is used — same split as the Pallas LSTM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, clip_val, t_valid, block_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, D)
    k = k_ref[0]  # (block_k, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    s = jnp.clip(s, -clip_val, clip_val)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < t_valid, s, NEG_INF)

    m_prev = m_ref[:]  # (block_q, 128) lane-broadcast stats
    l_prev = l_ref[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> (block_q, 128)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])  # (block_q, block_k)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_next
    l_ref[:] = l_next

    v = v_ref[0]  # (block_k, D)
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha[:, :1] + pv

    @pl.when(ki == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def flash_attention_clamped(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    clip_val: float = 10.0,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """(B, T, H, D) q/k/v -> (B, T, H, D) attention output.

    Equivalent to softmax(clip(q @ k^T * scale)) @ v per head; T is padded
    internally to the tile size."""
    b, t, h, d = q.shape

    def to_bh(x):  # (B, T, H, D) -> (B*H, T, D)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    t_pad = -(-t // max(block_q, block_k)) * max(block_q, block_k)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        qh, kh, vh = (jnp.pad(x, pad) for x in (qh, kh, vh))

    kernel = functools.partial(
        _flash_kernel, scale=scale, clip_val=clip_val, t_valid=t, block_k=block_k
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // block_q, t_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_pad * t_pad * d,
            bytes_accessed=3 * b * h * t_pad * d * q.dtype.itemsize
            + b * h * t_pad * d * q.dtype.itemsize,
            transcendentals=b * h * t_pad * t_pad,
        ),
    )(qh, kh, vh)
    out = out[:, :t].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))  # (B, T, H, D)
