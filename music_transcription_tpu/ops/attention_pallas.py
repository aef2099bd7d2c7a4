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

Differentiable: a custom VJP recomputes the score tiles in the backward
(FlashAttention-2 style: forward additionally emits the per-row logsumexp;
backward runs two kernels — dQ with the k loop innermost, dK/dV with the q
loop innermost — and folds the clamp's gradient gate
``1{-clip <= scaled_logits <= clip}`` into dS before the dQ/dK matmuls).
No dropout inside the kernel: attention dropout is applied by the caller to
the output-projection input in training, matching the reference's placement
only in expectation — training with attention_backend="pallas" disables the
in-scores dropout (documented in the model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                  scale, clip_val, t_valid, block_k, with_lse):
    if with_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
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
        if with_lse:
            lse_ref[0] = m_ref[:] + jnp.log(jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:]))


def _fwd_call(cfg, qh, kh, vh, with_lse: bool):
    scale, clip_val, t_valid, block_q, block_k = cfg
    bh, t_pad, d = qh.shape
    kernel = functools.partial(
        _flash_kernel, scale=scale, clip_val=clip_val, t_valid=t_valid,
        block_k=block_k, with_lse=with_lse,
    )
    out_shape = [jax.ShapeDtypeStruct((bh, t_pad, d), qh.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        # per-row logsumexp, lane-broadcast (TPU tiles want a 128 last dim)
        out_shape.append(jax.ShapeDtypeStruct((bh, t_pad, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, block_q, 128), lambda b, qi, ki: (b, qi, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        grid=(bh, t_pad // block_q, t_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shape if with_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=4 * bh * t_pad * d * qh.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(qh, kh, vh)
    return res if with_lse else (res, None)


def _recompute_p_ds(q, k, v, o, do, lse, col0, *, scale, clip_val, t_valid):
    """Shared backward tile math: probabilities p and clamp-gated dS.

    Recomputes the score tile, applies the same clamp-then-mask order as the
    forward, and returns (p, ds_gated) where ds_gated already includes the
    clip gradient gate and the ``scale`` factor of d(scores)/d(q·k)."""
    z = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk) scaled pre-clip logits
    s = jnp.clip(z, -clip_val, clip_val)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
    valid = col < t_valid
    p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # (bq, bk)
    do32 = do.astype(jnp.float32)
    delta = jnp.sum(do32 * o.astype(jnp.float32), axis=1, keepdims=True)  # (bq, 1)
    dp = jax.lax.dot_general(
        do32, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (dp - delta)
    gate = jnp.logical_and(z >= -clip_val, z <= clip_val)
    return p, jnp.where(gate, ds, 0.0) * scale


def _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, dq_acc,
                   *, scale, clip_val, t_valid, block_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    _, ds = _recompute_p_ds(
        q_ref[0], k_ref[0], v_ref[0], o_ref[0], do_ref[0], lse_ref[0][:, :1],
        ki * block_k, scale=scale, clip_val=clip_val, t_valid=t_valid,
    )
    dq_acc[:] += jax.lax.dot(
        ds.astype(k_ref.dtype), k_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _store():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale, clip_val, t_valid, block_k):
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    do = do_ref[0]
    p, ds = _recompute_p_ds(
        q, k_ref[0], v_ref[0], o_ref[0], do, lse_ref[0][:, :1],
        ki * block_k, scale=scale, clip_val=clip_val, t_valid=t_valid,
    )
    # contract over the query rows of this tile
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == pl.num_programs(2) - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(cfg, qh, kh, vh):
    out, _ = _fwd_call(cfg, qh, kh, vh, with_lse=False)
    return out


def _flash_fwd(cfg, qh, kh, vh):
    out, lse = _fwd_call(cfg, qh, kh, vh, with_lse=True)
    return out, (qh, kh, vh, out, lse)


def _flash_bwd(cfg, residuals, do):
    scale, clip_val, t_valid, block_q, block_k = cfg
    qh, kh, vh, out, lse = residuals
    bh, t_pad, d = qh.shape
    common = dict(scale=scale, clip_val=clip_val, t_valid=t_valid, block_k=block_k)

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, block_q, 128), lambda b, qi, ki: (b, qi, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(bh, t_pad // block_q, t_pad // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, q_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), qh.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t_pad * t_pad * d,
            bytes_accessed=6 * bh * t_pad * d * qh.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(qh, kh, vh, out, do, lse)

    # dK/dV: k tile fixed per program, q loop innermost ("arbitrary")
    kq_q_spec = pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0),
                             memory_space=pltpu.VMEM)
    kq_k_spec = pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0),
                             memory_space=pltpu.VMEM)
    kq_lse_spec = pl.BlockSpec((1, block_q, 128), lambda b, ki, qi: (b, qi, 0),
                               memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(bh, t_pad // block_k, t_pad // block_q),
        in_specs=[kq_q_spec, kq_k_spec, kq_k_spec, kq_q_spec, kq_q_spec, kq_lse_spec],
        out_specs=[kq_k_spec, kq_k_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, t_pad, d), kh.dtype),
                   jax.ShapeDtypeStruct((bh, t_pad, d), vh.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t_pad * t_pad * d,
            bytes_accessed=6 * bh * t_pad * d * qh.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(qh, kh, vh, out, do, lse)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


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
    internally to the tile size. Differentiable (custom VJP with a
    recompute-based flash backward)."""
    b, t, h, d = q.shape

    def to_bh(x):  # (B, T, H, D) -> (B*H, T, D)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    t_pad = -(-t // max(block_q, block_k)) * max(block_q, block_k)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        qh, kh, vh = (jnp.pad(x, pad) for x in (qh, kh, vh))

    cfg = (float(scale), float(clip_val), t, int(block_q), int(block_k))
    out = _flash(cfg, qh, kh, vh)
    out = out[:, :t].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))  # (B, T, H, D)
