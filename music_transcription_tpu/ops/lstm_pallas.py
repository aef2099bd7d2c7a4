"""Pallas TPU kernels for the LSTM recurrence.

The time recurrence is the one part of the BiLSTM that XLA cannot
parallelize: 938 sequential steps of (h @ W_hh + gates). The lax.scan
formulation pays while-loop overhead and re-streams weights every step;
these kernels instead run the whole recurrence as ONE pallas_call with a
sequential grid over time:

  * W_hh for both directions stays resident in VMEM for the entire scan
    (constant index_map -> loaded once)
  * h and c live in VMEM scratch, persisting across grid steps (TPU grid
    execution is sequential on a core)
  * input projections stream in as (UNROLL, 2B, 4H) time-major blocks;
    UNROLL timesteps are processed per grid step (statically unrolled),
    amortizing grid/DMA overhead — measured ~4x on the recurrence vs
    one-step blocks; outputs are bit-identical
  * the fused gate math runs on the VPU right after the MXU matmul

Semantics are identical to ops/lstm.py's fused-direction scan (same fp32
math, torch gate order); tests assert elementwise agreement. Two variants:
``lstm_recurrence_pallas`` (forward only, cheapest inference path) and
``lstm_recurrence`` (custom VJP whose backward is itself a fused
backward-through-time kernel — used for single-device training). Sharded
(multi-device) paths use the lax.scan formulation, which XLA can partition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 2  # timesteps per grid step (see module docstring)


def _blockdiag_gates(xw_t, h, wh_ref):
    """gates = xw[t] + blockdiag(h) @ wh — forward half uses wh[0],
    backward half wh[1]. Shared by all recurrence kernels."""
    b = h.shape[0] // 2
    hw_f = jnp.dot(h[:b], wh_ref[0], preferred_element_type=jnp.float32)
    hw_b = jnp.dot(h[b:], wh_ref[1], preferred_element_type=jnp.float32)
    return xw_t + jnp.concatenate([hw_f, hw_b], axis=0)  # (2B, 4H)


def _gate_update(gates, c_prev):
    """torch-order (i, f, g, o) LSTM cell update -> (h, c)."""
    hidden = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c = f * c_prev + i * g
    return o * jnp.tanh(c), c


def _pad_time(x_tm: jnp.ndarray, unroll: int) -> jnp.ndarray:
    """Zero-pad the leading (time) axis to a multiple of ``unroll``.

    Tail padding is harmless for both directions: padded steps come after
    every real step of the fused layout (the backward direction is already
    time-reversed before stacking), and their outputs/gradients are sliced
    away / exactly zero."""
    t = x_tm.shape[0]
    t_pad = -(-t // unroll) * unroll
    if t_pad == t:
        return x_tm
    return jnp.pad(x_tm, ((0, t_pad - t),) + ((0, 0),) * (x_tm.ndim - 1))


def _recurrence_kernel(xw_ref, wh_ref, out_ref, h_ref, c_ref):
    """One grid step = UNROLL timesteps.

    Layouts are time-major — xw (T, 2B, 4H) blocked (U, 2B, 4H) — so the
    trailing two dims satisfy the TPU (8, 128) tiling constraint."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    for u in range(xw_ref.shape[0]):
        gates = _blockdiag_gates(xw_ref[u], h_ref[:], wh_ref)
        h_new, c = _gate_update(gates, c_ref[:])
        c_ref[:] = c
        h_ref[:] = h_new
        out_ref[u] = h_new


def lstm_recurrence_pallas(
    xw: jnp.ndarray, wh_stacked: jnp.ndarray, unroll: int = UNROLL
) -> jnp.ndarray:
    """(2B, T, 4H) fused-direction input projections + (2, H, 4H) recurrent
    weights -> (2B, T, H) hidden states. All float32."""
    two_b, t, four_h = xw.shape
    hidden = four_h // 4
    xw_tm = _pad_time(jnp.swapaxes(xw, 0, 1), unroll)  # (Tp, 2B, 4H)
    t_pad = xw_tm.shape[0]
    out = pl.pallas_call(
        _recurrence_kernel,
        grid=(t_pad // unroll,),
        in_specs=[
            pl.BlockSpec((unroll, two_b, four_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, four_h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unroll, two_b, hidden), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, two_b, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((two_b, hidden), jnp.float32),
            pltpu.VMEM((two_b, hidden), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * two_b * hidden * four_h,
            bytes_accessed=(xw.size + wh_stacked.size + two_b * t * hidden) * 4,
            transcendentals=t * two_b * hidden * 5,
        ),
    )(xw_tm.astype(jnp.float32), wh_stacked.astype(jnp.float32))
    return jnp.swapaxes(out[:t], 0, 1)  # (2B, T, H)


# ---------------------------------------------------------------------------
# Differentiable variant: custom VJP with a fused backward-through-time kernel
# ---------------------------------------------------------------------------


def _recurrence_fwd_kernel(xw_ref, wh_ref, h_out_ref, c_out_ref, h_ref, c_ref):
    """Forward step that also records the cell-state sequence (backward
    residual)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    for u in range(xw_ref.shape[0]):
        gates = _blockdiag_gates(xw_ref[u], h_ref[:], wh_ref)
        h_new, c = _gate_update(gates, c_ref[:])
        c_ref[:] = c
        h_ref[:] = h_new
        h_out_ref[u] = h_new
        c_out_ref[u] = c


def _recurrence_bwd_kernel(xw_ref, wh_ref, h_prev_ref, c_t_ref, c_prev_ref,
                           dh_seq_ref, dxw_ref, dh_carry, dc_carry):
    """One reversed grid step = UNROLL timesteps of backward-through-time.

    Grid block i covers times [T - (i+1)*U, T - i*U); within the block, u
    runs U-1 .. 0 (latest time first). h_prev/c_prev are the one-step-
    shifted sequences (zeros at t=0), prepared by the caller so the index
    maps stay block-aligned. Gates are recomputed from xw and h_{t-1}
    (cheaper than storing (2B,T,4H) activations).

    Only the sequentially-dependent work lives here (dgates and the
    dh/dc carries). dW_hh = sum_t h_{t-1}^T dgates_t has no sequential
    dependence, so it is computed OUTSIDE as one big MXU einsum over the
    emitted dgates — keeping the kernel's VMEM budget to wh + blocks (the
    in-kernel accumulator alternative needs another 4H*H fp32 buffer and
    blows the 16 MB scoped limit at H=512, bs=16).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dc_carry[:] = jnp.zeros_like(dc_carry)

    b = dh_carry.shape[0] // 2

    for u in reversed(range(xw_ref.shape[0])):
        h_prev = h_prev_ref[u]
        c_prev = c_prev_ref[u]
        c_t = c_t_ref[u]

        gates = _blockdiag_gates(xw_ref[u], h_prev, wh_ref)
        hidden = gates.shape[-1] // 4
        ii = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
        ff = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        oo = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])

        tanh_c = jnp.tanh(c_t)
        dh_total = dh_seq_ref[u] + dh_carry[:]
        do = dh_total * tanh_c
        dc_total = dh_total * oo * (1.0 - tanh_c * tanh_c) + dc_carry[:]
        di = dc_total * gg
        df = dc_total * c_prev
        dg = dc_total * ii
        dgates = jnp.concatenate(
            [
                di * ii * (1.0 - ii),
                df * ff * (1.0 - ff),
                dg * (1.0 - gg * gg),
                do * oo * (1.0 - oo),
            ],
            axis=1,
        )  # (2B, 4H)
        dxw_ref[u] = dgates

        # dh_{t-1}[d] = dgates[d] @ W_hh[d]^T ; dc_{t-1} = dc_total * f
        dh_f = jax.lax.dot_general(
            dgates[:b], wh_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_b = jax.lax.dot_general(
            dgates[b:], wh_ref[1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_carry[:] = jnp.concatenate([dh_f, dh_b], axis=0)
        dc_carry[:] = dc_total * ff


@jax.custom_vjp
def lstm_recurrence(xw: jnp.ndarray, wh_stacked: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused recurrence: (2B, T, 4H), (2, H, 4H) -> (2B, T, H)."""
    h, _ = _lstm_recurrence_fwd_impl(xw, wh_stacked)
    return h


def _lstm_recurrence_fwd_impl(xw, wh_stacked, unroll: int = UNROLL):
    two_b, t, four_h = xw.shape
    hidden = four_h // 4
    xw_tm = _pad_time(jnp.swapaxes(xw, 0, 1).astype(jnp.float32), unroll)
    t_pad = xw_tm.shape[0]
    h_tm, c_tm = pl.pallas_call(
        _recurrence_fwd_kernel,
        grid=(t_pad // unroll,),
        in_specs=[
            pl.BlockSpec((unroll, two_b, four_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, four_h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((unroll, two_b, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, two_b, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, two_b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, two_b, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((two_b, hidden), jnp.float32),
            pltpu.VMEM((two_b, hidden), jnp.float32),
        ],
    )(xw_tm, wh_stacked.astype(jnp.float32))
    return jnp.swapaxes(h_tm[:t], 0, 1), (xw_tm, h_tm, c_tm, t)


def _lstm_recurrence_fwd(xw, wh_stacked):
    h, (xw_tm, h_tm, c_tm, t) = _lstm_recurrence_fwd_impl(xw, wh_stacked)
    return h, (xw_tm, wh_stacked.astype(jnp.float32), h_tm, c_tm, t)


def _lstm_recurrence_bwd(residuals, dh, unroll: int = 1):
    # unroll=2 fits VMEM (wh 8 MB + ~3 MB double-buffered blocks; the dW_hh
    # accumulator lives outside) but measured NO train-step change at bs 16
    # (219.1 vs 219.2 ms) -- the recurrence is not the bottleneck (see
    # DESIGN.md roofline) -- so the default stays at 1 for the cheaper
    # compile. The parameter is kept for larger-batch configs.
    xw_tm, wh, h_tm, c_tm, t = residuals
    t_pad, two_b, four_h = xw_tm.shape
    hidden = four_h // 4
    # dh must match the residuals' (forward-padded) length exactly — padding
    # only to the backward unroll would leave the tail blocks reading past
    # the cotangent array.
    dh_tm = jnp.swapaxes(dh, 0, 1).astype(jnp.float32)
    if dh_tm.shape[0] != t_pad:
        dh_tm = jnp.pad(dh_tm, ((0, t_pad - dh_tm.shape[0]), (0, 0), (0, 0)))
    assert t_pad % unroll == 0, (t_pad, unroll)

    # One-step-shifted state sequences (zeros at t=0): keeps every block's
    # index map identical and handles the t=0 boundary without masking.
    zero_row = jnp.zeros((1, two_b, hidden), jnp.float32)
    h_prev_tm = jnp.concatenate([zero_row, h_tm[:-1]], axis=0)
    c_prev_tm = jnp.concatenate([zero_row, c_tm[:-1]], axis=0)

    n_blocks = t_pad // unroll
    rev = lambda i: (n_blocks - 1 - i, 0, 0)
    dxw_tm = pl.pallas_call(
        _recurrence_bwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, two_b, four_h), rev, memory_space=pltpu.VMEM),  # xw
            pl.BlockSpec((2, hidden, four_h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, two_b, hidden), rev, memory_space=pltpu.VMEM),  # h_{t-1}
            pl.BlockSpec((unroll, two_b, hidden), rev, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec((unroll, two_b, hidden), rev, memory_space=pltpu.VMEM),  # c_{t-1}
            pl.BlockSpec((unroll, two_b, hidden), rev, memory_space=pltpu.VMEM),  # dh_t
        ],
        out_specs=pl.BlockSpec((unroll, two_b, four_h), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, two_b, four_h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((two_b, hidden), jnp.float32),
            pltpu.VMEM((two_b, hidden), jnp.float32),
        ],
    )(xw_tm, wh, h_prev_tm, c_tm, c_prev_tm, dh_tm)
    # dW_hh[d] = sum_t h_{t-1}[d]^T @ dgates_t[d]: no sequential dependence,
    # one MXU einsum per direction (padded rows contribute exact zeros).
    b = two_b // 2
    dwh = jnp.stack([
        jnp.einsum("tbh,tbk->hk", h_prev_tm[:, :b], dxw_tm[:, :b],
                   preferred_element_type=jnp.float32),
        jnp.einsum("tbh,tbk->hk", h_prev_tm[:, b:], dxw_tm[:, b:],
                   preferred_element_type=jnp.float32),
    ])
    return jnp.swapaxes(dxw_tm[:t], 0, 1), dwh


lstm_recurrence.defvjp(_lstm_recurrence_fwd, _lstm_recurrence_bwd)


def bilstm_layer_pallas(
    x: jnp.ndarray, layer_params: dict, proj_dtype=jnp.float32,
    differentiable: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops/lstm.bilstm_layer using the Pallas recurrence.

    ``differentiable=True`` routes through the custom-VJP variant (fused
    backward-through-time kernel); the plain variant skips the cell-state
    residual and is the cheapest pure-inference path."""
    from music_transcription_tpu.ops.lstm import (
        fused_direction_inputs,
        split_direction_outputs,
    )

    b = x.shape[0]
    xw, wh = fused_direction_inputs(x, layer_params, proj_dtype)
    recurrence = lstm_recurrence if differentiable else lstm_recurrence_pallas
    hs = recurrence(xw, wh)  # (2B, T, H)
    return split_direction_outputs(hs, b)


def bilstm_stack_pallas(
    x: jnp.ndarray,
    layers: list[dict],
    proj_dtype=jnp.float32,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
) -> jnp.ndarray:
    """Multi-layer BiLSTM on the Pallas recurrence (same inter-layer dropout
    semantics as ops/lstm.bilstm_stack; differentiable when training)."""
    out = x
    for li, params in enumerate(layers):
        out = bilstm_layer_pallas(
            out, params, proj_dtype=proj_dtype, differentiable=not deterministic
        )
        is_last = li == len(layers) - 1
        if dropout_rate > 0.0 and not deterministic and not is_last:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(sub, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
    return out
