"""Pallas TPU kernel for the LSTM recurrence.

The time recurrence is the one part of the BiLSTM that XLA cannot
parallelize: 938 sequential steps of (h @ W_hh + gates). The lax.scan
formulation pays while-loop overhead and re-streams weights every step; this
kernel instead runs the whole recurrence as ONE pallas_call with a
sequential grid over T:

  * W_hh for both directions stays resident in VMEM for the entire scan
    (constant index_map -> loaded once)
  * h and c live in VMEM scratch, persisting across grid steps (TPU grid
    execution is sequential on a core)
  * the per-step input projections stream in as (2B, 1, 4H) blocks; the
    fused gate math runs on the VPU right after the MXU matmul

Semantics are identical to ops/lstm.py's fused-direction scan (same fp32
math, torch gate order); tests assert elementwise agreement. Used for the
forward/inference path — training keeps the lax.scan formulation (autodiff
through the scan), which is exactly the reference's serving/teaching split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recurrence_kernel(xw_ref, wh_ref, out_ref, h_ref, c_ref):
    """One grid step t: gates = xw[t] + blockdiag(h) @ wh; h,c update.

    Layouts are time-major — xw (T, 2B, 4H) blocked (1, 2B, 4H) — so the
    trailing two dims satisfy the TPU (8, 128) tiling constraint."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    two_b, four_h = xw_ref.shape[1], xw_ref.shape[2]
    hidden = four_h // 4
    b = two_b // 2

    h = h_ref[:]  # (2B, H)
    # block-diagonal recurrent matmul: forward half uses wh[0], backward wh[1]
    hw_f = jnp.dot(h[:b], wh_ref[0], preferred_element_type=jnp.float32)
    hw_b = jnp.dot(h[b:], wh_ref[1], preferred_element_type=jnp.float32)
    gates = xw_ref[0] + jnp.concatenate([hw_f, hw_b], axis=0)  # (2B, 4H)

    i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c = f * c_ref[:] + i * g
    h_new = o * jnp.tanh(c)
    c_ref[:] = c
    h_ref[:] = h_new
    out_ref[0] = h_new


def lstm_recurrence_pallas(xw: jnp.ndarray, wh_stacked: jnp.ndarray) -> jnp.ndarray:
    """(2B, T, 4H) fused-direction input projections + (2, H, 4H) recurrent
    weights -> (2B, T, H) hidden states. All float32."""
    two_b, t, four_h = xw.shape
    hidden = four_h // 4
    xw_tm = jnp.swapaxes(xw, 0, 1)  # (T, 2B, 4H) time-major
    out = pl.pallas_call(
        _recurrence_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, two_b, four_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, four_h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, two_b, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, two_b, hidden), jnp.float32),
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
    return jnp.swapaxes(out, 0, 1)  # (2B, T, H)


def bilstm_layer_pallas(x: jnp.ndarray, layer_params: dict, proj_dtype=jnp.float32) -> jnp.ndarray:
    """Drop-in for ops/lstm.bilstm_layer using the Pallas recurrence."""
    hidden = layer_params["wh_fwd"].shape[0]
    b = x.shape[0]

    def proj(w, bias):
        out = jnp.einsum(
            "bti,ih->bth", x.astype(proj_dtype), w.astype(proj_dtype),
            preferred_element_type=jnp.float32,
        )
        return out + bias

    xw_f = proj(layer_params["wi_fwd"], layer_params["b_fwd"])
    xw_b = proj(layer_params["wi_bwd"], layer_params["b_bwd"])
    xw = jnp.concatenate([xw_f, jnp.flip(xw_b, axis=1)], axis=0)  # (2B, T, 4H)
    wh = jnp.stack([layer_params["wh_fwd"], layer_params["wh_bwd"]])
    hs = lstm_recurrence_pallas(xw, wh)  # (2B, T, H)
    h_f, h_b_rev = hs[:b], hs[b:]
    return jnp.concatenate([h_f, jnp.flip(h_b_rev, axis=1)], axis=-1)


def bilstm_stack_pallas(x: jnp.ndarray, layers: list[dict], proj_dtype=jnp.float32) -> jnp.ndarray:
    """Inference-path multi-layer BiLSTM on the Pallas recurrence
    (no dropout: eval mode only)."""
    out = x
    for params in layers:
        out = bilstm_layer_pallas(out, params, proj_dtype=proj_dtype)
    return out
