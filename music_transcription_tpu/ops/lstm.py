"""Bidirectional multi-layer LSTM as a TPU-friendly ``lax.scan``.

Replaces the cuDNN LSTM the reference leans on
(reference models/cnn_rnn_model.py:45-52,212-228). Design:

  * The input projection ``x @ W_ih + b`` for *all* timesteps is one large
    MXU matmul hoisted out of the scan; the recurrence only carries the
    ``h @ W_hh`` matmul and the elementwise gate math.
  * Forward and backward directions are fused into a single scan by stacking
    the reversed sequence on the batch axis (2B batch) — halving the number
    of sequential steps issued to the device.
  * Gate order is torch's (i, f, g, o) and biases are the combined
    ``b_ih + b_hh``, so reference checkpoints convert directly.
  * All recurrence math is float32 — the analogue of the reference's
    "LSTM in FP32 even under AMP" rule (reference models/cnn_rnn_model.py:69,309).

Parameters for a stack are a list (one per layer) of dicts:
  {"wi_fwd": (I, 4H), "wh_fwd": (H, 4H), "b_fwd": (4H,),
   "wi_bwd": ..., "wh_bwd": ..., "b_bwd": ...}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_direction_inputs(
    x: jnp.ndarray, layer_params: dict, proj_dtype=jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prepare the fused-direction recurrence inputs for one BiLSTM layer.

    Returns (xw, wh): xw (2B, T, 4H) is [forward projections; time-reversed
    backward projections] stacked on batch; wh (2, H, 4H) stacks the
    per-direction recurrent weights.

    ``proj_dtype`` controls the *input projection* matmul only (the dominant
    FLOPs: (B*T, I) x (I, 4H) once per layer); bfloat16 there runs on the
    MXU fast path while the recurrence math stays float32 — a weaker
    precision cut than the reference's all-fp32 rule, applied only where the
    recurrent error feedback cannot amplify it (the projection is feed-
    forward; fp32 accumulation is kept). Shared by the scan and Pallas
    recurrence backends so their numerics cannot diverge.
    """

    def proj(w, b):
        out = jnp.einsum(
            "bti,ih->bth",
            x.astype(proj_dtype),
            w.astype(proj_dtype),
            preferred_element_type=jnp.float32,
        )
        return out + b

    xw_f = proj(layer_params["wi_fwd"], layer_params["b_fwd"])
    xw_b = proj(layer_params["wi_bwd"], layer_params["b_bwd"])
    xw = jnp.concatenate([xw_f, jnp.flip(xw_b, axis=1)], axis=0)  # (2B, T, 4H)
    wh = jnp.stack([layer_params["wh_fwd"], layer_params["wh_bwd"]])  # (2, H, 4H)
    return xw, wh


def split_direction_outputs(hs: jnp.ndarray, b: int) -> jnp.ndarray:
    """(2B, T, H) fused recurrence output -> (B, T, 2H) in torch order
    [forward_h, backward_h], un-reversing the backward half."""
    return jnp.concatenate([hs[:b], jnp.flip(hs[b:], axis=1)], axis=-1)


def bilstm_layer(x: jnp.ndarray, layer_params: dict, proj_dtype=jnp.float32) -> jnp.ndarray:
    """One bidirectional layer: (B, T, I) -> (B, T, 2H).

    Both directions run in a single scan over a 2B batch (the backward
    direction consumes the time-reversed sequence; per-half weights are
    applied via the stacked wh).
    """
    b = x.shape[0]
    hidden = layer_params["wh_fwd"].shape[0]
    xw, wh = fused_direction_inputs(x, layer_params, proj_dtype)

    h0 = jnp.zeros((2 * b, hidden), dtype=jnp.float32)
    c0 = jnp.zeros((2 * b, hidden), dtype=jnp.float32)

    def step(carry, xt):
        h, c = carry
        h2 = h.reshape(2, b, hidden)
        hw = jnp.einsum("dbh,dhk->dbk", h2, wh, preferred_element_type=jnp.float32)
        gates = xt + hw.reshape(2 * b, 4 * hidden)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xw, 0, 1))
    return split_direction_outputs(jnp.swapaxes(hs, 0, 1), b)


def bilstm_stack(
    x: jnp.ndarray,
    layers: list[dict],
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
    proj_dtype=jnp.float32,
) -> jnp.ndarray:
    """Multi-layer BiLSTM with torch inter-layer dropout semantics
    (dropout applied to each layer's output except the last, training only)."""
    out = x
    for li, params in enumerate(layers):
        out = bilstm_layer(out, params, proj_dtype=proj_dtype)
        is_last = li == len(layers) - 1
        if dropout_rate > 0.0 and not deterministic and not is_last:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(sub, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
    return out


def combined_bias_init(key, shape, k):
    """torch stores two independent uniform(-k, k) biases (b_ih, b_hh) that
    are always summed; the combined bias is the sum of two independent
    draws (triangular on [-2k, 2k])."""
    k1, k2 = jax.random.split(key)
    return (
        jax.random.uniform(k1, shape, jnp.float32, -k, k)
        + jax.random.uniform(k2, shape, jnp.float32, -k, k)
    )


def init_bilstm_params(
    rng, input_size: int, hidden_size: int, num_layers: int
) -> list[dict]:
    """torch-style uniform(-1/sqrt(H), 1/sqrt(H)) initialization."""
    k = 1.0 / jnp.sqrt(hidden_size)
    layers = []
    in_size = input_size
    for _ in range(num_layers):
        keys = jax.random.split(rng, 7)
        rng = keys[0]

        def u(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        layers.append(
            {
                "wi_fwd": u(keys[1], (in_size, 4 * hidden_size)),
                "wh_fwd": u(keys[2], (hidden_size, 4 * hidden_size)),
                "b_fwd": combined_bias_init(keys[3], (4 * hidden_size,), k),
                "wi_bwd": u(keys[4], (in_size, 4 * hidden_size)),
                "wh_bwd": u(keys[5], (hidden_size, 4 * hidden_size)),
                "b_bwd": combined_bias_init(keys[6], (4 * hidden_size,), k),
            }
        )
        in_size = 2 * hidden_size
    return layers
