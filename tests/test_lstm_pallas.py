"""Pallas LSTM recurrence vs the lax.scan oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from music_transcription_tpu.ops import lstm as L
from music_transcription_tpu.ops import lstm_pallas as LP


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def test_single_layer_matches_scan():
    rng = np.random.default_rng(0)
    params = L.init_bilstm_params(jax.random.key(0), 12, 8, 1)
    x = jnp.asarray(rng.standard_normal((3, 17, 12)).astype(np.float32))
    ref = L.bilstm_layer(x, params[0])
    got = LP.bilstm_layer_pallas(x, params[0])
    assert float(jnp.abs(ref - got).max()) < 1e-5


def test_stack_matches_scan():
    rng = np.random.default_rng(1)
    params = L.init_bilstm_params(jax.random.key(1), 10, 8, 2)
    x = jnp.asarray(rng.standard_normal((2, 9, 10)).astype(np.float32))
    ref = L.bilstm_stack(x, params)
    got = LP.bilstm_stack_pallas(x, params)
    assert float(jnp.abs(ref - got).max()) < 1e-5


def test_matches_torch_lstm():
    import torch

    torch.manual_seed(0)
    i, h, b, t = 12, 16, 2, 11
    lstm = torch.nn.LSTM(i, h, num_layers=1, batch_first=True, bidirectional=True)
    x = np.random.default_rng(2).standard_normal((b, t, i)).astype(np.float32)
    ref, _ = lstm(torch.from_numpy(x))
    layer = {}
    for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
        layer[f"wi_{d}"] = jnp.asarray(getattr(lstm, f"weight_ih_l0{suffix}").detach().numpy().T)
        layer[f"wh_{d}"] = jnp.asarray(getattr(lstm, f"weight_hh_l0{suffix}").detach().numpy().T)
        layer[f"b_{d}"] = jnp.asarray(
            (getattr(lstm, f"bias_ih_l0{suffix}") + getattr(lstm, f"bias_hh_l0{suffix}"))
            .detach().numpy()
        )
    got = LP.bilstm_layer_pallas(jnp.asarray(x), layer)
    assert np.abs(np.asarray(got) - ref.detach().numpy()).max() < 2e-5


def test_custom_vjp_matches_scan_grads():
    """Fused backward-through-time kernel vs jax.grad of the scan."""
    rng = np.random.default_rng(3)
    B, T, H = 2, 9, 4
    two_b, four_h = 2 * B, 4 * H
    xw = jnp.asarray(rng.standard_normal((two_b, T, four_h)).astype(np.float32))
    wh = jnp.asarray(0.5 * rng.standard_normal((2, H, four_h)).astype(np.float32))

    def scan_recurrence(xw, wh):
        h0 = jnp.zeros((two_b, H))
        c0 = jnp.zeros((two_b, H))

        def step(carry, xt):
            h, c = carry
            hw = jnp.concatenate([h[:B] @ wh[0], h[B:] @ wh[1]], axis=0)
            gates = xt + hw
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        _, hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xw, 0, 1))
        return jnp.swapaxes(hs, 0, 1)

    w = jnp.asarray(rng.standard_normal((two_b, T, H)).astype(np.float32))
    g_ref = jax.grad(lambda a, b: jnp.sum(scan_recurrence(a, b) * w), argnums=(0, 1))(xw, wh)
    g_pal = jax.grad(lambda a, b: jnp.sum(LP.lstm_recurrence(a, b) * w), argnums=(0, 1))(xw, wh)
    assert float(jnp.abs(g_ref[0] - g_pal[0]).max()) < 1e-5
    assert float(jnp.abs(g_ref[1] - g_pal[1]).max()) < 1e-5


def test_pallas_backend_trains():
    """A train step through the pallas-backed model must produce the same
    gradients as the scan-backed model."""
    import optax

    from music_transcription_tpu.config import ModelConfig
    from music_transcription_tpu.models.transcription import TranscriptionModel

    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.standard_normal((2, 1, 16, 12)).astype(np.float32))
    roll = jnp.asarray((rng.random((2, 88, 12)) > 0.9).astype(np.float32))

    grads = {}
    for backend in ("scan", "pallas"):
        cfg = ModelConfig(model_type="cnn_rnn", n_mels=16, hidden_size=8,
                          num_layers=2, dropout=0.0, compute_dtype="float32",
                          lstm_backend=backend)
        model = TranscriptionModel(cfg)
        variables = model.init(jax.random.key(7), model.example_input(batch=1, t=12))

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                mel, train=True, rngs={"dropout": jax.random.key(0)},
            )
            return model.loss(out, roll)

        grads[backend] = jax.grad(loss_fn)(variables["params"])

    for a, b in zip(jax.tree.leaves(grads["scan"]), jax.tree.leaves(grads["pallas"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
