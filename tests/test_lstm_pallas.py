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
