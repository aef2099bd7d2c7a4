"""Flash attention (clamped) vs the XLA reference formulation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from music_transcription_tpu.ops.attention_pallas import flash_attention_clamped


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _reference(q, k, v, scale, clip_val):
    s = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) * scale
    s = jnp.clip(s, -clip_val, clip_val)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", w, v)


@pytest.mark.parametrize("t", [128, 256, 200, 130])  # aligned and ragged
def test_matches_reference(t):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    scale = d**-0.5
    ref = _reference(q, k, v, scale, 10.0)
    got = flash_attention_clamped(q, k, v, scale=scale, block_q=128, block_k=128)
    assert got.shape == ref.shape
    assert float(jnp.abs(got - ref).max()) < 2e-5


def test_clamp_active():
    """Large-magnitude logits: the clamp must change the result and the
    kernel must follow the clamped reference, not the unclamped one."""
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 128, 1, 32
    q = jnp.asarray(10.0 * rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(10.0 * rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    scale = d**-0.5
    clamped = _reference(q, k, v, scale, 10.0)
    unclamped = _reference(q, k, v, scale, 1e9)
    assert float(jnp.abs(clamped - unclamped).max()) > 1e-3  # clamp matters here
    got = flash_attention_clamped(q, k, v, scale=scale)
    assert float(jnp.abs(got - clamped).max()) < 2e-5


def test_padding_masked_out():
    """Ragged T: padded keys must not contribute (result equals T-truncated
    dense computation)."""
    rng = np.random.default_rng(2)
    b, t, h, d = 1, 150, 2, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    got = flash_attention_clamped(q, k, v, scale=d**-0.5)
    ref = _reference(q, k, v, d**-0.5, 10.0)
    assert float(jnp.abs(got - ref).max()) < 2e-5
