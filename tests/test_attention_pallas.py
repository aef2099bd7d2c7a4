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


# ---------------------------------------------------------------------------
# Backward (custom VJP): gradients must match XLA autodiff of the identical
# clamp-then-mask formulation (VERDICT r1 missing #4)
# ---------------------------------------------------------------------------


def _grad_pair(t, d=32, h=2, b=2, qk_scale_mag=1.0, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(qk_scale_mag * rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(qk_scale_mag * rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.vdot(flash_attention_clamped(q, k, v, scale=scale), cot)

    def loss_ref(q, k, v):
        return jnp.vdot(_reference(q, k, v, scale, 10.0), cot)

    return jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v), jax.grad(
        loss_ref, argnums=(0, 1, 2)
    )(q, k, v)


@pytest.mark.parametrize("t", [128, 200])  # aligned and ragged (padded keys)
def test_grads_match_reference(t):
    got, ref = _grad_pair(t)
    for g, r, name in zip(got, ref, "qkv"):
        err = float(jnp.abs(g - r).max())
        assert err < 2e-4, f"d{name} mismatch: {err}"


def test_grads_with_clamp_active():
    """Saturated logits: the clip gate must zero dq/dk where |s| > 10 —
    an unclamped backward would be badly wrong here."""
    got, ref = _grad_pair(128, qk_scale_mag=10.0, seed=3)
    for g, r, name in zip(got, ref, "qkv"):
        err = float(jnp.abs(g - r).max())
        assert err < 2e-4, f"d{name} mismatch under clamp: {err}"
    # sanity: the clamp really bites in this regime
    assert float(jnp.abs(got[0]).max()) > 0  # not all-zero either


def test_padded_key_grads_are_zero_contrib():
    """Gradient wrt keys/values must vanish for padded positions and the
    valid-region grads must equal the T-truncated dense computation."""
    got, ref = _grad_pair(150, seed=4)
    for g, r, name in zip(got, ref, "qkv"):
        err = float(jnp.abs(g - r).max())
        assert err < 2e-4, f"d{name} mismatch with ragged T: {err}"


def test_model_training_grads_pallas_vs_xla():
    """Full large-model training grads with attention_backend=pallas must
    match the xla backend (dropout 0 so both paths are deterministic)."""
    from music_transcription_tpu.config import ModelConfig
    from music_transcription_tpu.models.transcription import TranscriptionModel

    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((2, 1, 16, 20)).astype(np.float32))
    roll = jnp.asarray((rng.random((2, 88, 20)) > 0.9).astype(np.float32))
    lengths = jnp.asarray([20, 14])

    grads = {}
    for backend in ("xla", "pallas"):
        cfg = ModelConfig(model_type="cnn_rnn_large", n_mels=16, hidden_size=8,
                          num_layers=1, dropout=0.0, compute_dtype="float32",
                          attention_backend=backend)
        model = TranscriptionModel(cfg)
        variables = model.init(jax.random.key(0), model.example_input(batch=1, t=8))

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                mel, train=True, return_all_heads=True, rngs={"dropout": jax.random.key(1)},
            )
            return model.loss(out, roll, lengths)

        grads[backend] = jax.grad(loss_fn)(variables["params"])

    flat_x, _ = jax.tree.flatten(grads["xla"])
    flat_p, _ = jax.tree.flatten(grads["pallas"])
    for gx, gp in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=3e-5, rtol=1e-3)


def test_auto_backend_crossover():
    """backend='auto' selects xla below the crossover (and the module still
    runs); the pallas selection above the crossover is exercised via a tiny
    crossover override."""
    import flax.linen as fnn

    from music_transcription_tpu.models.cnn_rnn import MultiHeadSelfAttention

    x = jnp.asarray(np.random.default_rng(8).standard_normal((1, 130, 16)).astype(np.float32))
    lo = MultiHeadSelfAttention(hidden_dim=16, num_heads=2, dropout=0.0, backend="auto",
                                auto_score_bytes=1e15)
    hi = MultiHeadSelfAttention(hidden_dim=16, num_heads=2, dropout=0.0, backend="auto",
                                auto_score_bytes=1.0)
    v = lo.init(jax.random.key(0), x, train=False)
    a = lo.apply(v, x, train=False)   # xla branch
    b = hi.apply(v, x, train=False)   # pallas branch (t=130 >= 64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
