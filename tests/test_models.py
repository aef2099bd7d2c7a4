"""Model-level tests: shapes, parameter counts, heads, train/eval modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_transcription_tpu.config import ModelConfig
from music_transcription_tpu.models.transcription import TranscriptionModel, param_count


@pytest.fixture(scope="module")
def small_base():
    cfg = ModelConfig(model_type="cnn_rnn", n_mels=32, hidden_size=16, num_layers=2, dropout=0.3)
    model = TranscriptionModel(cfg)
    variables = model.init(jax.random.key(0), model.example_input(batch=2, t=12))
    return model, variables


@pytest.fixture(scope="module")
def small_large():
    cfg = ModelConfig(
        model_type="cnn_rnn_large", n_mels=32, hidden_size=16, num_layers=2, dropout=0.2
    )
    model = TranscriptionModel(cfg)
    variables = model.init(jax.random.key(0), model.example_input(batch=2, t=12))
    return model, variables


def test_base_model_shapes(small_base):
    model, variables = small_base
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 32, 20)), jnp.float32)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 88, 20)


def test_base_model_accepts_3d_input(small_base):
    model, variables = small_base
    x = jnp.zeros((2, 32, 20))
    assert model.apply(variables, x).shape == (2, 88, 20)


def test_large_model_heads(small_large):
    model, variables = small_large
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, 32, 16)), jnp.float32)
    frame_only = model.apply(variables, x)
    assert frame_only.shape == (2, 88, 16)
    heads = model.apply(variables, x, return_all_heads=True)
    assert set(heads) == {"frame", "onset", "offset"}
    for v in heads.values():
        assert v.shape == (2, 88, 16)
    assert np.allclose(np.asarray(heads["frame"]), np.asarray(frame_only))


def test_train_mode_returns_batch_stats(small_large):
    model, variables = small_large
    x = jnp.ones((2, 1, 32, 16))
    rngs = {"dropout": jax.random.key(1)}
    (out, new_stats) = model.apply(variables, x, train=True, rngs=rngs)
    assert out.shape == (2, 88, 16)
    # running stats must move away from init on constant input
    leaves_old = jax.tree.leaves(variables["batch_stats"])
    leaves_new = jax.tree.leaves(new_stats)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_old, leaves_new))


def test_dropout_only_active_in_train(small_large):
    model, variables = small_large
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 1, 32, 16)), jnp.float32)
    a = model.apply(variables, x)
    b = model.apply(variables, x)
    assert np.allclose(np.asarray(a), np.asarray(b))  # eval is deterministic
    o1, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(1)})
    o2, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))  # dropout varies


def test_predict_binary(small_base):
    model, variables = small_base
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, 32, 10)), jnp.float32)
    roll = model.predict(variables, x, threshold=0.5)
    assert set(np.unique(np.asarray(roll))) <= {0.0, 1.0}
    # threshold 0 -> everything on; threshold 1 -> everything off
    assert np.asarray(model.predict(variables, x, threshold=-1e9)).all()
    assert not np.asarray(model.predict(variables, x, threshold=1e9)).any()


def test_reference_param_counts():
    """README-published sizes (reference README.md:61): ~36M base, ~89M large
    at n_mels=320."""
    base = TranscriptionModel(
        ModelConfig(model_type="cnn_rnn", n_mels=320, hidden_size=512, num_layers=3)
    )
    v = base.init(jax.random.key(0), base.example_input(t=8))
    n = param_count(v)
    assert 35e6 < n < 37e6, n

    large = TranscriptionModel(
        ModelConfig(model_type="cnn_rnn_large", n_mels=320, hidden_size=512, num_layers=3)
    )
    v = large.init(jax.random.key(0), large.example_input(t=8))
    n = param_count(v)
    assert 88e6 < n < 91e6, n


def test_loss_dispatch(small_large):
    model, variables = small_large
    x = jnp.zeros((2, 1, 32, 16))
    targets = jnp.zeros((2, 88, 16))
    lengths = jnp.asarray([16, 8])
    heads = model.apply(variables, x, return_all_heads=True)
    loss = model.loss(heads, targets, lengths)
    assert np.isfinite(float(loss))
    single = model.apply(variables, x)
    loss2 = model.loss(single, targets, lengths)
    assert np.isfinite(float(loss2))


def test_large_no_attention_no_heads():
    cfg = ModelConfig(
        model_type="cnn_rnn_large",
        n_mels=32,
        hidden_size=16,
        num_layers=1,
        use_attention=False,
        use_onset_offset_heads=False,
    )
    model = TranscriptionModel(cfg)
    variables = model.init(jax.random.key(0), model.example_input(batch=1, t=12))
    out = model.apply(variables, jnp.zeros((1, 1, 32, 12)))
    assert out.shape == (1, 88, 12)
    assert "attention" not in variables["params"]
