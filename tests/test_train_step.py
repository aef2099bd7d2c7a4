"""Train-step tests: learning happens, NaN guard engages, and the
data-parallel sharded step matches single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from music_transcription_tpu.config import ModelConfig, TrainConfig
from music_transcription_tpu.models.transcription import TranscriptionModel
from music_transcription_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from music_transcription_tpu.parallel.train_step import (
    init_train_state,
    jit_data_parallel,
    make_eval_step,
    make_train_step,
)
from music_transcription_tpu.train.optim import make_optimizer

MCFG = ModelConfig(model_type="cnn_rnn", n_mels=16, hidden_size=8, num_layers=1, dropout=0.0)
TCFG = TrainConfig(learning_rate=5e-3, weight_decay=0.0)


def _setup(batch=4, t=12):
    model = TranscriptionModel(MCFG)
    tx = make_optimizer(TCFG)
    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=t))
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((batch, 1, 16, t)).astype(np.float32)
    roll = (rng.random((batch, 88, t)) > 0.9).astype(np.float32)
    lengths = np.full((batch,), t, np.int32)
    return model, tx, state, (jnp.asarray(mel), jnp.asarray(roll), jnp.asarray(lengths))


def test_loss_decreases():
    model, tx, state, batch = _setup()
    step = jax.jit(make_train_step(model, tx))
    rng = jax.random.key(1)
    first = None
    for i in range(20):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state["step"]) == 20
    assert float(metrics["skipped"]) == 0.0


def test_nan_guard_skips_update():
    model, tx, state, batch = _setup()
    step = jax.jit(make_train_step(model, tx))
    mel, roll, lengths = batch
    bad_mel = mel.at[0, 0, 0, 0].set(jnp.nan)
    params_before = jax.tree.map(np.asarray, state["params"])
    state2, metrics = step(state, (bad_mel, roll, lengths), jax.random.key(1))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(state2["params"])):
        assert np.array_equal(a, np.asarray(b))
    assert int(state2["step"]) == 1  # step still advances


def test_eval_step_finite():
    model, _, state, batch = _setup()
    loss = jax.jit(make_eval_step(model))(state, batch)
    assert np.isfinite(float(loss))


def test_data_parallel_matches_single_device():
    """The sharded step over an 8-device mesh must produce the same update
    as the unsharded step (gradient psum == full-batch gradient). SGD is
    used so params directly reflect gradients (Adam's first step is
    sign-of-gradient and amplifies reduction-order noise on ~0 grads)."""
    import optax

    model = TranscriptionModel(MCFG)
    tx = optax.sgd(0.1)
    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=12))
    rng_np = np.random.default_rng(0)
    mel = rng_np.standard_normal((8, 1, 16, 12)).astype(np.float32)
    roll = (rng_np.random((8, 88, 12)) > 0.9).astype(np.float32)
    lengths = np.full((8,), 12, np.int32)
    batch = (jnp.asarray(mel), jnp.asarray(roll), jnp.asarray(lengths))
    rng = jax.random.key(2)

    step_single = jax.jit(make_train_step(model, tx))
    s1, m1 = step_single(jax.tree.map(jnp.copy, state), batch, rng)

    mesh = make_mesh(8)
    step_dp = jit_data_parallel(make_train_step(model, tx), mesh)
    state_r = replicate(jax.tree.map(jnp.copy, state), mesh)
    batch_s = tuple(shard_batch(np.asarray(b), mesh) for b in batch)
    s2, m2 = step_dp(state_r, batch_s, rng)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    # atol: conv-bias grads are mathematically zero through BatchNorm (shift
    # invariance) so both runs hold pure cancellation noise there (~1e-4);
    # structural DP errors (wrong mean, missing psum) would be O(1e-2).
    for a, b in zip(jax.tree.leaves(s1["params"]), jax.tree.leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_shardmap_eval_padding_and_length_weighted():
    """make_eval_step_shardmap must be denominator-weighted: all-padding
    shards (lengths==0, from Loader(pad_last_batch=True)) get weight 0, and
    variable-length shards weight by valid frames — matching the jit global
    masked loss exactly."""
    from music_transcription_tpu.parallel.train_step import make_eval_step_shardmap

    model, _, state, _ = _setup(batch=3, t=12)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((3, 1, 16, 12)).astype(np.float32)
    roll = (rng.random((3, 88, 12)) > 0.9).astype(np.float32)
    lengths = np.array([12, 7, 12], np.int32)  # variable valid lengths

    ref = float(
        jax.jit(make_eval_step(model))(
            state, (jnp.asarray(mel), jnp.asarray(roll), jnp.asarray(lengths))
        )
    )

    # pad 3 -> 8 rows (5 all-padding shards on the 8-device mesh)
    pad = lambda a: np.concatenate([a, np.zeros((5,) + a.shape[1:], a.dtype)])
    mesh = make_mesh(8)
    batch = tuple(shard_batch(pad(a), mesh) for a in (mel, roll, lengths))
    got = float(make_eval_step_shardmap(model, mesh)(replicate(state, mesh), batch))
    assert abs(got - ref) < 1e-6


def test_eval_loss_padding_neutral():
    """Zero-padded rows with lengths==0 must not move the masked eval loss —
    the invariant behind device_prefetch(pad_to_mesh=True) (pipeline.py)."""
    model, _, state, batch = _setup(batch=3)
    mel, roll, lengths = batch
    loss = float(jax.jit(make_eval_step(model))(state, batch))
    pad = lambda a: jnp.concatenate([a, jnp.zeros((5,) + a.shape[1:], a.dtype)])
    padded = (pad(mel), pad(roll), pad(lengths))
    loss_p = float(jax.jit(make_eval_step(model))(state, padded))
    assert abs(loss - loss_p) < 1e-6


def test_weight_decay_and_clip_present():
    cfg = TrainConfig()
    tx = make_optimizer(cfg)
    # Apply to a dummy tree: large gradient should be clipped to norm 1.
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((4,), 100.0)}
    updates, _ = tx.update(grads, opt_state, params)
    # After clip(1.0) + adam(step 1) + lr 1e-4, update magnitude ~ lr.
    assert np.all(np.abs(np.asarray(updates["w"])) < 2 * cfg.learning_rate)


def test_shardmap_step_matches_jit_data_parallel():
    """Explicit-SPMD shard_map step must match the compiler-partitioned jit
    step (fixed-shape batches -> identical shard denominators)."""
    import optax

    from music_transcription_tpu.parallel.train_step import make_train_step_shardmap

    model = TranscriptionModel(MCFG)
    tx = optax.sgd(0.1)
    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=12))
    rng_np = np.random.default_rng(0)
    mel = rng_np.standard_normal((8, 1, 16, 12)).astype(np.float32)
    roll = (rng_np.random((8, 88, 12)) > 0.9).astype(np.float32)
    lengths = np.full((8,), 12, np.int32)
    batch = (jnp.asarray(mel), jnp.asarray(roll), jnp.asarray(lengths))
    rng = jax.random.key(2)

    mesh = make_mesh(8)
    step_jit = jit_data_parallel(make_train_step(model, tx), mesh)
    s1, m1 = step_jit(replicate(jax.tree.map(jnp.copy, state), mesh),
                      tuple(shard_batch(np.asarray(b), mesh) for b in batch), rng)

    step_sm = make_train_step_shardmap(model, tx, mesh)
    s2, m2 = step_sm(replicate(jax.tree.map(jnp.copy, state), mesh),
                     tuple(shard_batch(np.asarray(b), mesh) for b in batch), rng)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    # params: same tolerance story as the jit-vs-single test (BN-conv-bias
    # grads are cancellation noise)
    for a, b in zip(jax.tree.leaves(s1["params"]), jax.tree.leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_jit_data_parallel_accepts_partial_wrapped_step():
    """Arity detection must see through functools.partial (VERDICT r2:
    __code__.co_argcount broke on wrapped steps)."""
    from functools import partial

    model, tx, state, batch = _setup(batch=8)
    base = make_train_step(model, tx)
    wrapped = partial(base)  # same 3 remaining positional args
    mesh = make_mesh(8)
    step = jit_data_parallel(wrapped, mesh)
    s, metrics = step(replicate(state, mesh),
                      tuple(shard_batch(np.asarray(b), mesh) for b in batch),
                      jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    def star_step(*args):
        return base(*args)

    try:
        jit_data_parallel(star_step, mesh)
        raise AssertionError("expected TypeError for *args signature")
    except TypeError:
        pass
