"""ZeRO-1 / FSDP partitioning tests (virtual 8-device CPU mesh).

The sharded-state paths must (a) place optimizer/param leaves actually
sharded on the mesh, (b) reproduce the replicated data-parallel numerics,
and (c) train. The step *function* is shared with the replicated path, so
these tests guard the sharding rules and the jit in/out sharding plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from music_transcription_tpu.config import ModelConfig, TrainConfig
from music_transcription_tpu.models.transcription import TranscriptionModel
from music_transcription_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from music_transcription_tpu.parallel.partitioning import (
    jit_partitioned,
    make_mesh_2d,
    sharded_param_bytes,
    shard_state,
    state_shardings,
)
from music_transcription_tpu.parallel.train_step import (
    init_train_state,
    jit_data_parallel,
    make_train_step,
)
from music_transcription_tpu.train.optim import make_optimizer

MCFG = ModelConfig(model_type="cnn_rnn", n_mels=16, hidden_size=8, num_layers=1, dropout=0.0)
# Small test model -> small leaves; drop the sharding threshold so the big
# LSTM/dense matrices actually shard on the test mesh.
MIN_LEAF = 512


def _setup(tx, batch=8, t=12):
    model = TranscriptionModel(MCFG)
    state = init_train_state(model, tx, jax.random.key(0), model.example_input(batch=1, t=t))
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((batch, 1, 16, t)).astype(np.float32)
    roll = (rng.random((batch, 88, t)) > 0.9).astype(np.float32)
    lengths = np.full((batch,), t, np.int32)
    return model, state, (jnp.asarray(mel), jnp.asarray(roll), jnp.asarray(lengths))


def _n_sharded(subtree) -> int:
    return sum(
        1
        for leaf in jax.tree.leaves(subtree)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    )


def _run_steps(step_fn, state, batch, rng, n=3):
    metrics = None
    for _ in range(n):
        state, metrics = step_fn(state, batch, rng)
    return state, metrics


def test_zero1_matches_replicated_dp():
    """ZeRO-1 on a 1-D mesh: optimizer state sharded over the data axis,
    numerics identical to the replicated step (same function, new shardings)."""
    tx = optax.sgd(0.1, momentum=0.9)  # momentum trace = sharded leaf per param
    model, state, batch = _setup(tx)
    rng = jax.random.key(2)
    mesh = make_mesh(8)
    batch_s = tuple(shard_batch(np.asarray(b), mesh) for b in batch)

    step_dp = jit_data_parallel(make_train_step(model, tx), mesh)
    s_ref, m_ref = _run_steps(step_dp, replicate(jax.tree.map(jnp.copy, state), mesh), batch_s, rng)

    shardings = state_shardings(state, mesh, shard_opt=True, min_leaf_size=MIN_LEAF)
    step_z1 = jit_partitioned(make_train_step(model, tx), mesh, shardings)
    s_z1, m_z1 = _run_steps(
        step_z1, shard_state(jax.tree.map(jnp.copy, state), shardings), batch_s, rng
    )

    assert abs(float(m_ref["loss"]) - float(m_z1["loss"])) < 1e-5
    # params themselves replicated under ZeRO-1; values must match the
    # all-reduce path (reduce-scatter+gather reassociation stays ~fp eps;
    # 3e-4 atol per test_train_step.py's BN-conv-bias-noise rationale).
    for a, b in zip(jax.tree.leaves(s_ref["params"]), jax.tree.leaves(s_z1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    # the point of ZeRO-1: moments are actually sharded, params are not
    assert _n_sharded(s_z1["opt_state"]) >= 2
    assert _n_sharded(s_z1["params"]) == 0
    assert int(s_z1["step"]) == 3


def test_fsdp_2d_matches_replicated_dp():
    """FSDP over a (data=4, model=2) mesh: params AND optimizer state shard
    over ``model``; batch shards over ``data``; numerics match replicated DP."""
    tx = optax.sgd(0.1, momentum=0.9)
    model, state, batch = _setup(tx)
    rng = jax.random.key(2)

    mesh_1d = make_mesh(8)
    step_dp = jit_data_parallel(make_train_step(model, tx), mesh_1d)
    s_ref, m_ref = _run_steps(
        step_dp,
        replicate(jax.tree.map(jnp.copy, state), mesh_1d),
        tuple(shard_batch(np.asarray(b), mesh_1d) for b in batch),
        rng,
    )

    mesh = make_mesh_2d(4, 2)
    shardings = state_shardings(state, mesh, shard_params=True, min_leaf_size=MIN_LEAF)
    step_f = jit_partitioned(make_train_step(model, tx), mesh, shardings)
    batch_s = tuple(shard_batch(np.asarray(b), mesh) for b in batch)
    s_f, m_f = _run_steps(step_f, shard_state(jax.tree.map(jnp.copy, state), shardings), batch_s, rng)

    assert abs(float(m_ref["loss"]) - float(m_f["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s_ref["params"]), jax.tree.leaves(s_f["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    assert _n_sharded(s_f["params"]) >= 2
    assert _n_sharded(s_f["opt_state"]) >= 2


def test_tp_2d_matches_replicated_dp():
    """Tensor parallelism over a (data=4, model=2) mesh: kernels shard
    column-parallel on the feature axis (so activations partition over
    ``model`` under GSPMD propagation); numerics match replicated DP."""
    from jax.sharding import PartitionSpec

    tx = optax.sgd(0.1, momentum=0.9)
    model, state, batch = _setup(tx)
    rng = jax.random.key(2)

    mesh_1d = make_mesh(8)
    step_dp = jit_data_parallel(make_train_step(model, tx), mesh_1d)
    s_ref, m_ref = _run_steps(
        step_dp,
        replicate(jax.tree.map(jnp.copy, state), mesh_1d),
        tuple(shard_batch(np.asarray(b), mesh_1d) for b in batch),
        rng,
    )

    mesh = make_mesh_2d(4, 2)
    shardings = state_shardings(
        state, mesh, shard_params=True, min_leaf_size=MIN_LEAF, strategy="tp"
    )
    step_t = jit_partitioned(make_train_step(model, tx), mesh, shardings)
    batch_s = tuple(shard_batch(np.asarray(b), mesh) for b in batch)
    s_t, m_t = _run_steps(step_t, shard_state(jax.tree.map(jnp.copy, state), shardings), batch_s, rng)

    assert abs(float(m_ref["loss"]) - float(m_t["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s_ref["params"]), jax.tree.leaves(s_t["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    # the TP signature: sharded 2-D kernels are sharded on their LAST
    # (feature/output) axis, not merely their largest one
    n_feature_sharded = 0
    for leaf in jax.tree.leaves(s_t["params"]):
        spec = getattr(leaf.sharding, "spec", None)
        if spec is None or all(s is None for s in spec):
            continue
        assert spec[-1] is not None, f"TP leaf sharded off-feature: {spec} {leaf.shape}"
        n_feature_sharded += 1
    assert n_feature_sharded >= 2


def test_fsdp_shards_reduce_addressable_bytes():
    tx = optax.sgd(0.1, momentum=0.9)
    _, state, _ = _setup(tx)
    mesh = make_mesh(8)
    shardings = state_shardings(state, mesh, shard_params=True, min_leaf_size=MIN_LEAF)
    rep = replicate(jax.tree.map(jnp.copy, state), mesh)
    sh = shard_state(state, shardings)
    b_rep = sharded_param_bytes(rep)
    b_sh = sharded_param_bytes(sh)
    # the big matrices dominate this model, so sharding 8-ways should cut
    # per-device param bytes by well over half
    assert b_sh["params"] < 0.5 * b_rep["params"]
    assert b_sh["opt_state"] < 0.5 * b_rep["opt_state"]


def test_zero1_adam_trains_and_guards():
    """Full production optimizer (clip + adamw) under ZeRO-1: loss decreases
    over steps and the NaN guard still skips without corrupting sharded state."""
    tcfg = TrainConfig(learning_rate=5e-3, weight_decay=0.0)
    tx = make_optimizer(tcfg)
    model, state, batch = _setup(tx)
    mesh = make_mesh(8)
    shardings = state_shardings(state, mesh, min_leaf_size=MIN_LEAF)
    step = jit_partitioned(make_train_step(model, tx), mesh, shardings)
    state = shard_state(state, shardings)
    batch_s = tuple(shard_batch(np.asarray(b), mesh) for b in batch)
    rng = jax.random.key(1)

    first = None
    for _ in range(10):
        state, metrics = step(state, batch_s, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert _n_sharded(state["opt_state"]) >= 2  # adam mu/nu sharded

    mel, roll, lengths = batch_s
    bad = jnp.asarray(np.asarray(mel)).at[0, 0, 0, 0].set(jnp.nan)
    bad = shard_batch(np.asarray(bad), mesh)
    params_before = jax.tree.map(np.asarray, state["params"])
    state2, metrics = step(state, (bad, roll, lengths), rng)
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(state2["params"])):
        assert np.array_equal(a, np.asarray(b))
