"""Data-parallel jitted train/eval steps.

The TPU-native replacement for the reference's single-GPU AMP loop
(reference train/train_transcriber.py:90-160):

  * one jitted ``train_step``: forward (bf16 conv compute / fp32 LSTM),
    loss, grad, in-step NaN guard, optimizer update, batch-stat update
  * data parallelism comes from shardings, not code: the step is jitted with
    the train state replicated and the batch sharded on axis 0 over the
    ``data`` mesh axis; XLA inserts the gradient all-reduce (psum over ICI)
  * the NaN/Inf guard is the reference's skip-batch semantics
    (train/train_transcriber.py:123-142) implemented branchlessly: when the
    loss or the gradients are non-finite the update is the identity and the
    ``skipped`` flag is set; the host aborts after max_nan_batches skips
  * donation of the train state avoids a second copy of the 89M-param model
    in HBM

The returned state is a plain dict pytree: params / batch_stats / opt_state
/ step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from music_transcription_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    positional_arity,
    replicated_sharding,
)


def init_train_state(model, tx, rng, sample_input) -> dict:
    variables = model.init(rng, sample_input)
    params = variables["params"]
    return {
        "params": params,
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def _resolve_multi_head(model, multi_head: bool | None) -> bool:
    if multi_head is None:
        return model.config.model_type == "cnn_rnn_large" and model.config.use_onset_offset_heads
    return multi_head


def _loss_and_grads(model, state, batch, rng, multi_head):
    """Forward + multi-head loss + grads (shared by jit and shard_map paths)."""
    mel, roll, lengths = batch

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state["batch_stats"]}
        out, new_stats = model.apply(
            variables, mel, train=True, return_all_heads=multi_head, rngs={"dropout": rng}
        )
        return model.loss(out, roll, lengths), new_stats

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
    return loss, new_stats, grads


def _guarded_update(tx, state, loss, grads, new_stats):
    """NaN-guarded optimizer update (shared by jit and shard_map paths).

    Branchless NaN/Inf guard (reference train_transcriber.py:123-142):
    non-finite loss or grads -> zero update, keep old state, flag skipped.
    """
    grad_norm = optax.global_norm(grads)
    finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    safe = lambda g: jnp.where(finite, g, jnp.zeros_like(g))
    grads = jax.tree.map(safe, grads)
    updates, new_opt_state = tx.update(grads, state["opt_state"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)

    keep_new = lambda new, old: jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)
    new_state = {
        "params": keep_new(new_params, state["params"]),
        "batch_stats": keep_new(new_stats, state["batch_stats"]),
        "opt_state": keep_new(new_opt_state, state["opt_state"]),
        "step": state["step"] + 1,
    }
    metrics = {
        "loss": loss,
        "grad_norm": grad_norm,
        "skipped": 1.0 - finite.astype(jnp.float32),
    }
    return new_state, metrics


def make_train_step(model, tx, *, multi_head: bool | None = None):
    """Build the pure train-step function (to be jitted by the caller).

    batch = (mel (B,1,M,T), roll (B,88,T), lengths (B,)).
    Returns (new_state, metrics) where metrics carries loss / grad_norm /
    skipped (1.0 when the NaN guard suppressed the update).
    """
    multi_head = _resolve_multi_head(model, multi_head)

    def train_step(state, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state["step"])
        loss, new_stats, grads = _loss_and_grads(model, state, batch, rng, multi_head)
        return _guarded_update(tx, state, loss, grads, new_stats)

    return train_step


def make_eval_step(model, *, multi_head: bool | None = None):
    if multi_head is None:
        multi_head = (
            model.config.model_type == "cnn_rnn_large" and model.config.use_onset_offset_heads
        )

    def eval_step(state, batch):
        mel, roll, lengths = batch
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        out = model.apply(variables, mel, train=False, return_all_heads=multi_head)
        return model.loss(out, roll, lengths)

    return eval_step


def make_train_step_shardmap(model, tx, mesh, *, multi_head: bool | None = None):
    """Data-parallel train step as an explicit-SPMD ``jax.shard_map`` program.

    Equivalent to ``jit_data_parallel(make_train_step(...))`` (the compiler-
    partitioned path) but each shard runs a fully LOCAL program with one
    ``lax.pmean`` over gradients/metrics — which means kernels without SPMD
    partitioning rules (the fused Pallas LSTM) run per device.

    BatchNorm runs as sync-BN (cross-shard batch statistics via axis_name),
    and per-shard losses pmean to the global mean, so with fixed-shape chunk
    batches this path matches the jit path exactly (tested). The one
    remaining local semantic: the masked-loss denominator is per-shard —
    identical across shards for fixed-shape batches.
    """
    import copy

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    if hasattr(model.module, "bn_axis_name"):
        # sync-BN: cross-shard batch statistics via the mesh axis, making
        # this path numerically identical to the compiler-partitioned one.
        model = copy.copy(model)
        model.module = model.module.clone(bn_axis_name=axis)

    mh = _resolve_multi_head(model, multi_head)

    def local_step(state, batch, dropout_rng):
        _, roll, lengths = batch
        rng = jax.random.fold_in(dropout_rng, state["step"])
        # distinct dropout masks per shard (the jit path draws one global mask)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        loss, new_stats, grads = _loss_and_grads(model, state, batch, rng, mh)

        # Denominator-weighted reduction: the masked loss is a per-shard
        # mean over valid frames, so the exact global loss/grad is
        # sum_shards(local * denom) / sum_shards(denom) — a plain pmean
        # would up-weight shards holding short tail chunks. (denom differs
        # from mask.sum()*88 only by the constant 88, which cancels.)
        t = roll.shape[-1]
        denom = jnp.maximum(jnp.sum(jnp.clip(lengths, 0, t)).astype(jnp.float32), 1.0)
        denom_sum = jax.lax.pmean(denom, axis)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g * denom, axis) / denom_sum, grads)
        loss = jax.lax.pmean(loss * denom, axis) / denom_sum
        new_stats = jax.lax.pmean(new_stats, axis)  # keep running stats replicated
        return _guarded_update(tx, state, loss, grads, new_stats)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=({k: P() for k in ("params", "batch_stats", "opt_state", "step")},
                  (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)), P()),
        out_specs=({k: P() for k in ("params", "batch_stats", "opt_state", "step")}, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step_shardmap(model, mesh, *, multi_head: bool | None = None):
    """Validation loss under shard_map, denominator-weighted across shards.

    Each shard's masked loss is a mean over its valid frames, so the exact
    global loss is sum(local * denom) / sum(denom) — the same reduction the
    shard_map train step uses. A plain pmean would deflate the loss whenever
    shards hold different valid-frame counts: short tail chunks, and
    especially all-padding rows from ``Loader(pad_last_batch=True)`` (those
    shards carry loss 0 and MUST get weight 0, not 1/n_shards).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    base = make_eval_step(model, multi_head=multi_head)

    def local_eval(state, batch):
        _, roll, lengths = batch
        loss = base(state, batch)
        t = roll.shape[-1]
        denom = jnp.sum(jnp.clip(lengths, 0, t)).astype(jnp.float32)
        denom_sum = jnp.maximum(jax.lax.pmean(denom, axis), 1e-9)
        return jax.lax.pmean(loss * denom, axis) / denom_sum

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))),  # P() = whole
        out_specs=P(),                                               # state replicated
        check_vma=False,
    )
    return jax.jit(sharded)


def jit_data_parallel(fn, mesh, *, donate_state: bool = True, state_arg: int = 0,
                      batch_arg: int = 1, n_args: int | None = None):
    """jit ``fn`` with the train state replicated and the batch sharded on
    axis 0 over ``mesh``; extra args replicated."""
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    if n_args is None:
        n_args = positional_arity(fn)
    in_shardings = []
    for i in range(n_args):
        if i == batch_arg:
            in_shardings.append(shard)  # applied to every leaf of the batch
        else:
            in_shardings.append(rep)
    donate = (state_arg,) if donate_state else ()
    return jax.jit(fn, in_shardings=tuple(in_shardings), donate_argnums=donate)
