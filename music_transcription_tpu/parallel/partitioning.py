"""Sharded-state partitioning: ZeRO-1 and FSDP via GSPMD shardings.

The reference is single-device (SURVEY §2.10-bis); the 89M flagship fits one
chip so plain data parallelism (train_step.py) is the default. This module is
the scaling story past that point, expressed the TPU-native way — as
*shardings on the train state*, not as model rewrites:

  * **ZeRO-1** (``shard_opt=True``): Adam's mu/nu moments shard over the mesh;
    XLA turns the gradient all-reduce into reduce-scatter + sharded optimizer
    math + an all-gather of the updates. Cuts optimizer HBM by the mesh size
    (2/3 of Adam train-state bytes) with identical numerics.
  * **FSDP** (``shard_params=True`` too): parameters and gradients shard as
    well; XLA inserts all-gathers at use sites and reduce-scatters the grads.
    This is how a model that does NOT fit one chip trains — nothing else in
    the step changes.

Both compose with data parallelism on a 2-D ``(data, model)`` mesh: batches
shard over ``data``, state leaves shard over ``model``. On a 1-D mesh the
state shards over the ``data`` axis itself (classic ZeRO).

Everything here is compiler-partitioned (jit + NamedSharding): the train step
function is byte-identical to the replicated path, so the numerics-parity
contract (masked loss, NaN guard, clip-then-update order) is untouched.
Validated against the replicated path on a virtual 8-device CPU mesh
(tests/test_partitioning.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from music_transcription_tpu.parallel.mesh import DATA_AXIS, batch_sharding, positional_arity

MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh. ``model`` should map to the faster
    (inner/ICI) axis of the physical topology, which is the default order of
    ``jax.devices()`` on a slice."""
    if devices is None:
        devices = jax.devices()
    if n_data < 1 or n_model < 1:
        raise ValueError(f"mesh dims must be >= 1, got ({n_data}, {n_model})")
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"requested {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(shape: tuple[int, ...], n: int, axis_name: str, min_size: int) -> P:
    """Shard the largest axis divisible by ``n``; replicate if none (or tiny).

    Biases/scalars/BN stats stay replicated (they're noise next to the big
    matrices); matrices shard on their largest divisible dimension so the
    per-device shard stays MXU-tileable.
    """
    size = int(np.prod(shape)) if shape else 0
    if size < min_size:
        return P()
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[i] % n == 0 and shape[i] >= 2 * n:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def _leaf_spec_tp(shape: tuple[int, ...], n: int, axis_name: str, min_size: int) -> P:
    """Tensor-parallel spec: shard the FEATURE (last) axis first.

    Column-parallel layout for every kernel — conv HWIO kernels shard C_out,
    dense (in, out) kernels shard out, LSTM (in, 4H) projections shard the
    gate dim — so under GSPMD the matmul outputs (activations) come out
    feature-sharded over ``model`` and stay sharded through the elementwise
    epilogues; XLA inserts the all-gather/psum only where an op genuinely
    needs the full feature dim (the recurrence carry, the loss). Falls back
    to the largest other divisible axis (row-parallel + psum), else
    replicates.
    """
    size = int(np.prod(shape)) if shape else 0
    if size < min_size:
        return P()
    last = len(shape) - 1
    order = [last] + sorted(
        (i for i in range(last)), key=lambda i: -shape[i]
    )
    for i in order:
        if shape[i] % n == 0 and shape[i] >= 2 * n:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def state_shardings(
    state,
    mesh: Mesh,
    *,
    shard_params: bool = False,
    shard_opt: bool = True,
    min_leaf_size: int = 16384,
    strategy: str = "fsdp",
):
    """Per-leaf NamedShardings for the train-state pytree.

    ``shard_opt`` shards optimizer-state leaves (ZeRO-1); ``shard_params``
    additionally shards params (FSDP/TP). ``strategy`` picks the axis rule:
    ``"fsdp"`` shards each leaf's largest divisible axis (pure memory
    partitioning — XLA all-gathers weights at use sites), ``"tp"`` shards
    the feature/output axis (column-parallel — activations shard over
    ``model`` and the compute itself partitions). ``batch_stats`` and
    ``step`` always replicate (they are read every forward and tiny). On a
    2-D mesh the shard axis is ``model``; on a 1-D mesh it is the ``data``
    axis.
    """
    if strategy not in ("fsdp", "tp"):
        raise ValueError(f"unknown strategy {strategy!r} (fsdp | tp)")
    spec_fn = _leaf_spec_tp if strategy == "tp" else _leaf_spec
    axis_name = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else DATA_AXIS
    n = mesh.shape[axis_name]

    def build(subtree, do_shard):
        return jax.tree.map(
            lambda leaf: NamedSharding(
                mesh,
                spec_fn(tuple(np.shape(leaf)), n, axis_name, min_leaf_size)
                if do_shard
                else P(),
            ),
            subtree,
        )

    return {
        "params": build(state["params"], shard_params),
        "batch_stats": build(state["batch_stats"], False),
        "opt_state": build(state["opt_state"], shard_opt),
        "step": NamedSharding(mesh, P()),
    }


def shard_state(state, shardings):
    """Device-put a host-resident train state with per-leaf shardings."""
    return jax.tree.map(jax.device_put, state, shardings)


def jit_partitioned(fn, mesh: Mesh, shardings, *, donate_state: bool = True,
                    state_arg: int = 0, batch_arg: int = 1, n_args: int | None = None):
    """jit a (state, batch, *extras) step with sharded state.

    The state arg gets the per-leaf ``shardings`` (in AND out — new-state
    leaves keep their shards, so nothing silently gathers between steps);
    the batch shards on axis 0 over ``data``; extras replicate. The returned
    metrics are replicated scalars.
    """
    rep = NamedSharding(mesh, P())
    shard = batch_sharding(mesh)
    if n_args is None:
        n_args = positional_arity(fn)
    in_shardings = tuple(
        shardings if i == state_arg else (shard if i == batch_arg else rep)
        for i in range(n_args)
    )
    donate = (state_arg,) if donate_state else ()
    return jax.jit(
        fn, in_shardings=in_shardings, out_shardings=(shardings, rep), donate_argnums=donate
    )


def sharded_param_bytes(state) -> dict[str, int]:
    """Per-device addressable bytes of each state section (diagnostic)."""
    out = {}
    for key in ("params", "opt_state"):
        total = 0
        for leaf in jax.tree.leaves(state[key]):
            if hasattr(leaf, "addressable_shards") and leaf.addressable_shards:
                shard0 = leaf.addressable_shards[0]
                total += int(np.prod(shard0.data.shape)) * leaf.dtype.itemsize
            elif hasattr(leaf, "nbytes"):
                total += int(leaf.nbytes)
        out[key] = total
    return out
