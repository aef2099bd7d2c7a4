"""Device mesh and sharding policy.

The reference is single-device (SURVEY §2.10: no torch.distributed anywhere);
parallel execution here is first-class and XLA-native:

  * training: data-parallel over a 1-D ``data`` mesh axis — params/opt-state
    replicated, batches sharded on axis 0, gradients reduced by the psum XLA
    inserts for the sharded-batch jit (rides ICI on a TPU slice)
  * inference: recordings become (num_chunks, ...) batches sharded over the
    same axis
  * host input pipeline feeds per-device shards via jax.device_put with a
    NamedSharding

All utilities work identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), which is how tests and the
driver's multi-chip dry-run validate the sharding without TPU hardware.
"""

from __future__ import annotations

import inspect

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def positional_arity(fn) -> int:
    """Positional parameter count of ``fn``.

    Signature-based, so ``functools.partial`` and wrapped callables resolve
    to their *remaining* arity (``__code__.co_argcount`` would not). Raises
    for ``*args`` signatures, where the caller must pass ``n_args``
    explicitly.
    """
    sig = inspect.signature(fn)
    n = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            n += 1
        elif p.kind is p.VAR_POSITIONAL:
            raise TypeError(
                f"{fn!r} takes *args; pass n_args explicitly to the jit wrapper"
            )
    return n


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis (works for any-rank arrays)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> tuple[np.ndarray, int]:
    """Zero-pad ``axis`` up to a multiple (returns padded array and original
    size). Needed because a sharded batch axis must divide the mesh."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad), n


def shard_batch(x, mesh: Mesh):
    """Device-put a host array sharded on axis 0 over the mesh."""
    return jax.device_put(x, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh.

    Multi-host: every process must hold identical host values (true for
    seed-deterministic init and checkpoint restores); each process feeds its
    own addressable replicas via make_array_from_process_local_data."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)), tree
        )
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
