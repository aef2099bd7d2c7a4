"""Multi-host (pod) execution support.

Single-host multi-chip needs nothing: ``make_mesh()`` over local devices and
XLA collectives over ICI. For multi-host slices (v5e pods), JAX requires
``jax.distributed.initialize`` before first device use; this module wires
that from the standard environment (or TPU metadata auto-detection) and
provides the per-process data sharding the input pipeline needs.

Usage in CLIs: ``maybe_initialize_distributed()`` early, build the mesh over
``jax.devices()`` (global), and wrap datasets with ``ProcessShard`` so each
host reads only its slice. The global batch is assembled by jit from the
per-host shards (jax.make_array_from_process_local_data in device_put path).

Untestable on this single-host environment beyond process_count == 1;
the code paths degrade to no-ops there.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Honors JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    explicitly, else defers to jax.distributed's own auto-detection on TPU
    pods. Returns True when running multi-process."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        _initialized = True
    elif os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        # multi-worker TPU slice: let JAX auto-detect from metadata
        jax.distributed.initialize()
        _initialized = True
    if verbose and jax.process_count() > 1:
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    return jax.process_count() > 1


class ProcessShard:
    """View of an indexable dataset holding only this process's slice.

    Round-robin assignment (i -> global index i * P + p) keeps shards
    balanced for any dataset length; with shuffle seeded identically across
    hosts, per-epoch global coverage matches single-host semantics."""

    def __init__(self, dataset, process_index: int | None = None, process_count: int | None = None):
        self.dataset = dataset
        self.p = jax.process_index() if process_index is None else process_index
        self.n = jax.process_count() if process_count is None else process_count

    def __len__(self) -> int:
        total = len(self.dataset)
        return (total - self.p + self.n - 1) // self.n

    def __getitem__(self, i: int):
        return self.dataset[i * self.n + self.p]
