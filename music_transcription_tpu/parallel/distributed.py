"""Multi-host (pod) execution support.

Single-host multi-chip needs nothing: ``make_mesh()`` over local devices and
XLA collectives over ICI. For multi-host slices (v5e pods), JAX requires
``jax.distributed.initialize`` before first device use; this module wires
that from the standard environment (or TPU metadata auto-detection) and
provides the per-process data sharding the input pipeline needs.

These are the building blocks; the CLIs do not wire them yet (single-host
multi-chip covers this environment). Multi-host training additionally needs
the input feed to assemble global arrays from per-host shards
(``jax.make_array_from_process_local_data``) — tracked in ROADMAP.md.
Untestable on this single-host environment beyond process_count == 1; the
code paths degrade to no-ops there.
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
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is None:
            # A default of 0 would make every host claim process 0.
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES are set but "
                "JAX_PROCESS_ID is not; set a distinct id per host."
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
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

    Round-robin assignment (i -> global index i * P + p). Every shard
    reports the SAME length (ceil(total / P), wrapping the last indices):
    unequal per-host lengths would make hosts issue different numbers of
    collective-bearing steps and deadlock the pod."""

    def __init__(self, dataset, process_index: int | None = None, process_count: int | None = None):
        self.dataset = dataset
        self.p = jax.process_index() if process_index is None else process_index
        self.n = jax.process_count() if process_count is None else process_count

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.n)

    def __getitem__(self, i: int):
        return self.dataset[(i * self.n + self.p) % len(self.dataset)]
