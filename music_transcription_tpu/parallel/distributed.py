"""Multi-host (pod) execution support.

Single-host multi-chip needs nothing: ``make_mesh()`` over local devices and
XLA collectives over ICI. For multi-host slices (v5e pods), JAX requires
``jax.distributed.initialize`` before first device use; this module wires
that from the standard environment (or TPU metadata auto-detection) and
provides the per-process data sharding the input pipeline needs.

Wiring: ``scripts/train_cnn.py`` and ``scripts/evaluate.py`` call
``maybe_initialize_distributed()`` before first device use; when running
multi-process they wrap datasets in ``ProcessShard`` (each host decodes only
its slice) and ``device_prefetch`` assembles per-host local batches into
global sharded arrays via ``jax.make_array_from_process_local_data``. All
code paths degrade to no-ops at process_count == 1; the multi-process path
is exercised by a real 2-process CPU test (tests/test_multihost.py) using a
local coordinator + Gloo collectives.
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


def local_batch_size(global_batch_size: int) -> int:
    """Per-host rows of a globally sharded batch (must divide evenly:
    uneven per-host batches would desync collective-bearing steps)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch_size={global_batch_size} must be divisible by "
            f"process_count={n}"
        )
    return global_batch_size // n


class ProcessShard:
    """View of an indexable dataset holding only this process's slice.

    Round-robin assignment (i -> global index i * P + p). By default every
    shard reports the SAME length (ceil(total / P), wrapping the last
    indices): unequal per-host lengths would make hosts issue different
    numbers of collective-bearing steps and deadlock the pod.

    ``exact=True`` drops the wraparound (lengths may differ by one across
    hosts) — for evaluation, where the forward has no collectives and
    duplicate samples would bias the metric."""

    def __init__(self, dataset, process_index: int | None = None,
                 process_count: int | None = None, exact: bool = False):
        self.dataset = dataset
        self.p = jax.process_index() if process_index is None else process_index
        self.n = jax.process_count() if process_count is None else process_count
        self.exact = exact

    def __len__(self) -> int:
        if self.exact:
            total = len(self.dataset)
            return total // self.n + (1 if self.p < total % self.n else 0)
        return -(-len(self.dataset) // self.n)

    def __getitem__(self, i: int):
        g = i * self.n + self.p
        if self.exact:
            if g >= len(self.dataset):
                raise IndexError(g)
            return self.dataset[g]
        return self.dataset[g % len(self.dataset)]
