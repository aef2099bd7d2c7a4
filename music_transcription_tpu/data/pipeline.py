"""Host input pipeline: batching, collation, threaded prefetch, device feed.

The role of torch DataLoader + pin_memory in the reference
(reference scripts/train_cnn.py:257-276, train/train_transcriber.py:23-39),
built for the TPU feed path:

  * ``collate_mel``: pad mel/roll to the batch max T, return
    (mel (B,1,M,T), roll (B,88,T), lengths (B,)) — reference collate_fn
    semantics (train_transcriber.py:23-39)
  * ``Loader``: shuffled epoch iteration with a thread pool decoding items
    ahead of consumption (WAV decode / np.fft release the GIL)
  * ``device_prefetch``: keeps N batches in flight on device, sharded over
    the mesh batch axis when one is given

Static-shape discipline: with ``pad_to`` set, every batch pads time to the
same value so the jitted train step compiles once (the reference pads only
to the per-batch max, recompiling-equivalent behavior in torch is free; on
TPU it would trigger recompiles).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from music_transcription_tpu.config import NUM_KEYS


def collate_mel(items: list, pad_to: int | None = None):
    """[(mel (M,T_i), roll (88,T_i))] -> (mel (B,1,M,T), roll (B,88,T), lengths).

    Buffers are ``np.empty`` with only the pad *tail* zeroed — at the cached
    steady state (fixed 30 s chunks, 1-frame pad to the static T) a full
    ``np.zeros`` pre-pass doubled host memory traffic and showed up as the
    single-core feed bottleneck (scripts/bench_loader.py).
    """
    lengths = np.array([m.shape[-1] for m, _ in items], np.int32)
    max_t = int(pad_to) if pad_to else int(lengths.max())
    b = len(items)
    n_mels = items[0][0].shape[0]
    mel = np.empty((b, 1, n_mels, max_t), np.float32)
    roll = np.empty((b, NUM_KEYS, max_t), np.float32)
    for i, (m, r) in enumerate(items):
        t = min(m.shape[-1], max_t)
        mel[i, 0, :, :t] = m[:, :t]
        mel[i, 0, :, t:] = 0.0
        tr = min(r.shape[-1], max_t)
        roll[i, :, :tr] = r[:, :tr]
        roll[i, :, tr:] = 0.0
    lengths = np.minimum(lengths, max_t)
    return mel, roll, lengths


def collate_tokens(items: list, pad_to: int | None = None):
    """[(waveform (n_i,), tokens (L,))] -> (wave (B,N), tokens (B,L))
    for the AST tier (reference train_transcriber.py:70-88)."""
    n = max(w.shape[-1] for w, _ in items) if pad_to is None else int(pad_to)
    b = len(items)
    wave = np.zeros((b, n), np.float32)
    for i, (w, _) in enumerate(items):
        t = min(w.shape[-1], n)
        wave[i, :t] = w[:t]
    tokens = np.stack([np.asarray(t, np.int64) for _, t in items])
    return wave, tokens


def collate_wave_roll(items: list, pad_to: int | None = None,
                      roll_pad_to: int | None = None):
    """[(waveform (n_i,), roll (88,T_i))] -> (wave (B,N), roll (B,88,T),
    lengths (B,)) for frame-supervised encoder pretraining (the AST tier's
    waveform input with the CNN tier's masked-BCE targets)."""
    n = max(w.shape[-1] for w, _ in items) if pad_to is None else int(pad_to)
    lengths = np.array([r.shape[-1] for _, r in items], np.int32)
    max_t = int(roll_pad_to) if roll_pad_to else int(lengths.max())
    b = len(items)
    wave = np.zeros((b, n), np.float32)
    roll = np.zeros((b, NUM_KEYS, max_t), np.float32)
    for i, (w, r) in enumerate(items):
        t = min(w.shape[-1], n)
        wave[i, :t] = w[:t]
        tr = min(r.shape[-1], max_t)
        roll[i, :, :tr] = r[:, :tr]
    return wave, roll, np.minimum(lengths, max_t)


class Loader:
    """Minimal epoch loader over an indexable dataset.

    Threaded item decode with bounded lookahead; deterministic order given
    ``seed`` (reshuffled per epoch like torch's shuffle=True).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = False,
        collate=collate_mel,
        pad_to: int | None = None,
        pad_last_batch: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.collate = collate
        self.pad_to = pad_to
        # Pad the tail batch to the full batch_size with zero rows
        # (lengths == 0 -> exactly neutral under the masked loss): every
        # batch keeps ONE static shape (no tail-shape recompile) and stays
        # shardable over any mesh. For evaluation; training drops the tail
        # instead (BatchNorm batch stats are not padding-neutral).
        self.pad_last_batch = pad_last_batch and not drop_last
        self.epoch = 0

    def _maybe_pad(self, batch):
        if not self.pad_last_batch or batch[0].shape[0] == self.batch_size:
            return batch
        from music_transcription_tpu.parallel.mesh import pad_to_multiple

        return tuple(pad_to_multiple(np.asarray(a), self.batch_size)[0] for a in batch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self):
        order = self._order()
        self.epoch += 1
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_batches)
        ]
        if self.num_workers == 0:
            for bidx in batches:
                yield self._maybe_pad(
                    self.collate([self.dataset[int(i)] for i in bidx], pad_to=self.pad_to)
                )
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            lookahead = max(2, self.num_workers)
            futures = []
            bi = 0

            def submit(bidx):
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in bidx]

            while bi < len(batches) and len(futures) < lookahead:
                futures.append(submit(batches[bi]))
                bi += 1
            while futures:
                fs = futures.pop(0)
                if bi < len(batches):
                    futures.append(submit(batches[bi]))
                    bi += 1
                yield self._maybe_pad(self.collate([f.result() for f in fs], pad_to=self.pad_to))


def stage_to_device(dataset, collate, *, pad_to: int | None = None,
                    limit: int | None = None, verbose: bool = False,
                    num_workers: int = 4,
                    compact_fields: tuple[int, ...] = (),
                    bf16_fields: tuple[int, ...] = (),
                    u8_fields: tuple[int, ...] = (),
                    indices=None):
    """Stage a whole dataset on device as one stacked batch per field.

    Transfer-once feeding: the jitted train step then receives only int32
    index vectors (``jnp.take`` gathers the batch on device). Two reasons:

      * HBM-resident data is the TPU-native input path when it fits —
        zero per-step host->device traffic instead of tens of MB/step;
      * the tunneled axon backend retains every H2D transfer payload
        host-side (measured ~1 batch/step RSS growth — a multi-hour
        training run OOMs the host). Staging bounds the retention at one
        dataset-sized transfer.

    ``compact_fields`` stages the listed float fields as int16 at PCM16
    scale (round(x*32768), clipped): half the HBM footprint and half the
    one staging transfer. Exact for audio decoded from 16-bit PCM (every
    PCM16 sample is n/32768 and round-trips bit-identically); ~96 dB SNR
    otherwise (e.g. resampled audio). Consumers dequantize after the
    device-side gather with ``dequantize_i16`` — gathering the compact
    array then casting is cheaper than gathering float32.

    ``bf16_fields`` stages float fields as bfloat16 (half the bytes).
    Bit-equivalent for model inputs consumed at ``compute_dtype=bfloat16``
    (the first layer performs the identical round-to-nearest cast;
    f32->bf16->f32->bf16 is one rounding) — do NOT use for float32-compute
    runs or for loss targets. ``u8_fields`` stages BINARY float fields
    (piano rolls) as uint8 — exact, 4x smaller; values outside {0, 1}
    are rejected loudly. Together they stage a mel+roll cache at ~43% of
    fp32 bytes, which is what lets MAESTRO-scale mel caches skip slab
    rotation entirely on a 16 GB chip.

    Returns (device_arrays_tuple, n_items). Fields are whatever ``collate``
    produces for the full item list. ``indices`` stages an explicit subset
    (slab rotation); default is the whole dataset (up to ``limit``).
    """
    import jax

    if indices is None:
        n = len(dataset) if limit is None else min(limit, len(dataset))
        indices = range(n)
    else:
        indices = [int(i) for i in indices]
        n = len(indices)
    if num_workers > 0:
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            items = list(pool.map(dataset.__getitem__, indices))
    else:
        items = [dataset[i] for i in indices]
    host = collate(items, pad_to=pad_to)
    del items
    if compact_fields or bf16_fields or u8_fields:
        from music_transcription_tpu.data.cache import quantize_i16

        host = list(host)
        for i in compact_fields:
            if not np.issubdtype(host[i].dtype, np.floating):
                raise ValueError(
                    f"compact field {i} must be float, got {host[i].dtype}")
            host[i] = quantize_i16(host[i])
        for i in bf16_fields:
            if not np.issubdtype(host[i].dtype, np.floating):
                raise ValueError(
                    f"bf16 field {i} must be float, got {host[i].dtype}")
            import jax.numpy as jnp

            host[i] = np.asarray(host[i], dtype=jnp.bfloat16)
        for i in u8_fields:
            a = host[i]
            if not np.issubdtype(a.dtype, np.floating) or not np.isin(
                    a, (0.0, 1.0)).all():
                raise ValueError(
                    f"u8 field {i} must be a binary float array (piano "
                    f"roll); got dtype={a.dtype}")
            host[i] = a.astype(np.uint8)
        host = tuple(host)
    if verbose:
        mb = sum(a.nbytes for a in host) / 1e6
        print(f"Staging {n} items ({mb:.0f} MB) on device...")
    dev = tuple(jax.device_put(a) for a in host)
    jax.block_until_ready(dev)
    return dev, n


def dequantize_i16(a):
    """Inverse of ``cache.quantize_i16``. On-device; XLA fuses the
    cast+scale into the consumer."""
    import jax.numpy as jnp

    from music_transcription_tpu.data.cache import PCM16_SCALE

    return a.astype(jnp.float32) * (1.0 / PCM16_SCALE)


def _make_dequantizer(compact_fields=(), bf16_fields=(), u8_fields=()):
    """Per-field inverse of stage_to_device's compaction: int16 PCM
    dequantize, bf16/uint8 cast back to float32 — gathered batches come out
    dtype-identical to the streaming Loader's."""
    import jax.numpy as jnp

    cf, bf, u8 = frozenset(compact_fields), frozenset(bf16_fields), frozenset(u8_fields)

    def dq(out):
        return tuple(
            dequantize_i16(a) if i in cf
            else a.astype(jnp.float32) if i in bf or i in u8
            else a
            for i, a in enumerate(out))

    return dq


def epoch_index_batches(n: int, batch_size: int, *, shuffle: bool = True,
                        seed: int = 0, epoch: int = 0, drop_last: bool = True):
    """Index batches for one epoch over a device-staged dataset (the host
    side of transfer-once feeding: only these int32 vectors cross to the
    device per step)."""
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(idx)
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    for b in range(n_batches):
        yield idx[b * batch_size:(b + 1) * batch_size].astype(np.int32)


class DeviceStagedLoader:
    """Loader-compatible iterable over a device-staged dataset.

    ``stage_to_device`` puts the whole dataset in HBM once; iteration yields
    device-resident batches gathered by a jitted ``take`` — per-step
    host->device traffic is one int32 index vector. Single-device staging
    (mesh runs keep the streaming Loader). With ``pad_last_batch``, the tail
    batch pads its index vector to full size and zeroes the padded rows'
    lengths (last collate field), which the masked loss excludes exactly —
    same contract as Loader(pad_last_batch=True)."""

    def __init__(self, dataset, batch_size: int, *, collate=collate_mel,
                 pad_to: int | None = None, shuffle: bool = False, seed: int = 0,
                 num_workers: int = 4, drop_last: bool = False,
                 pad_last_batch: bool = False, verbose: bool = False,
                 limit: int | None = None,
                 compact_fields: tuple[int, ...] = (),
                 bf16_fields: tuple[int, ...] = (),
                 u8_fields: tuple[int, ...] = ()):
        import jax
        import jax.numpy as jnp

        self.arrays, self.n = stage_to_device(
            dataset, collate, pad_to=pad_to, num_workers=num_workers,
            verbose=verbose, limit=limit, compact_fields=compact_fields,
            bf16_fields=bf16_fields, u8_fields=u8_fields)
        self.batch_size = batch_size
        self.shuffle, self.seed = shuffle, seed
        self.drop_last = drop_last
        self.pad_last_batch = pad_last_batch and not drop_last
        self.epoch = 0

        dq = _make_dequantizer(compact_fields, bf16_fields, u8_fields)

        if self.pad_last_batch:
            # the last collate field must be per-item lengths: padded rows
            # get length 0 (exactly neutral under the masked loss)
            def gather(arrays, idx, n_real):
                out = dq(tuple(jnp.take(a, idx, axis=0) for a in arrays))
                lengths = jnp.where(jnp.arange(idx.shape[0]) < n_real, out[-1], 0)
                return out[:-1] + (lengths.astype(out[-1].dtype),)
        else:
            def gather(arrays, idx, n_real):
                return dq(tuple(jnp.take(a, idx, axis=0) for a in arrays))

        self._gather = jax.jit(gather)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self):
        import jax.numpy as jnp

        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        for b in range(len(self)):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            n_real = len(idx)
            if n_real < self.batch_size and self.pad_last_batch:
                idx = np.pad(idx, (0, self.batch_size - n_real))
            yield self._gather(self.arrays, jnp.asarray(idx.astype(np.int32)),
                               n_real)


class SlabRotatingLoader:
    """Bounded-HBM, bounded-host-RSS feeding for caches larger than HBM.

    The scale path the reference gets for free from CUDA-local DataLoaders
    (reference scripts/train_cnn.py:257-276 streams a ~34 GB mel cache
    indefinitely): here, per-step streaming is fatal on the tunneled axon
    backend (the client retains every H2D payload host-side — DESIGN.md
    "Transfer-once feeding") and whole-cache staging caps at HBM. This
    loader holds the middle: partition each epoch's permutation into
    equal-size slabs of ≤ ``slab_bytes``, stage ONE slab in HBM at a time,
    and gather batches on device from the current slab (per-step H2D = one
    int32 index vector, exactly like DeviceStagedLoader).

      * epoch semantics: a fresh global permutation every epoch is cut into
        slabs, so batch composition mixes across the whole cache over
        epochs; within an epoch, batches mix within a slab (the standard
        windowed-shuffle trade). ``passes_per_slab`` > 1 re-shuffles and
        re-walks each staged slab before rotating, amortizing stage cost
        when the link is slow (at a sampling-correlation cost).
      * double buffering: slab s+1 stages on a background thread while the
        device trains on slab s — rotation costs ~zero wall time when an
        epoch's compute exceeds its transfer. Peak HBM = 2 slabs; size
        ``slab_bytes`` accordingly.
      * equal slab sizes (the permutation's remainder items sit out the
        epoch — different ones each epoch) keep every gather one compiled
        shape; through the remote-compile relay a per-slab recompile would
        cost minutes.
      * host RSS: bounded per rotation at ~one slab (the client retention),
        NOT flat forever — compose with the train loop's
        ``rss_watermark_gb`` recycle (exit 67 + ``--resume auto``) for
        multi-hour runs. That pair is the measured survivable path.
    """

    def __init__(self, dataset, batch_size: int, *, collate=collate_mel,
                 pad_to: int | None = None, slab_bytes: float = 4e9,
                 passes_per_slab: int = 1, shuffle: bool = True, seed: int = 0,
                 num_workers: int = 4, verbose: bool = False,
                 compact_fields: tuple[int, ...] = (),
                 bf16_fields: tuple[int, ...] = (),
                 u8_fields: tuple[int, ...] = (),
                 prefetch_next_slab: bool = True):
        import jax
        import jax.numpy as jnp

        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.pad_to = pad_to
        self.shuffle, self.seed = shuffle, seed
        self.num_workers = num_workers
        self.verbose = verbose
        self.compact_fields = tuple(compact_fields)
        self.bf16_fields = tuple(bf16_fields)
        self.u8_fields = tuple(u8_fields)
        self.passes_per_slab = max(1, int(passes_per_slab))
        self.prefetch_next_slab = prefetch_next_slab
        self.epoch = 0

        n = len(dataset)
        probe = collate([dataset[0]], pad_to=pad_to)
        item_bytes = 0
        for i, a in enumerate(probe):
            b = int(np.asarray(a).nbytes)
            if i in self.compact_fields or i in self.bf16_fields:
                b //= 2  # staged as int16 / bfloat16
            elif i in self.u8_fields:
                b //= 4  # staged as uint8
            item_bytes += b
        budget_items = max(batch_size, int(slab_bytes // max(1, item_bytes)))
        self.n_slabs = max(1, -(-n // budget_items))
        # equal slabs, whole batches: one gather shape for the entire run
        self.items_per_slab = max(batch_size,
                                  (n // self.n_slabs) // batch_size * batch_size)
        self._item_bytes = item_bytes
        if verbose:
            print(f"Slab rotation: {self.n_slabs} slabs x "
                  f"{self.items_per_slab} items "
                  f"({self.items_per_slab * item_bytes / 1e9:.2f} GB/slab, "
                  f"{n} items, {item_bytes / 1e6:.2f} MB/item)")

        dq = _make_dequantizer(self.compact_fields, self.bf16_fields,
                               self.u8_fields)

        def gather(arrays, idx):
            return dq(tuple(jnp.take(a, idx, axis=0) for a in arrays))

        self._gather = jax.jit(gather)

    def __len__(self) -> int:
        return (self.n_slabs * self.passes_per_slab
                * (self.items_per_slab // self.batch_size))

    def _stage(self, idx):
        return stage_to_device(
            self.dataset, self.collate, pad_to=self.pad_to,
            num_workers=self.num_workers, compact_fields=self.compact_fields,
            bf16_fields=self.bf16_fields, u8_fields=self.u8_fields,
            indices=idx)[0]

    def __iter__(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        perm = (rng.permutation(len(self.dataset)) if self.shuffle
                else np.arange(len(self.dataset)))
        slabs = [perm[s * self.items_per_slab:(s + 1) * self.items_per_slab]
                 for s in range(self.n_slabs)]

        pool = ThreadPoolExecutor(max_workers=1) if (
            self.prefetch_next_slab and self.n_slabs > 1) else None
        pending = None
        arrays = ()
        try:
            pending = pool.submit(self._stage, slabs[0]) if pool else None
            for s in range(self.n_slabs):
                if pending is not None:
                    arrays = pending.result()
                    pending = (pool.submit(self._stage, slabs[s + 1])
                               if s + 1 < self.n_slabs else None)
                else:
                    arrays = self._stage(slabs[s])
                if self.verbose and s == 0 and self.epoch == 1:
                    mb = sum(int(a.nbytes) for a in arrays) / 1e6
                    print(f"Slab 1/{self.n_slabs} staged ({mb:.0f} MB)")
                n_batches = self.items_per_slab // self.batch_size
                last = None
                for _ in range(self.passes_per_slab):
                    order = (rng.permutation(self.items_per_slab)
                             if self.shuffle
                             else np.arange(self.items_per_slab))
                    for b in range(n_batches):
                        idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                        last = self._gather(
                            arrays, jnp.asarray(idx.astype(np.int32)))
                        yield last
                # the final gather must complete before its inputs vanish
                if last is not None:
                    jax.block_until_ready(last)
                for a in arrays:
                    a.delete()
                arrays = ()
        finally:
            # consumer abandonment (early break, exception, early stop):
            # free whatever is still staged instead of pinning HBM
            for a in arrays:
                if not a.is_deleted():
                    a.delete()
            if pending is not None and pool is not None:
                if not pending.cancel():
                    for a in pending.result():
                        a.delete()
            if pool is not None:
                pool.shutdown(wait=True)


def device_prefetch(iterator, mesh=None, depth: int = 2, pad_to_mesh: bool = False):
    """Move host batches to device ahead of consumption.

    With a mesh, arrays are sharded on axis 0 over the data axis; otherwise
    committed to the default device. Bounded queue keeps ``depth`` batches
    in flight (the pin_memory/prefetch_factor analogue).

    ``pad_to_mesh`` zero-pads a partial tail batch so it stays shardable AND
    shape-stable: the tail pads up to the first batch's row count when one
    was seen (one compiled shape for the whole epoch — tail-shape recompiles
    cost minutes through the remote-compile relay), else up to the data-axis
    multiple. Zero rows carry ``lengths == 0``, which the masked loss
    excludes from BOTH numerator and denominator — so a padded eval batch
    scores exactly the unpadded loss. (Training keeps ``drop_last`` instead:
    BatchNorm batch statistics are not padding-neutral.) Multi-host feeds
    per-process local rows, for which a global-size pad target would be
    wrong — there, size alignment is the Loader's job
    (``pad_last_batch=True``, identical on every host), and ``pad_to_mesh``
    is a no-op.

    Multi-host (jax.process_count() > 1): the iterator yields this process's
    LOCAL batch (global_batch / process_count rows, e.g. from a ProcessShard
    dataset) and leaves are assembled into global arrays with
    ``jax.make_array_from_process_local_data`` — each host feeds only its own
    addressable shards; no data crosses DCN.
    """
    import jax

    from music_transcription_tpu.parallel.mesh import (
        DATA_AXIS,
        batch_sharding,
        pad_to_multiple,
    )

    sharding = batch_sharding(mesh) if mesh is not None else jax.devices()[0]
    multihost = mesh is not None and jax.process_count() > 1
    n_data = 1
    if mesh is not None and pad_to_mesh and not multihost:
        n_data = dict(mesh.shape).get(DATA_AXIS, mesh.size)
    first_n: list[int] = []

    def pad(batch):
        leaves = jax.tree.leaves(batch)
        if not leaves:
            return batch
        n = np.shape(leaves[0])[0]
        aligned = -(-n // n_data) * n_data  # mesh-divisible ceiling
        if not first_n:
            first_n.append(aligned)
        # pad to the first batch's (aligned) size when the tail is smaller —
        # one static shape per epoch; a larger batch just mesh-aligns itself
        target = first_n[0] if aligned <= first_n[0] else aligned
        if target == n:
            return batch
        return jax.tree.map(lambda a: pad_to_multiple(np.asarray(a), target)[0], batch)

    def put(batch):
        if n_data > 1:
            batch = pad(batch)
        if multihost:
            return jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
                batch,
            )
        return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def blocking_put(item) -> bool:
        # bounded put that notices consumer abandonment (early break /
        # exception in the training loop) instead of blocking forever and
        # pinning device buffers
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not blocking_put(put(batch)):
                    return
        except BaseException as e:  # pragma: no cover
            err.append(e)
        finally:
            blocking_put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer finished or abandoned the generator: release the producer
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
