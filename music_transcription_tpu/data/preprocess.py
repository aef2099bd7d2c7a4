"""Dataset preprocessing: MAESTRO -> per-chunk cache files.

Role of reference scripts/preprocess_dataset.py:25-250 with two execution
paths:

  * **device path** (default with an accelerator): host threads decode audio
    windows + piano rolls, the log-mel runs on device in fixed-shape batches
    (ops/mel.log_mel_chunks). Tail chunks are zero-padded to chunk_samples,
    the mel trimmed back to 1 + n//hop frames (equal to the unpadded
    computation: center-padding sees the same zeros) and the per-chunk
    top_db floor applied on host over exactly the retained frames — so
    cached features match the host path (tested, incl. tail transients).
  * **host path** (``num_workers > 1`` or no accelerator): a multiprocessing
    pool mirroring the reference's fan-out; each worker owns its dataset
    instance and writes disjoint chunk files (skip-if-exists, atomic rename).

Metadata written per split matches the reference keys
(scripts/preprocess_dataset.py:138-154).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from music_transcription_tpu.config import AudioConfig
from music_transcription_tpu.data import cache as C
from music_transcription_tpu.data.maestro import MaestroDataset


def _dataset_kwargs(root_dir, split, audio_cfg, chunk_length, overlap):
    return dict(
        root_dir=root_dir,
        split=split,
        audio_cfg=audio_cfg,
        chunk_length=chunk_length,
        overlap=overlap,
        return_waveform=True,  # decode once; mel computed here
    )


def _tokens_for(roll, max_len=512):
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

    return np.asarray(REMITokenizer().encode_from_pianoroll(roll, max_len=max_len), np.int64)


def _compact_arrays(arrays):
    """Compact storage: waveform -> int16 at PCM16 scale (exact for 16-bit
    PCM sources, half-LSB error after resampling), binary roll -> uint8.
    cache.load_chunk dequantizes by dtype, so readers are unchanged.
    ~2.2x smaller waveform caches (disk is the data-scaling constraint)."""
    out = dict(arrays)
    if "waveform" in out:
        out["waveform"] = C.quantize_i16(out["waveform"])
    roll = out.get("roll")
    # only a strictly-binary roll is exactly representable; anything else
    # (e.g. velocity-valued targets) stays float32
    if roll is not None and roll.size and np.isin(roll, (0.0, 1.0)).all():
        out["roll"] = roll.astype(np.uint8)
    return out


def _save_one(split_dir, idx, wave, roll, *, mel, tokenize, return_waveform,
              audio_cfg, compact=False, token_len=512):
    if tokenize:
        arrays = {"waveform": wave, "tokens": _tokens_for(roll, max_len=token_len),
                  "roll": roll}
    elif return_waveform:
        arrays = {"waveform": wave, "roll": roll}
    else:
        min_len = min(mel.shape[1], roll.shape[1])
        arrays = {"mel": mel[:, :min_len], "roll": roll[:, :min_len]}
    C.save_chunk(split_dir, idx, _compact_arrays(arrays) if compact else arrays)


def _host_worker(args):
    """Pool worker: own dataset instance, one chunk (reference :25-74)."""
    (idx, ds_kwargs, split_dir, force, return_waveform, tokenize, audio_cfg,
     compact, token_len) = args
    if os.path.exists(C.chunk_path(split_dir, idx)) and not force:
        return (True, True)
    try:
        key = tuple(sorted((k, str(v)) for k, v in ds_kwargs.items()))
        dataset = _WORKER_CACHE.get(key)
        if dataset is None:
            dataset = _WORKER_CACHE[key] = MaestroDataset(**ds_kwargs)
        wave, roll = dataset[idx]
        mel = None
        if not return_waveform and not tokenize:
            from music_transcription_tpu.ops.mel import log_mel_numpy

            mel = log_mel_numpy(wave, audio_cfg)
        _save_one(split_dir, idx, wave, roll, mel=mel, tokenize=tokenize,
                  return_waveform=return_waveform, audio_cfg=audio_cfg,
                  compact=compact, token_len=token_len)
        return (True, False)
    except Exception as e:  # pragma: no cover
        print(f"\nError processing chunk {idx}: {e}")
        return (False, False)


_WORKER_CACHE: dict = {}


def preprocess_split(
    *,
    root_dir,
    cache_dir,
    split: str,
    audio_cfg: AudioConfig,
    chunk_length: float = 30.0,
    overlap: float = 0.0,
    return_waveform: bool = False,
    tokenize: bool = False,
    force: bool = False,
    num_workers: int = 1,
    use_device: bool | None = None,
    device_batch: int = 32,
    verbose: bool = True,
    compact: bool = False,
    token_len: int = 512,
) -> dict:
    """Preprocess one split; returns stats {total, processed, skipped, failed}."""
    ds_kwargs = _dataset_kwargs(root_dir, split, audio_cfg, chunk_length, overlap)
    dataset = MaestroDataset(**ds_kwargs)
    n = len(dataset)
    split_dir = os.path.join(str(cache_dir), split)

    meta = {
        "num_chunks": n,
        "chunk_length": chunk_length,
        "overlap": overlap,
        "n_mels": audio_cfg.n_mels,
        "sr": audio_cfg.sample_rate,
        "hop_length": audio_cfg.hop_length,
        "return_waveform": bool(return_waveform or tokenize),
        "tokenize": bool(tokenize),
        "token_len": int(token_len) if tokenize else None,
        "compact": bool(compact),
        "chunks": dataset.chunks,
    }

    todo = [i for i in range(n) if force or not os.path.exists(C.chunk_path(split_dir, i))]
    skipped = n - len(todo)
    stats = {"total": n, "processed": 0, "skipped": skipped, "failed": 0}
    if not todo:
        C.save_metadata(cache_dir, split, meta)
        if verbose:
            print(f"[{split}] all {n} chunks already cached")
        return stats

    if use_device is None:
        import jax

        use_device = (
            not return_waveform and not tokenize and jax.default_backend() != "cpu"
        )

    if use_device and not return_waveform and not tokenize:
        _preprocess_device(dataset, todo, split_dir, audio_cfg, device_batch,
                           num_workers, stats, verbose, compact=compact)
    elif num_workers > 1:
        # spawn, not fork: the parent has imported JAX (multithreaded) by the
        # time the pool starts, and fork() of a multithreaded process can
        # deadlock in the children. Workers rebuild their own dataset from
        # pickled kwargs anyway (_WORKER_CACHE), so spawn costs only startup.
        from multiprocessing import get_context

        args = [
            (i, ds_kwargs, split_dir, force, return_waveform or tokenize,
             tokenize, audio_cfg, compact, token_len)
            for i in todo
        ]
        with get_context("spawn").Pool(num_workers) as pool:
            for ok, was_skipped in pool.imap_unordered(_host_worker, args):
                stats["processed" if ok and not was_skipped else
                      "skipped" if ok else "failed"] += 1
    else:
        for i in todo:
            ok, was_skipped = _host_worker(
                (i, ds_kwargs, split_dir, force, return_waveform or tokenize,
                 tokenize, audio_cfg, compact, token_len)
            )
            stats["processed" if ok and not was_skipped else
                  "skipped" if ok else "failed"] += 1

    # Metadata is written only once every chunk was attempted and none
    # failed — an interrupted or partially-failed run must NOT leave a cache
    # that claims completeness (HybridMaestroDataset trusts the metadata and
    # a stale one turns into FileNotFoundError mid-training).
    if stats["failed"] == 0:
        C.save_metadata(cache_dir, split, meta)
    elif verbose:
        print(f"[{split}] {stats['failed']} chunks failed; metadata NOT "
              f"written (re-run to retry the failures)")
    if verbose:
        print(f"[{split}] processed={stats['processed']} skipped={stats['skipped']} "
              f"failed={stats['failed']} (of {n})")
    return stats


def _preprocess_device(dataset, todo, split_dir, audio_cfg, device_batch,
                       num_workers, stats, verbose, compact=False):
    """Threaded decode feeding fixed-shape device mel batches.

    Submission is windowed (not executor.map, whose workers race arbitrarily
    far ahead of the consumer and would hold a whole split's waveforms in
    RAM): at most ~2 device batches of decoded chunks are in flight."""
    import jax.numpy as jnp

    from music_transcription_tpu.ops.mel import log_mel_chunks, num_frames

    chunk_samples = audio_cfg.chunk_samples

    def decode(i):
        wave, roll = dataset[i]
        return i, wave, roll

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        window = 2 * device_batch
        futures = [(i, pool.submit(decode, i)) for i in todo[:window]]
        next_idx = len(futures)
        batch: list = []
        while futures:
            idx, fut = futures.pop(0)
            if next_idx < len(todo):
                futures.append((todo[next_idx], pool.submit(decode, todo[next_idx])))
                next_idx += 1
            try:
                item = fut.result()
            except Exception as e:  # per-chunk isolation, like the host path
                print(f"\nError processing chunk {idx}: {e}")
                stats["failed"] += 1
                continue
            batch.append(item)
            if len(batch) == device_batch or not futures:
                _flush_device_batch(batch, split_dir, audio_cfg, chunk_samples,
                                    log_mel_chunks, num_frames, jnp, stats,
                                    compact=compact)
                batch = []


def _flush_device_batch(batch, split_dir, audio_cfg, chunk_samples,
                        log_mel_chunks, num_frames, jnp, stats, compact=False):
    waves = np.zeros((len(batch), chunk_samples), np.float32)
    for bi, (_, wave, _) in enumerate(batch):
        t = min(len(wave), chunk_samples)
        waves[bi, :t] = wave[:t]
    # Floor deferred to host: for tail chunks the per-chunk top_db max must
    # range over only the RETAINED frames — padded boundary frames can see a
    # final transient and shift the clamp floor vs the unpadded host path.
    mels = np.asarray(
        log_mel_chunks(jnp.asarray(waves), audio_cfg, apply_floor=False)
    )  # (B, M, 938) unclamped dB
    for bi, (idx, wave, roll) in enumerate(batch):
        t_frames = num_frames(min(len(wave), chunk_samples), audio_cfg.hop_length)
        mel = mels[bi, :, :t_frames]
        mel = np.maximum(mel, mel.max() - audio_cfg.top_db)
        min_len = min(mel.shape[1], roll.shape[1])
        arrays = {"mel": mel[:, :min_len], "roll": roll[:, :min_len]}
        C.save_chunk(split_dir, idx, _compact_arrays(arrays) if compact else arrays)
        stats["processed"] += 1
