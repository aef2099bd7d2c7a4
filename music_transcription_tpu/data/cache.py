"""Preprocessed-chunk cache: write, read, verify.

Role of the reference's cached tier (reference data/cached_dataset.py:11-141,
scripts/preprocess_dataset.py:25-74,138-154) with interop both ways:

  * native chunks are ``chunk_%06d.npz`` (numpy, torch-free at runtime)
    holding 'mel'|'waveform' [+ 'tokens'] and 'roll'
  * reference caches of ``chunk_%06d.pt`` files load transparently when
    torch is importable (torch.load with the same key conventions)
  * metadata is ``{split}_metadata.pkl`` — same filename/keys as the
    reference (num_chunks, chunk_length, overlap, n_mels, sr, hop_length,
    return_waveform, tokenize) so either implementation can read a cache
    written by the other

``HybridMaestroDataset`` keeps the reference's fallback semantics: use the
cache when its chunk_length/overlap match the request, else raw loading
(reference data/cached_dataset.py:104-131).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

CHUNK_FMT = "chunk_{:06d}"


def metadata_path(cache_dir, split: str) -> str:
    return os.path.join(str(cache_dir), f"{split}_metadata.pkl")


def load_metadata(cache_dir, split: str) -> dict:
    with open(metadata_path(cache_dir, split), "rb") as f:
        return pickle.load(f)


def save_metadata(cache_dir, split: str, meta: dict) -> None:
    os.makedirs(str(cache_dir), exist_ok=True)
    with open(metadata_path(cache_dir, split), "wb") as f:
        pickle.dump(meta, f)


def chunk_path(split_dir, idx: int, fmt: str = "npz") -> str:
    return os.path.join(str(split_dir), CHUNK_FMT.format(idx) + "." + fmt)


# PCM16 codec for compact waveform storage/staging: round(x*32768) clipped
# to int16, inverse x/32768. ONE definition — encode (preprocess compaction,
# device staging) and decode (load_chunk, pipeline.dequantize_i16) must
# never desynchronize or every waveform silently scales wrong.
PCM16_SCALE = 32768.0


def quantize_i16(a: np.ndarray) -> np.ndarray:
    """Exact for audio decoded from 16-bit PCM; half-LSB error otherwise."""
    return np.clip(np.rint(a * PCM16_SCALE), -32768, 32767).astype(np.int16)


def save_chunk(split_dir, idx: int, arrays: dict) -> str:
    os.makedirs(str(split_dir), exist_ok=True)
    path = chunk_path(split_dir, idx)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)  # atomic: parallel writers produce whole files only
    return path


def load_chunk(split_dir, idx: int) -> dict:
    """Load a chunk by index: native .npz, or reference .pt via torch."""
    npz = chunk_path(split_dir, idx, "npz")
    if os.path.exists(npz):
        with np.load(npz) as z:
            out = {k: z[k] for k in z.files}
        # compact storage (preprocess --compact): waveforms as int16 at
        # PCM16 scale (exact for 16-bit-PCM sources), binary rolls as uint8.
        # Dequantized centrally so every consumer keeps the float32 contract.
        if "waveform" in out and out["waveform"].dtype == np.int16:
            out["waveform"] = out["waveform"].astype(np.float32) / PCM16_SCALE
        if "roll" in out and out["roll"].dtype == np.uint8:
            out["roll"] = out["roll"].astype(np.float32)
        return out
    pt = chunk_path(split_dir, idx, "pt")
    if os.path.exists(pt):
        import torch

        data = torch.load(pt, map_location="cpu", weights_only=False)
        out = {}
        for k, v in data.items():
            out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        return out
    raise FileNotFoundError(
        f"Cached chunk not found: {npz} (or .pt). Re-run preprocess_dataset.py"
    )


class CachedMaestroDataset:
    """reference data/cached_dataset.py:11-88 semantics.

    Items: (waveform, tokens) for tokenized caches, (waveform, roll) for
    waveform caches, (mel, roll) for mel caches. Mel items are squeezed to
    (n_mels, T) — the device pipeline adds channel dims.
    """

    def __init__(self, cache_dir, split: str = "train", verbose: bool = True,
                 subset_size: int | None = None, prefer_roll: bool = False):
        # prefer_roll: tokenized caches also carry the piano roll (the
        # preprocess CLI always stores it); return (waveform, roll) instead
        # of (waveform, tokens) — the frame-supervised encoder-pretraining
        # objective reads rolls from the same cache the decoder trains on.
        self.prefer_roll = prefer_roll
        self.cache_dir = str(cache_dir)
        self.split = split
        self.split_cache_dir = os.path.join(self.cache_dir, split)
        if not os.path.exists(metadata_path(cache_dir, split)):
            raise FileNotFoundError(
                f"Cache not found at {metadata_path(cache_dir, split)}. "
                f"Run preprocess_dataset.py first!"
            )
        self.metadata = load_metadata(cache_dir, split)
        self.num_chunks = self.metadata["num_chunks"]
        # Piece-level subsetting (raw MaestroDataset semantics: first N CSV
        # rows, reference scripts/train.py subset_size). Chunk metadata
        # records the source piece as file_idx; restrict to the first N.
        self._indices = None
        if subset_size:
            chunks = self.metadata.get("chunks")
            if not chunks or "file_idx" not in chunks[0]:
                raise ValueError(
                    f"cache {cache_dir} has no per-chunk file_idx metadata; "
                    f"subset_size needs a cache written by this repo's "
                    f"preprocess_dataset.py (re-run it — metadata is "
                    f"refreshed even when all chunks are already cached, "
                    f"no --force needed)"
                )
            self._indices = [i for i, c in enumerate(chunks)
                             if c["file_idx"] < subset_size]
            if not self._indices:
                raise ValueError(
                    f"subset_size={subset_size} selects no chunks in split "
                    f"'{split}' of {cache_dir}")
            self.num_chunks = len(self._indices)
        if not os.path.isdir(self.split_cache_dir):
            raise FileNotFoundError(
                f"Cache directory not found: {self.split_cache_dir}. "
                f"Run preprocess_dataset.py first!"
            )
        if verbose:
            print(
                f"Loaded cached {split} dataset: {self.num_chunks} chunks, "
                f"chunk_length={self.metadata.get('chunk_length')}s, "
                f"dir={self.split_cache_dir}"
            )

    def __len__(self) -> int:
        return self.num_chunks

    def __getitem__(self, idx: int):
        if self._indices is not None:
            idx = self._indices[idx]
        data = load_chunk(self.split_cache_dir, idx)
        if self.prefer_roll and "roll" not in data:
            raise KeyError(
                f"chunk {idx} of {self.split_cache_dir} stores no 'roll'; "
                f"prefer_roll needs a cache written by this repo's "
                f"preprocess_dataset.py (rolls are stored alongside tokens)")
        if "tokens" in data and not self.prefer_roll:
            return data["waveform"], data["tokens"]
        if "waveform" in data:
            return data["waveform"], data["roll"]
        mel = np.asarray(data["mel"], np.float32)
        if mel.ndim == 3:  # reference caches store (1, n_mels, T)
            mel = mel[0]
        return mel, np.asarray(data["roll"], np.float32)


class HybridMaestroDataset:
    """Cache when compatible, raw otherwise
    (reference data/cached_dataset.py:91-141)."""

    def __init__(
        self,
        root_dir,
        cache_dir="cached_dataset",
        split: str = "train",
        chunk_length: float | None = None,
        overlap: float = 0.0,
        verbose: bool = True,
        **kwargs,
    ):
        self.use_cache = False
        try:
            if os.path.exists(metadata_path(cache_dir, split)):
                meta = load_metadata(cache_dir, split)
                if meta.get("chunk_length") == chunk_length and meta.get("overlap") == overlap:
                    self.dataset = CachedMaestroDataset(
                        cache_dir, split, verbose=verbose,
                        subset_size=kwargs.get("subset_size"))
                    self.use_cache = True
                    if verbose:
                        print("✓ Using cached dataset (fast mode!)")
                    return
        except Exception:
            pass
        from music_transcription_tpu.data.maestro import MaestroDataset

        self.dataset = MaestroDataset(
            root_dir=root_dir, split=split, chunk_length=chunk_length, overlap=overlap, **kwargs
        )
        if verbose:
            print("⚠ Using raw dataset (slow mode). Run preprocess_dataset.py for a speedup!")

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int):
        return self.dataset[idx]


def verify_cache(cache_dir, split: str) -> tuple[bool, str]:
    """Count + spot-load integrity check
    (reference scripts/preprocess_dataset.py:420-466)."""
    try:
        meta = load_metadata(cache_dir, split)
    except FileNotFoundError:
        return False, f"missing metadata for split '{split}'"
    split_dir = os.path.join(str(cache_dir), split)
    if meta.get("num_chunks") == 0:
        # a legitimately empty split (e.g. a tiny dataset with no test
        # pieces) writes no chunk files and may not create the directory
        return True, "0 chunks (empty split)"
    if not os.path.isdir(split_dir):
        return False, f"missing split directory {split_dir}"
    n_files = len(
        [f for f in os.listdir(split_dir) if f.startswith("chunk_") and not f.endswith(".tmp.npz")]
    )
    if n_files != meta["num_chunks"]:
        return False, f"chunk count mismatch: metadata={meta['num_chunks']} files={n_files}"
    try:
        data = load_chunk(split_dir, 0)
    except Exception as e:  # pragma: no cover
        return False, f"failed to load chunk 0: {e}"
    want_keys = {"tokens", "waveform"} if meta.get("tokenize") else (
        {"waveform", "roll"} if meta.get("return_waveform") else {"mel", "roll"}
    )
    if not want_keys <= set(data):
        return False, f"chunk 0 keys {sorted(data)} missing {sorted(want_keys - set(data))}"
    return True, f"{meta['num_chunks']} chunks ok"
