"""Data layer tests: MAESTRO dataset indexing/features, cache round-trips,
hybrid fallback, loader/collation."""

import numpy as np
import pytest

from music_transcription_tpu.config import AudioConfig
from music_transcription_tpu.data import cache as C
from music_transcription_tpu.data.maestro import MaestroDataset
from music_transcription_tpu.data.pipeline import Loader, collate_mel, device_prefetch

from tests.maestro_fixture import make_maestro_root

CFG = AudioConfig(n_mels=48)


@pytest.fixture(scope="module")
def maestro_root(tmp_path_factory):
    return make_maestro_root(tmp_path_factory.mktemp("maestro"))


def test_split_filtering(maestro_root):
    train = MaestroDataset(maestro_root, split="train", audio_cfg=CFG)
    val = MaestroDataset(maestro_root, split="validation", audio_cfg=CFG)
    assert len(train) == 2
    assert len(val) == 1
    year = MaestroDataset(maestro_root, split=None, year=2018, audio_cfg=CFG)
    assert len(year) == 1
    sub = MaestroDataset(maestro_root, split="train", subset_size=1, audio_cfg=CFG)
    assert len(sub) == 1


def test_v2_csv_name_autodetected(tmp_path):
    """A MAESTRO-v2 root (maestro-v2.0.0.csv) works without csv_path."""
    import os

    root = make_maestro_root(tmp_path / "v2")
    os.rename(os.path.join(root, "maestro-v3.0.0.csv"),
              os.path.join(root, "maestro-v2.0.0.csv"))
    ds = MaestroDataset(root, split="train", audio_cfg=CFG)
    assert len(ds) == 2


def test_chunk_index_semantics(maestro_root):
    # chunk_length=2s, no overlap: 4s file -> 2 chunks; 6.5s -> 3 chunks
    # (tail 0.5s < 50% of 2s dropped); 3s val file not included.
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    assert len(ds) == 5
    # 50%-of-chunk tail rule: 6.5 s = 3 full + 0.5 tail -> tail dropped
    ends = [c["end_sample"] - c["start_sample"] for c in ds.chunks]
    assert all(e >= 16000 for e in ends)


def test_chunk_overlap(maestro_root):
    ds = MaestroDataset(
        maestro_root, split="train", chunk_length=2.0, overlap=0.5, audio_cfg=CFG
    )
    hops = [
        b["start_sample"] - a["start_sample"]
        for a, b in zip(ds.chunks, ds.chunks[1:])
        if a["file_idx"] == b["file_idx"]
    ]
    assert all(h == 16000 for h in hops)  # 2s chunk, 50% overlap -> 1s hop


def test_chunk_item_shapes_and_alignment(maestro_root):
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    mel, roll = ds[0]
    assert mel.shape[0] == 48
    assert roll.shape[0] == 88
    assert mel.shape[1] == roll.shape[1]  # aligned by truncation
    # 2 s chunk: mel frames = 1 + 32000//512 = 63, roll = int(2*31.25) = 62
    assert mel.shape[1] == 62
    assert mel.dtype == np.float32 and roll.dtype == np.float32
    assert set(np.unique(roll)) <= {0.0, 1.0}


def test_chunk_roll_matches_notes(maestro_root):
    # piece0: note 60 at 0.5-1.5s. First 2 s chunk must light pitch idx 39.
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    _, roll = ds[0]
    idx = 60 - 21
    active = np.nonzero(roll[idx])[0]
    assert active.size > 0
    fs = CFG.frame_rate
    assert abs(active.min() / fs - 0.5) < 0.1
    assert abs(active.max() / fs - 1.5) < 0.1
    # no other pitch active in this chunk
    others = np.delete(np.arange(88), idx)
    assert roll[others].sum() == 0


def test_full_file_mode(maestro_root):
    ds = MaestroDataset(maestro_root, split="validation", audio_cfg=CFG)
    mel, roll = ds[0]
    assert mel.shape[0] == 48 and roll.shape[0] == 88
    assert mel.shape[1] == roll.shape[1]


def test_waveform_mode(maestro_root):
    ds = MaestroDataset(
        maestro_root, split="train", chunk_length=2.0, return_waveform=True, audio_cfg=CFG
    )
    wave, roll = ds[0]
    assert wave.ndim == 1 and wave.shape[0] == 32000
    assert roll.shape[0] == 88


# ---------------------------------------------------------------------------
# Cache
# ---------------------------------------------------------------------------


def test_cache_roundtrip_and_verify(maestro_root, tmp_path):
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    cache_dir = tmp_path / "cache"
    split_dir = cache_dir / "train"
    for i in range(len(ds)):
        mel, roll = ds[i]
        C.save_chunk(split_dir, i, {"mel": mel, "roll": roll})
    C.save_metadata(
        cache_dir,
        "train",
        {
            "num_chunks": len(ds),
            "chunk_length": 2.0,
            "overlap": 0.0,
            "n_mels": 48,
            "sr": 16000,
            "hop_length": 512,
            "return_waveform": False,
            "tokenize": False,
        },
    )
    ok, msg = C.verify_cache(cache_dir, "train")
    assert ok, msg

    cds = C.CachedMaestroDataset(cache_dir, "train", verbose=False)
    assert len(cds) == len(ds)
    mel_c, roll_c = cds[0]
    mel_r, roll_r = ds[0]
    assert np.allclose(mel_c, mel_r)
    assert np.array_equal(roll_c, roll_r)


def test_cache_subset_size_selects_first_pieces(maestro_root, tmp_path):
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    cache_dir = tmp_path / "cache"
    split_dir = cache_dir / "train"
    for i in range(len(ds)):
        mel, roll = ds[i]
        C.save_chunk(split_dir, i, {"mel": mel, "roll": roll})
    C.save_metadata(
        cache_dir, "train",
        {"num_chunks": len(ds), "chunk_length": 2.0, "overlap": 0.0,
         "n_mels": 48, "sr": 16000, "hop_length": 512,
         "return_waveform": False, "tokenize": False,
         "chunks": ds.chunks},
    )

    sub = C.CachedMaestroDataset(cache_dir, "train", verbose=False, subset_size=1)
    want = [i for i, c in enumerate(ds.chunks) if c["file_idx"] < 1]
    assert len(sub) == len(want) and 0 < len(sub) < len(ds)
    mel_s, roll_s = sub[len(want) - 1]
    mel_r, roll_r = ds[want[-1]]
    assert np.allclose(mel_s, mel_r) and np.array_equal(roll_s, roll_r)

    # raw-dataset parity: piece-level subset == MaestroDataset(subset_size=N)
    raw = MaestroDataset(maestro_root, split="train", chunk_length=2.0,
                         subset_size=1, audio_cfg=CFG)
    assert len(sub) == len(raw)

    # Hybrid forwards subset_size to the cached path
    hds = C.HybridMaestroDataset(
        maestro_root, cache_dir=cache_dir, split="train", chunk_length=2.0,
        verbose=False, subset_size=1, audio_cfg=CFG)
    assert hds.use_cache and len(hds) == len(sub)

    # a cache without per-chunk metadata refuses rather than mis-subsetting
    meta = C.load_metadata(cache_dir, "train")
    del meta["chunks"]
    C.save_metadata(cache_dir, "train", meta)
    with pytest.raises(ValueError):
        C.CachedMaestroDataset(cache_dir, "train", verbose=False, subset_size=1)


def test_cache_reads_reference_pt_format(tmp_path):
    import torch

    split_dir = tmp_path / "ptcache" / "train"
    split_dir.mkdir(parents=True)
    mel = np.random.default_rng(0).standard_normal((1, 48, 63)).astype(np.float32)
    roll = np.zeros((88, 62), np.float32)
    torch.save(
        {"mel": torch.from_numpy(mel), "roll": torch.from_numpy(roll)},
        split_dir / "chunk_000000.pt",
    )
    C.save_metadata(
        tmp_path / "ptcache", "train",
        {"num_chunks": 1, "chunk_length": 2.0, "overlap": 0.0, "n_mels": 48,
         "sr": 16000, "hop_length": 512, "return_waveform": False, "tokenize": False},
    )
    cds = C.CachedMaestroDataset(tmp_path / "ptcache", "train", verbose=False)
    mel_out, roll_out = cds[0]
    assert mel_out.shape == (48, 63)  # (1,M,T) squeezed
    assert np.allclose(mel_out, mel[0])


def test_hybrid_fallback(maestro_root, tmp_path):
    h = C.HybridMaestroDataset(
        maestro_root, cache_dir=str(tmp_path / "nope"), split="train",
        chunk_length=2.0, audio_cfg=CFG, verbose=False,
    )
    assert not h.use_cache
    assert len(h) == 5


def test_missing_cache_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        C.CachedMaestroDataset(tmp_path / "absent", "train", verbose=False)


# ---------------------------------------------------------------------------
# Loader / collate
# ---------------------------------------------------------------------------


def test_collate_pads_and_lengths():
    items = [
        (np.ones((48, 10), np.float32), np.ones((88, 10), np.float32)),
        (np.ones((48, 7), np.float32), np.ones((88, 7), np.float32)),
    ]
    mel, roll, lengths = collate_mel(items)
    assert mel.shape == (2, 1, 48, 10)
    assert roll.shape == (2, 88, 10)
    assert lengths.tolist() == [10, 7]
    assert mel[1, 0, :, 7:].sum() == 0  # padding is zero
    mel2, _, l2 = collate_mel(items, pad_to=16)
    assert mel2.shape[-1] == 16 and l2.tolist() == [10, 7]


def test_loader_batches(maestro_root):
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 5 chunks -> 2+2+1
    assert batches[0][0].shape[0] == 2
    assert batches[-1][0].shape[0] == 1
    # epoch reshuffle changes order but not multiset of lengths
    b2 = list(loader)
    assert len(b2) == 3


def test_loader_deterministic_given_seed(maestro_root):
    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    l1 = Loader(ds, batch_size=2, shuffle=True, seed=7, num_workers=0)
    l2 = Loader(ds, batch_size=2, shuffle=True, seed=7, num_workers=0)
    for (m1, _, _), (m2, _, _) in zip(l1, l2):
        assert np.array_equal(m1, m2)


def test_device_prefetch_sharded(maestro_root):
    import jax

    from music_transcription_tpu.parallel.mesh import make_mesh

    ds = MaestroDataset(maestro_root, split="train", chunk_length=2.0, audio_cfg=CFG)
    loader = Loader(ds, batch_size=4, num_workers=0, drop_last=True, pad_to=64)
    mesh = make_mesh(4)
    out = list(device_prefetch(iter(loader), mesh=mesh))
    assert len(out) == 1
    mel, roll, lengths = out[0]
    assert isinstance(mel, jax.Array)
    assert mel.shape == (4, 1, 48, 64)
    assert len(mel.sharding.device_set) == 4


def test_process_shard_partitions_everything():
    from music_transcription_tpu.parallel.distributed import ProcessShard

    data = list(range(10))
    shards = [ProcessShard(data, process_index=p, process_count=3) for p in range(3)]
    # equal lengths on every host (collective alignment); last indices wrap
    assert [len(s) for s in shards] == [4, 4, 4]
    seen = []
    for s in shards:
        seen.extend(s[i] for i in range(len(s)))
    assert set(seen) == set(data)  # full coverage (with 2 wrapped repeats)
    assert len(seen) == 12


def test_device_prefetch_abandonment_releases_producer():
    """Breaking out of device_prefetch early must not leave the producer
    blocked on a full queue."""
    import threading
    import time

    from music_transcription_tpu.data.pipeline import device_prefetch

    def batches():
        for i in range(50):
            yield np.full((4,), i, np.float32)

    before = threading.active_count()
    gen = device_prefetch(batches(), mesh=None, depth=1)
    first = next(gen)
    assert float(np.asarray(first)[0]) == 0.0
    gen.close()  # abandon
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_device_staged_loader_matches_streaming(tmp_path):
    """DeviceStagedLoader yields the same batch contents as Loader (same
    order when unshuffled), pads the tail batch with zero-length rows, and
    its shuffled epochs cover every item exactly once."""
    import jax

    from music_transcription_tpu.data.pipeline import (
        DeviceStagedLoader,
        Loader,
        collate_mel,
    )

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return (rng.standard_normal((4, 5 + i)).astype(np.float32),
                    (rng.random((88, 5 + i)) > 0.8).astype(np.float32))

    kw = dict(pad_to=12, collate=collate_mel)
    stream = Loader(DS(), 3, pad_last_batch=True, num_workers=0, **kw)
    staged = DeviceStagedLoader(DS(), 3, pad_last_batch=True, num_workers=0, **kw)
    sb, tb = list(stream), list(staged)
    assert len(sb) == len(tb) == 3
    for bi, ((m1, r1, l1), (m2, r2, l2)) in enumerate(zip(sb, tb)):
        # padded tail rows differ in CONTENT (streaming pads zero rows,
        # staged repeats a row) but both carry length 0 — identical under
        # the masked loss; compare the real rows and all lengths
        n_real = 1 if bi == 2 else 3  # 7 items, batch 3
        np.testing.assert_allclose(np.asarray(m1)[:n_real], np.asarray(m2)[:n_real])
        np.testing.assert_allclose(np.asarray(r1)[:n_real], np.asarray(r2)[:n_real])
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # tail batch: one real row (item 6, length 11) + two zero-length pads
    assert np.asarray(tb[-1][2]).tolist() == [11, 0, 0]

    # shuffled epochs: every item exactly once, different order across epochs
    staged2 = DeviceStagedLoader(DS(), 3, shuffle=True, seed=0, drop_last=False,
                                 pad_last_batch=True, num_workers=0, **kw)
    def epoch_sig(batches):
        return [tuple(np.asarray(l).tolist()) for *_ , l in batches]
    e1, e2 = epoch_sig(list(staged2)), epoch_sig(list(staged2))
    assert e1 != e2  # reshuffled per epoch


def test_device_staged_loader_compact_int16():
    """compact_fields stages the listed float fields as int16 (half the HBM
    and staging transfer) and yields dequantized float32 batches: bit-exact
    for PCM16-grid audio, <= half-LSB error otherwise; other fields and
    dtypes untouched."""
    import pytest

    from music_transcription_tpu.data.pipeline import (
        DeviceStagedLoader,
        Loader,
        collate_mel,
    )

    class GridDS:  # values on the PCM16 grid n/32768 — int16 round-trips
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            wave = rng.integers(-32768, 32768, (4, 10)).astype(np.float32) / 32768.0
            return wave, (rng.random((88, 10)) > 0.8).astype(np.float32)

    kw = dict(pad_to=10, collate=collate_mel, num_workers=0, drop_last=True)
    plain = list(Loader(GridDS(), 2, **kw))
    compact = DeviceStagedLoader(GridDS(), 2, compact_fields=(0,), **kw)
    assert compact.arrays[0].dtype == np.int16  # staged compact
    assert compact.arrays[1].dtype == np.float32  # untouched
    for (w1, r1, l1), (w2, r2, l2) in zip(plain, list(compact)):
        assert np.asarray(w2).dtype == np.float32  # dequantized on gather
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    class OffGridDS(GridDS):  # e.g. resampled audio — quantization is lossy
        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            return (rng.uniform(-1, 1, (4, 10)).astype(np.float32),
                    np.zeros((88, 10), np.float32))

    plain = list(Loader(OffGridDS(), 2, **kw))
    compact = list(DeviceStagedLoader(OffGridDS(), 2, compact_fields=(0,), **kw))
    for (w1, *_), (w2, *_) in zip(plain, compact):
        err = np.abs(np.asarray(w1) - np.asarray(w2)).max()
        assert err <= 0.5 / 32768.0 + 1e-9  # half-LSB rounding

    with pytest.raises(ValueError, match="must be float"):
        # lengths (int) are not quantizable — misuse fails loudly
        DeviceStagedLoader(GridDS(), 2, compact_fields=(2,), **kw)


class _IdDS:
    """Items carry their index in mel[0, 0] so batches are traceable."""

    def __init__(self, n=23, t=6):
        self.n, self.t = n, t

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        mel = np.full((4, self.t), float(i), np.float32)
        roll = np.zeros((88, self.t), np.float32)
        return mel, roll


def _ids_of(batches):
    # collate_mel mel field: (B, 1, n_mels, T); id lives at [., 0, 0, 0]
    return [int(v) for m, *_ in batches for v in np.asarray(m)[:, 0, 0, 0]]


def test_slab_rotating_loader_coverage_and_static_shapes():
    """SlabRotatingLoader partitions each epoch's permutation into equal
    slabs, yields every staged item exactly once per pass, keeps one static
    batch shape throughout, frees each slab's device arrays after use, and
    remixes items across slabs between epochs."""
    from music_transcription_tpu.data.pipeline import SlabRotatingLoader, collate_mel

    ds = _IdDS(n=23)
    item_bytes = sum(a.nbytes for a in collate_mel([ds[0]], pad_to=6))
    loader = SlabRotatingLoader(
        ds, 2, collate=collate_mel, pad_to=6, num_workers=0, seed=3,
        slab_bytes=item_bytes * 7)  # forces multiple slabs
    assert loader.n_slabs >= 3
    assert loader.items_per_slab % 2 == 0  # whole batches per slab

    staged_arrays = []
    orig = loader._stage

    def record(idx):
        arrays = orig(idx)
        staged_arrays.append(arrays)
        return arrays

    loader._stage = record

    batches = list(loader)
    assert len(batches) == len(loader)
    shapes = {tuple(np.asarray(b[0]).shape) for b in batches}
    assert len(shapes) == 1  # one compiled gather shape
    ids1 = _ids_of(batches)
    expected = loader.n_slabs * loader.items_per_slab
    assert len(ids1) == expected
    assert len(set(ids1)) == expected  # no duplicates within the epoch
    assert set(ids1) <= set(range(23))
    # every slab's staged arrays were freed
    assert all(a.is_deleted() for arrays in staged_arrays for a in arrays)

    ids2 = _ids_of(list(loader))
    assert ids1 != ids2  # fresh permutation: slab composition remixes


def test_slab_rotating_loader_passes_and_compact():
    """passes_per_slab re-walks each staged slab (items appear exactly
    `passes` times per epoch); compact_fields stages int16 and yields
    dequantized float32 — same contract as DeviceStagedLoader."""
    from music_transcription_tpu.data.pipeline import SlabRotatingLoader, collate_mel

    class GridDS(_IdDS):
        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            mel = rng.integers(-32768, 32768, (4, self.t)).astype(np.float32) / 32768.0
            mel[0, 0] = i / 32768.0  # id on the PCM grid (quantization-safe)
            roll = np.zeros((88, self.t), np.float32)
            return mel, roll

    ds = GridDS(n=12)
    item_bytes = sum(a.nbytes for a in collate_mel([ds[0]], pad_to=6))
    loader = SlabRotatingLoader(
        ds, 2, collate=collate_mel, pad_to=6, num_workers=0, seed=0,
        slab_bytes=item_bytes * 6, passes_per_slab=2, compact_fields=(0,))
    batches = list(loader)
    assert len(batches) == len(loader)
    ids = [int(round(v * 32768))
           for m, *_ in batches for v in np.asarray(m)[:, 0, 0, 0]]
    from collections import Counter

    counts = Counter(ids)
    assert set(counts.values()) == {2}  # each staged item seen exactly twice
    assert np.asarray(batches[0][0]).dtype == np.float32  # dequantized
    # values survive the int16 round trip (PCM16-grid data)
    i0 = ids[0]
    np.testing.assert_array_equal(np.asarray(batches[0][0])[0, 0],
                                  np.asarray(ds[i0][0]))


def test_slab_rotating_loader_abandonment_frees_slabs():
    """Breaking out mid-epoch (early stop, exception) must free the staged
    slab AND any prefetched next slab instead of pinning HBM."""
    from music_transcription_tpu.data.pipeline import SlabRotatingLoader, collate_mel

    ds = _IdDS(n=16)
    item_bytes = sum(a.nbytes for a in collate_mel([ds[0]], pad_to=6))
    loader = SlabRotatingLoader(
        ds, 2, collate=collate_mel, pad_to=6, num_workers=0,
        slab_bytes=item_bytes * 4)
    staged_arrays = []
    orig = loader._stage

    def record(idx):
        arrays = orig(idx)
        staged_arrays.append(arrays)
        return arrays

    loader._stage = record
    it = iter(loader)
    next(it)
    it.close()  # abandon after one batch
    assert staged_arrays, "nothing staged?"
    assert all(a.is_deleted() for arrays in staged_arrays for a in arrays)


def test_staged_loader_bf16_mel_u8_roll():
    """bf16_fields/u8_fields compact staging: mel stages as bfloat16 and the
    binary roll as uint8 (≈43% of fp32 bytes); gathered batches come back
    float32 with the roll exact and the mel equal to one f32->bf16 rounding
    (bit-equivalent for bf16-compute models, whose first layer performs that
    same cast)."""
    import jax.numpy as jnp
    import pytest

    from music_transcription_tpu.data.pipeline import (
        DeviceStagedLoader,
        Loader,
        collate_mel,
    )

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            mel = rng.standard_normal((4, 10)).astype(np.float32) * 40 - 40
            roll = (rng.random((88, 10)) > 0.8).astype(np.float32)
            return mel, roll

    kw = dict(pad_to=10, collate=collate_mel, num_workers=0, drop_last=True)
    plain = list(Loader(DS(), 2, **kw))
    compact = DeviceStagedLoader(DS(), 2, bf16_fields=(0,), u8_fields=(1,), **kw)
    assert compact.arrays[0].dtype == jnp.bfloat16
    assert compact.arrays[1].dtype == np.uint8
    assert compact.arrays[2].dtype == np.int32  # lengths untouched
    for (m1, r1, l1), (m2, r2, l2) in zip(plain, list(compact)):
        assert np.asarray(m2).dtype == np.float32
        assert np.asarray(r2).dtype == np.float32
        # mel: exactly the f32 -> bf16 -> f32 rounding, nothing more
        np.testing.assert_array_equal(
            np.asarray(m2), np.asarray(m1).astype(jnp.bfloat16).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))  # exact
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    class NonBinaryDS(DS):
        def __getitem__(self, i):
            mel, roll = super().__getitem__(i)
            return mel, roll * 0.7  # velocity-valued — not uint8-safe

    with pytest.raises(ValueError, match="binary"):
        DeviceStagedLoader(NonBinaryDS(), 2, u8_fields=(1,), **kw)
