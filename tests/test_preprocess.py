"""Preprocess subsystem tests: host/device parity, CLI modes, tokenizer."""

import os
import subprocess
import sys

import numpy as np
import pytest

from music_transcription_tpu.config import AudioConfig
from music_transcription_tpu.data import cache as C
from music_transcription_tpu.data.preprocess import preprocess_split
from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

from tests.maestro_fixture import make_maestro_root

CFG = AudioConfig(n_mels=32, chunk_length=2.0)


@pytest.fixture(scope="module")
def maestro_root(tmp_path_factory):
    return make_maestro_root(tmp_path_factory.mktemp("maestro"))


def test_preprocess_mel_host_path(maestro_root, tmp_path):
    cache_dir = tmp_path / "cache_host"
    stats = preprocess_split(
        root_dir=maestro_root, cache_dir=cache_dir, split="train",
        audio_cfg=CFG, chunk_length=2.0, use_device=False, num_workers=1,
    )
    assert stats == {"total": 5, "processed": 5, "skipped": 0, "failed": 0}
    ok, msg = C.verify_cache(cache_dir, "train")
    assert ok, msg
    # skip-if-exists on rerun
    stats2 = preprocess_split(
        root_dir=maestro_root, cache_dir=cache_dir, split="train",
        audio_cfg=CFG, chunk_length=2.0, use_device=False, num_workers=1,
    )
    assert stats2["processed"] == 0 and stats2["skipped"] == 5


def test_device_path_bit_identical_to_host(maestro_root, tmp_path):
    """Padded-to-chunk device mel trimmed back must equal unpadded host mel."""
    host_dir = tmp_path / "host"
    dev_dir = tmp_path / "dev"
    for d, use_dev in ((host_dir, False), (dev_dir, True)):
        preprocess_split(
            root_dir=maestro_root, cache_dir=d, split="train", audio_cfg=CFG,
            chunk_length=2.0, use_device=use_dev, num_workers=1, device_batch=2,
            verbose=False,
        )
    for i in range(5):
        h = C.load_chunk(host_dir / "train", i)
        v = C.load_chunk(dev_dir / "train", i)
        assert h["mel"].shape == v["mel"].shape
        # fp32 fft CPU-vs-jax tolerance (same as mel tests)
        assert np.abs(h["mel"] - v["mel"]).max() < 6e-2
        assert np.array_equal(h["roll"], v["roll"])


def test_preprocess_multiprocessing(maestro_root, tmp_path):
    cache_dir = tmp_path / "cache_mp"
    stats = preprocess_split(
        root_dir=maestro_root, cache_dir=cache_dir, split="train",
        audio_cfg=CFG, chunk_length=2.0, use_device=False, num_workers=2,
        verbose=False,
    )
    assert stats["processed"] == 5 and stats["failed"] == 0
    ok, msg = C.verify_cache(cache_dir, "train")
    assert ok, msg


def test_preprocess_waveform_and_tokenize(maestro_root, tmp_path):
    cache_dir = tmp_path / "cache_tok"
    preprocess_split(
        root_dir=maestro_root, cache_dir=cache_dir, split="train",
        audio_cfg=CFG, chunk_length=2.0, tokenize=True, use_device=False,
        num_workers=1, verbose=False,
    )
    data = C.load_chunk(cache_dir / "train", 0)
    assert set(data) == {"waveform", "tokens", "roll"}
    assert data["tokens"].shape == (512,)
    cds = C.CachedMaestroDataset(cache_dir, "train", verbose=False)
    wave, tokens = cds[0]  # tokenized cache returns (waveform, tokens)
    assert tokens.shape == (512,)


def test_preprocess_token_len(maestro_root, tmp_path):
    """--token_len raises the per-chunk token cap (dense 30 s chunks overflow
    the 512 default: 56% hit the cap on the v4 corpus)."""
    cache_dir = tmp_path / "cache_tok1k"
    preprocess_split(
        root_dir=maestro_root, cache_dir=cache_dir, split="train",
        audio_cfg=CFG, chunk_length=2.0, tokenize=True, use_device=False,
        num_workers=1, verbose=False, token_len=1024,
    )
    data = C.load_chunk(cache_dir / "train", 0)
    assert data["tokens"].shape == (1024,)


def test_preprocess_compact_waveform_cache(maestro_root, tmp_path):
    """--compact stores int16 waveforms + uint8 binary rolls (~2.2x smaller)
    and the reader dequantizes transparently: items read back from a compact
    cache equal the plain cache's exactly (fixture WAVs are 16-bit PCM at the
    native sample rate, so the PCM16 grid round-trips)."""
    plain_dir, compact_dir = tmp_path / "plain", tmp_path / "compact"
    for d, compact in ((plain_dir, False), (compact_dir, True)):
        preprocess_split(
            root_dir=maestro_root, cache_dir=d, split="train", audio_cfg=CFG,
            chunk_length=2.0, tokenize=True, use_device=False, num_workers=1,
            verbose=False, compact=compact,
        )
    # on-disk dtypes are compact...
    with np.load(C.chunk_path(compact_dir / "train", 0)) as z:
        assert z["waveform"].dtype == np.int16
        assert z["roll"].dtype == np.uint8
    size = lambda d: sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(d) for f in fs)
    assert size(compact_dir) < 0.6 * size(plain_dir)
    # ...and every consumer-visible array is unchanged
    for i in range(5):
        p, c = C.load_chunk(plain_dir / "train", i), C.load_chunk(compact_dir / "train", i)
        assert c["waveform"].dtype == c["roll"].dtype == np.float32
        for k in p:
            np.testing.assert_array_equal(p[k], c[k], err_msg=k)
    ok, msg = C.verify_cache(compact_dir, "train")
    assert ok, msg


# ---------------------------------------------------------------------------
# REMI tokenizer
# ---------------------------------------------------------------------------


def test_remi_vocab_layout():
    tok = REMITokenizer()
    assert (tok.sos, tok.eos, tok.pad) == (0, 1, 2)
    assert tok.note_on_id(0) == 10 and tok.note_on_id(87) == 97
    assert tok.note_off_id(0) == 110 and tok.note_off_id(87) == 197
    assert tok.velocity_id(0) == 210
    assert tok.time_shift_id(1) == 300 and tok.time_shift_id(100) == 399
    assert tok.time_shift_id(500) == 399  # clamped
    # out-of-vocab -> pad
    small = REMITokenizer(vocab_size=100)
    assert small.note_off_id(80) == small.pad


def test_remi_roundtrip():
    tok = REMITokenizer()
    roll = np.zeros((88, 50), np.float32)
    roll[10, 5:15] = 1
    roll[40, 0:3] = 1
    roll[87, 20:21] = 1
    seq = tok.encode_from_pianoroll(roll, max_len=256)
    assert seq[0] == tok.sos
    assert tok.eos in seq
    assert len(seq) == 256
    decoded = tok.decode_to_pianoroll(seq, max_t=50)
    assert decoded.shape[0] == 88
    t = decoded.shape[1]
    assert np.array_equal(decoded, roll[:, :t])
    assert t == 50


def test_remi_time_shift_merging():
    tok = REMITokenizer()
    roll = np.zeros((88, 40), np.float32)  # all silence
    seq = [s for s in tok.encode_from_pianoroll(roll, max_len=64) if s != tok.pad]
    # sos + one merged time shift (40 frames) + eos
    assert seq == [tok.sos, tok.time_shift_id(40), tok.eos]


def test_remi_accepts_transposed_roll():
    tok = REMITokenizer()
    roll = np.zeros((88, 30), np.float32)
    roll[5, 10:20] = 1
    a = tok.encode_from_pianoroll(roll)
    b = tok.encode_from_pianoroll(roll.T)
    assert a == b


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _run_cli(args, cwd):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "preprocess_dataset.py"),
         "--device", "cpu"] + args,
        capture_output=True, text=True, env=env, timeout=600, cwd=str(cwd),
    )


def test_cli_dry_run(maestro_root, tmp_path):
    proc = _run_cli(["--root_dir", str(maestro_root), "--dry_run", "--n_mels", "32"], tmp_path)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "DRY RUN" in proc.stdout
    assert "cached_dataset_mels32" in proc.stdout


def test_cli_tokenize_requires_waveform(tmp_path):
    proc = _run_cli(["--tokenize"], tmp_path)
    assert proc.returncode == 1
    assert "--tokenize requires --waveform" in proc.stdout


def test_cli_full_run_and_info_and_verify(maestro_root, tmp_path):
    cache_dir = tmp_path / "clicache"
    proc = _run_cli(
        ["--root_dir", str(maestro_root), "--cache_dir", str(cache_dir),
         "--splits", "train,validation", "--chunk_length", "2.0",
         "--n_mels", "32", "--verify"],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "verify: OK" in proc.stdout
    info = _run_cli(["--cache_dir", str(cache_dir), "--show_cache_info"], tmp_path)
    assert info.returncode == 0
    assert "train: 5 chunks" in info.stdout
    # 3 s file, 2 s chunks: tail is exactly 50% of the window, kept (>=)
    assert "validation: 2 chunks" in info.stdout


def test_remi_decode_out_of_range_note_on_ignored():
    """Generated ids 98-109 map past pitch 87; decode must not crash."""
    tok = REMITokenizer()
    roll = tok.decode_to_pianoroll([0, 98, 109, 305, 1], max_t=16)
    assert roll.shape[0] == 88
    assert roll.sum() == 0  # nothing valid was played


def test_device_path_tail_transient_floor(maestro_root, tmp_path):
    """A loud transient at the very end of a tail chunk must not shift the
    dB floor via padded boundary frames (floor ranges over retained frames
    only, like the host path)."""
    import wave as wavmod

    from tests.maestro_fixture import write_wav

    root = tmp_path / "root"
    import os

    # 3.0 s file: near-silence then a hard final transient; chunk 2.0 s ->
    # tail chunk of 1.0 s ending exactly at the transient.
    sr = 16000
    y = np.full(3 * sr, 1e-4, np.float32)
    y[-800:] = 0.9  # loud burst in the final 50 ms
    write_wav(root / "2020" / "p.wav", y, sr)
    from music_transcription_tpu.data import midi as M

    os.makedirs(root / "2020", exist_ok=True)
    M.save_midi(M.notes_to_midi([M.Note(pitch=60, start=0.2, end=0.4)]), root / "2020" / "p.midi")
    import pandas as pd

    pd.DataFrame([dict(canonical_composer="x", canonical_title="p", split="train",
                       year=2020, midi_filename="2020/p.midi",
                       audio_filename="2020/p.wav", duration=3.0)]).to_csv(
        root / "maestro-v3.0.0.csv", index=False)

    host_dir = tmp_path / "h"
    dev_dir = tmp_path / "d"
    for d, use_dev in ((host_dir, False), (dev_dir, True)):
        preprocess_split(root_dir=root, cache_dir=d, split="train", audio_cfg=CFG,
                         chunk_length=2.0, use_device=use_dev, num_workers=1,
                         verbose=False)
    h = C.load_chunk(host_dir / "train", 1)  # the tail chunk
    v = C.load_chunk(dev_dir / "train", 1)
    assert h["mel"].shape == v["mel"].shape
    assert np.abs(h["mel"] - v["mel"]).max() < 6e-2
