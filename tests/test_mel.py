"""Mel frontend tests: JAX vs numpy golden, STFT vs torch.stft oracle,
librosa-convention invariants."""

import numpy as np
import pytest

from music_transcription_tpu.config import AudioConfig
from music_transcription_tpu.ops import mel as MEL

CFG = AudioConfig()  # shipped config: sr=16000, hop=512, n_fft=2048, n_mels=320


def test_frame_counts():
    assert MEL.num_frames(CFG.chunk_samples, CFG.hop_length) == 938
    assert CFG.mel_frames_per_chunk == 938
    assert CFG.roll_frames_per_chunk == 937


def test_hann_window_periodic():
    w = MEL.hann_window(8)
    # periodic hann: w[0]=0, symmetric around N/2 excluding endpoint
    assert w[0] == 0.0
    assert w[4] == pytest.approx(1.0)
    assert w[1] == pytest.approx(w[7])


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    assert np.allclose(MEL.mel_to_hz(MEL.hz_to_mel(f)), f, atol=1e-6)
    # linear below 1 kHz: 200 Hz -> 3 mel exactly (Slaney scale)
    assert MEL.hz_to_mel(np.array([200.0]))[0] == pytest.approx(3.0)
    # 1 kHz boundary: 15 mel
    assert MEL.hz_to_mel(np.array([1000.0]))[0] == pytest.approx(15.0)


def test_mel_filterbank_shape_and_coverage():
    fb = MEL.mel_filterbank(16000, 2048, 320)
    assert fb.shape == (320, 1025)
    assert (fb >= 0).all()
    # Every filter must be non-empty at this resolution
    assert (fb.sum(axis=1) > 0).all()
    # Slaney normalization: each filter integrates (over Hz) to ~2/width * area = 1;
    # check a coarse invariant instead: peak of each triangular filter scales
    # inversely with its bandwidth.
    widths = np.count_nonzero(fb, axis=1)
    peaks = fb.max(axis=1)
    # wider filters (higher freq) have lower peaks
    assert peaks[0] > peaks[-1]
    assert widths[0] < widths[-1]


def test_stft_matches_torch_oracle():
    """Framing + window + rfft must equal torch.stft with librosa-0.10
    settings (center=True, zero padding, periodic hann)."""
    import torch

    rng = np.random.default_rng(42)
    y = rng.standard_normal(16000 * 2).astype(np.float32)
    t = MEL.num_frames(len(y), CFG.hop_length)

    padded = np.pad(y, CFG.n_fft // 2)
    import jax.numpy as jnp

    frames = MEL._frame_signal(jnp.asarray(padded)[None], CFG.n_fft, CFG.hop_length, t)[0]
    win = MEL._padded_window(CFG.n_fft, CFG.n_fft).astype(np.float32)
    ours = np.fft.rfft(np.asarray(frames) * win, axis=-1)  # (T, 1025)

    ref = torch.stft(
        torch.from_numpy(y),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        window=torch.hann_window(CFG.n_fft, periodic=True),
        center=True,
        pad_mode="constant",
        return_complex=True,
    ).numpy()  # (1025, T)
    assert ref.shape == (1025, t)
    assert np.abs(ours.T - ref).max() < 1e-2 * np.abs(ref).max()


def test_log_mel_numpy_vs_jax():
    rng = np.random.default_rng(0)
    y = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    ref = MEL.log_mel_numpy(y, CFG)
    import jax.numpy as jnp

    got = np.asarray(MEL.log_mel(jnp.asarray(y), CFG))
    assert got.shape == ref.shape == (320, MEL.num_frames(16000, 512))
    # dB scale; the fp64 oracle vs fp32 device path differ at the level
    # librosa's own float32 path does (~0.03 dB on white noise).
    assert np.abs(got - ref).max() < 6e-2


def test_log_mel_batch_per_sample_db_floor():
    """top_db floor must be computed per batch element (per chunk)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    loud = (0.9 * rng.standard_normal(8192)).astype(np.float32)
    quiet = (1e-6 * rng.standard_normal(8192)).astype(np.float32)
    batch = np.asarray(MEL.log_mel_batch(jnp.stack([jnp.asarray(loud), jnp.asarray(quiet)]), CFG))
    single_quiet = np.asarray(MEL.log_mel(jnp.asarray(quiet), CFG))
    assert np.abs(batch[1] - single_quiet).max() < 1e-4
    # dynamic range of each sample is capped at top_db
    for i in range(2):
        rng_db = batch[i].max() - batch[i].min()
        assert rng_db <= CFG.top_db + 1e-3


def test_log_mel_sine_peaks_at_expected_mel_bin():
    sr = 16000
    freq = 440.0
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    m = MEL.log_mel_numpy(y, CFG)
    peak_bin = m.mean(axis=1).argmax()
    # expected mel bin for 440 Hz
    mel_pts = MEL.mel_to_hz(
        np.linspace(MEL.hz_to_mel(0.0), MEL.hz_to_mel(8000.0), CFG.n_mels + 2)
    )
    centers = mel_pts[1:-1]
    expected = np.abs(centers - freq).argmin()
    assert abs(int(peak_bin) - int(expected)) <= 1


def test_log_mel_chunks_matches_loop():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    small = AudioConfig(n_mels=64, chunk_length=1.0)
    chunks = (0.2 * rng.standard_normal((3, small.chunk_samples))).astype(np.float32)
    batched = np.asarray(MEL.log_mel_chunks(jnp.asarray(chunks), small))
    for i in range(3):
        single = MEL.log_mel_numpy(chunks[i], small)
        assert np.abs(batched[i] - single).max() < 6e-2


def test_log_mel_gather_framing_path():
    """hop that does not divide n_fft exercises the gather framing fallback."""
    import jax.numpy as jnp

    cfg = AudioConfig(n_mels=32, hop_length=500, n_fft=2048, chunk_length=1.0)
    rng = np.random.default_rng(3)
    y = (0.1 * rng.standard_normal(8000)).astype(np.float32)
    ref = MEL.log_mel_numpy(y, cfg)
    got = np.asarray(MEL.log_mel(jnp.asarray(y), cfg))
    assert got.shape == ref.shape == (32, 1 + 8000 // 500)
    assert np.abs(got - ref).max() < 6e-2


def test_log_mel_fft_and_matmul_paths_agree():
    import jax.numpy as jnp

    cfg = AudioConfig(n_mels=32, chunk_length=1.0)
    rng = np.random.default_rng(4)
    y = jnp.asarray((0.3 * rng.standard_normal((2, 8192))).astype(np.float32))
    a = np.asarray(MEL.log_mel_batch(y, cfg, use_fft=True))
    b = np.asarray(MEL.log_mel_batch(y, cfg, use_fft=False))
    assert np.abs(a - b).max() < 6e-2


def test_log_mel_custom_win_length():
    import jax.numpy as jnp

    cfg = AudioConfig(n_mels=32, win_length=1024, chunk_length=1.0)
    rng = np.random.default_rng(5)
    y = (0.1 * rng.standard_normal(6000)).astype(np.float32)
    ref = MEL.log_mel_numpy(y, cfg)
    got = np.asarray(MEL.log_mel(jnp.asarray(y), cfg))
    assert np.abs(got - ref).max() < 6e-2
