"""MAESTRO dataset: metadata, chunk indexing, on-the-fly features.

Functional re-design of the reference MaestroDataset (reference
data/dataset.py:9-206) with identical indexing and numerics:

  * CSV-driven split/year/subset filtering (maestro-v3.0.0.csv by default,
    also accepts v2 roots via ``csv_path``)
  * chunk index: ``chunk_length`` windows advanced by
    ``chunk_samples * (1 - overlap)``; tail chunks kept only when >= 50% of
    the window (data/dataset.py:81-89)
  * per chunk: audio window decode -> log-mel (ops/mel.py numpy oracle on
    host, or deferred to the device pipeline), binarized 88-key piano roll
    sampled at fs = sr/hop over ``np.linspace(start, end, int(dur*fs))``
    (data/dataset.py:141-146), mel/roll aligned by truncation to min length
    (data/dataset.py:158-161)
  * ``return_waveform`` mode for the AST tier

Differences by design: audio decode is the in-repo WAV reader (MAESTRO ships
WAV; the reference's .wav->.mp3 fallback needs an external mp3 decoder and is
gated), durations come from the WAV header (no full decode), and MIDI parsing
is data/midi.py (pedal-extended rolls exactly like pretty_midi's default).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from music_transcription_tpu.config import AudioConfig
from music_transcription_tpu.data import audio as audio_io
from music_transcription_tpu.data import midi as midi_io


def _resolve_audio_path(root_dir: str, rel: str) -> str:
    """CSV audio path, with the reference's per-file .wav -> .mp3 fallback
    (reference data/dataset.py:69-71,119-121). A file present under neither
    name fails here with both tried paths, not later as a decode exception."""
    path = os.path.join(root_dir, rel)
    if os.path.exists(path):
        return path
    if path.endswith(".wav"):
        alt = path[: -len(".wav")] + ".mp3"
        if os.path.exists(alt):
            return alt
        raise FileNotFoundError(
            f"audio file not found: {path} (also tried {alt}); check the "
            f"dataset root and the CSV's audio_filename column")
    raise FileNotFoundError(
        f"audio file not found: {path}; check the dataset root and the "
        f"CSV's audio_filename column")


class MaestroDataset:
    """Chunked (or full-file) MAESTRO access.

    ``dataset[i]`` returns (mel (n_mels, T) float32, roll (88, T) float32)
    or (waveform (n,) float32, roll) in waveform mode — numpy arrays; the
    device pipeline does batching/padding.
    """

    def __init__(
        self,
        root_dir,
        csv_path=None,
        year=None,
        split: str | None = "train",
        audio_cfg: AudioConfig | None = None,
        subset_size: int | None = None,
        chunk_length: float | None = None,
        overlap: float = 0.0,
        return_waveform: bool = False,
    ):
        import pandas as pd

        self.root_dir = str(root_dir)
        self.cfg = audio_cfg or AudioConfig()
        if chunk_length is not None and chunk_length != self.cfg.chunk_length:
            self.cfg = dataclasses.replace(self.cfg, chunk_length=float(chunk_length))
        if chunk_length is not None and not (0.0 <= overlap < 1.0):
            raise ValueError(
                f"overlap must be in [0, 1); got {overlap} (overlap >= 1 "
                f"would never advance the chunk window)"
            )
        self.chunk_length = chunk_length
        self.overlap = overlap
        self.return_waveform = return_waveform

        if csv_path is None:
            # v3 name first (reference hardcodes it, data/dataset.py:34-36);
            # fall back to the v2 name so v2 roots work without csv_path.
            for name in ("maestro-v3.0.0.csv", "maestro-v2.0.0.csv"):
                cand = os.path.join(self.root_dir, name)
                if os.path.exists(cand):
                    csv_path = cand
                    break
            else:
                csv_path = os.path.join(self.root_dir, "maestro-v3.0.0.csv")
        df = pd.read_csv(csv_path)
        if year is not None:
            df = df[df["year"] == int(year)]
        if split is not None:
            df = df[df["split"] == split]
        if subset_size:
            df = df.head(subset_size)
        self.df = df.reset_index(drop=True)

        self.chunks: list[dict] = []
        if chunk_length is not None:
            self._build_chunk_index()

    # ------------------------------------------------------------- indexing
    def _build_chunk_index(self) -> None:
        """reference data/dataset.py:57-95 semantics."""
        sr = self.cfg.sample_rate
        chunk_samples = int(self.chunk_length * sr)
        hop_samples = int(chunk_samples * (1.0 - self.overlap))
        for file_idx, row in self.df.iterrows():
            audio_path = _resolve_audio_path(self.root_dir, row["audio_filename"])
            duration = audio_io.audio_duration(audio_path)
            total_samples = int(duration * sr)
            start = 0
            while start < total_samples:
                end = min(start + chunk_samples, total_samples)
                if (end - start) >= chunk_samples * 0.5:
                    self.chunks.append(
                        {
                            "file_idx": int(file_idx),
                            "start_sample": start,
                            "end_sample": end,
                            "start_time": start / sr,
                            "end_time": end / sr,
                        }
                    )
                start += hop_samples
                if end >= total_samples:
                    break

    def __len__(self) -> int:
        return len(self.chunks) if self.chunk_length is not None else len(self.df)

    # --------------------------------------------------------------- access
    def _midi(self, midi_path: str) -> midi_io.MidiFile:
        # Per-instance LRU (an lru_cache on the bound method would key on
        # self and pin dataset instances in a process-global cache).
        cache = self.__dict__.setdefault("_midi_cache", {})
        if midi_path not in cache:
            if len(cache) >= 32:
                cache.pop(next(iter(cache)))
            cache[midi_path] = midi_io.load_midi(midi_path)
        return cache[midi_path]

    def _roll_for_range(self, midi_path: str, start_time: float, end_time: float) -> np.ndarray:
        fs = self.cfg.frame_rate
        times = np.linspace(start_time, end_time, int((end_time - start_time) * fs))
        return self._midi(midi_path).keys_roll(fs=fs, times=times)

    def __getitem__(self, idx: int):
        if self.chunk_length is not None:
            return self._get_chunk(idx)
        return self._get_full_file(idx)

    def _get_chunk(self, idx: int):
        info = self.chunks[idx]
        row = self.df.iloc[info["file_idx"]]
        audio_path = _resolve_audio_path(self.root_dir, row["audio_filename"])
        midi_path = os.path.join(self.root_dir, row["midi_filename"])

        dur = (info["end_sample"] - info["start_sample"]) / self.cfg.sample_rate
        y, _ = audio_io.load_audio(
            audio_path, sr=self.cfg.sample_rate, mono=True,
            offset=info["start_time"], duration=dur,
        )
        roll = self._roll_for_range(midi_path, info["start_time"], info["end_time"])
        return self._pack(y, roll)

    def _get_full_file(self, idx: int):
        row = self.df.iloc[idx]
        audio_path = _resolve_audio_path(self.root_dir, row["audio_filename"])
        midi_path = os.path.join(self.root_dir, row["midi_filename"])
        y, _ = audio_io.load_audio(audio_path, sr=self.cfg.sample_rate, mono=True)
        roll = self._midi(midi_path).keys_roll(fs=self.cfg.frame_rate)  # full range
        return self._pack(y, roll)

    def _pack(self, y: np.ndarray, roll: np.ndarray):
        from music_transcription_tpu.ops.mel import log_mel_numpy

        if self.return_waveform:
            return y.astype(np.float32), roll.astype(np.float32)
        mel = log_mel_numpy(y, self.cfg)  # (n_mels, T)
        min_len = min(mel.shape[1], roll.shape[1])  # align (ref :158-161)
        return mel[:, :min_len], roll[:, :min_len].astype(np.float32)
