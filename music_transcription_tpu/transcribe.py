"""End-to-end transcription pipeline: audio file -> MIDI.

The TPU re-design of reference main.py:229-287. Key difference from the
reference's serial per-chunk Python loop (main.py:258-266): every 30 s chunk
of the recording becomes a row of one device batch, the mel frontend + model
forward + sigmoid + threshold run as a single jitted program, and with
multiple devices the chunk batch is sharded over the mesh. Note decoding
(roll -> MIDI) stays on host, vectorized over all pitches.

Per-chunk semantics match the reference exactly: 30 s windows zero-padded at
the tail (main.py:86-97), per-chunk dB floor, sigmoid > threshold
(main.py:150-156), rolls concatenated along time (main.py:164-186),
transition decode at fs = sr / hop = 31.25 fps with velocity 100
(main.py:189-226).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from music_transcription_tpu.config import AudioConfig, ModelConfig, config_from_dict
from music_transcription_tpu.data import audio as audio_io
from music_transcription_tpu.data import midi as midi_io
from music_transcription_tpu.models.transcription import TranscriptionModel
from music_transcription_tpu.ops.mel import log_mel_batch
from music_transcription_tpu.parallel import mesh as mesh_lib


@dataclass
class LoadedModel:
    model: TranscriptionModel
    variables: dict
    audio_cfg: AudioConfig


def load_model(checkpoint_path, model_cfg: ModelConfig | None = None,
               audio_cfg: AudioConfig | None = None) -> LoadedModel:
    """Load a checkpoint: orbax directory (native, carries its config via a
    sidecar config.json) or a reference ``.pth`` (converted on the fly)
    (reference main.py:27-57)."""
    path = str(checkpoint_path)
    if os.path.isdir(path):
        sidecar = os.path.join(path, "config.json")
    else:
        # X.pth can carry its config as X.json (reference .pth files are
        # bare weights; without a sidecar the shipped defaults apply)
        sidecar = os.path.splitext(path)[0] + ".json"
    if sidecar and os.path.exists(sidecar) and (model_cfg is None or audio_cfg is None):
        try:
            with open(sidecar) as f:
                saved = json.load(f)
            if not isinstance(saved, dict):
                raise ValueError(f"expected a JSON object, got {type(saved).__name__}")
            if model_cfg is None and isinstance(saved.get("model"), dict):
                model_cfg = config_from_dict(ModelConfig, saved["model"])
            if audio_cfg is None and isinstance(saved.get("audio"), dict):
                audio_cfg = config_from_dict(AudioConfig, saved["audio"])
        except Exception as e:  # an unrelated X.json must not break X.pth loads
            print(f"Warning: ignoring config sidecar {sidecar}: {e}")
    if model_cfg is None:
        model_cfg = ModelConfig()  # shipped defaults (reference main.py:16-20)
    if audio_cfg is None:
        audio_cfg = AudioConfig()

    model = TranscriptionModel(model_cfg)
    if os.path.isdir(path):
        from music_transcription_tpu.train.checkpoints import load_checkpoint

        # Restore the full saved tree (it may carry opt_state/step from a
        # training run) and keep only the inference variables.
        payload = load_checkpoint(path)
        variables = {k: payload[k] for k in ("params", "batch_stats") if k in payload}
    else:
        from music_transcription_tpu.train.checkpoints import load_torch_checkpoint

        variables = load_torch_checkpoint(path, model_cfg)
    return LoadedModel(model=model, variables=variables, audio_cfg=audio_cfg)


def _rolls_local(module, variables, chunks, threshold, audio_cfg: AudioConfig):
    """(N, chunk_samples) audio -> (N, 88, T) binary rolls (pure, unjitted)."""
    mel = log_mel_batch(chunks, audio_cfg)  # (N, n_mels, T)
    logits = module.apply(variables, mel[:, None], train=False)  # (N, 88, T)
    probs = jax.nn.sigmoid(logits)
    return (probs > threshold).astype(jnp.float32)


@partial(jax.jit, static_argnames=("module", "audio_cfg"))
def _chunks_to_rolls(module, variables, chunks, threshold, audio_cfg: AudioConfig):
    """Jitted single-device pipeline."""
    return _rolls_local(module, variables, chunks, threshold, audio_cfg)


def stitch_rolls(rolls: np.ndarray, hop_frames: int) -> np.ndarray:
    """(N, 88, T) per-chunk rolls from OVERLAPPING chunks -> (88, total) roll.

    Chunk i covers absolute frames [i*hop, i*hop + T). Each frame is taken
    from the chunk whose interior covers it: chunk i contributes
    [i*hop + lo, i*hop + T - hi) with lo = hi = (T - hop)//2 (first chunk
    keeps its left edge, last its right edge). Seam frames of the
    non-overlapping layout therefore come from the *middle* of a window,
    where the model has full context — the fix for the measured seam cost
    (seam-band F1 0.847 vs interior 0.934 at overlap 0, DESIGN.md).
    """
    n, _, t = rolls.shape
    if hop_frames >= t or n == 1:
        return np.concatenate(list(rolls), axis=1)
    half = (t - hop_frames) // 2
    total = (n - 1) * hop_frames + t
    out = np.zeros((rolls.shape[1], total), rolls.dtype)
    for i in range(n):
        lo = 0 if i == 0 else half
        hi = t if i == n - 1 else t - (t - hop_frames - half)
        out[:, i * hop_frames + lo: i * hop_frames + hi] = rolls[i][:, lo:hi]
    return out


def transcribe_chunks(
    loaded: LoadedModel,
    chunks: np.ndarray,
    threshold: float = 0.5,
    mesh=None,
    hop_frames: int | None = None,
    constrained: bool = False,
    beam: int = 1,
) -> np.ndarray:
    """(num_chunks, chunk_samples) -> concatenated (88, num_chunks*T) roll.

    With ``hop_frames`` (chunks built by ``split_into_chunks(...,
    hop_samples)``), per-chunk rolls are stitched via ``stitch_rolls``
    instead of concatenated."""

    def _combine(rolls):
        if hop_frames is not None:
            return stitch_rolls(np.asarray(rolls), hop_frames)
        return np.concatenate(list(rolls), axis=1)  # main.py:164-186

    if loaded.model.config.is_ast:
        # Token-generation path (the notebooks' generate_from_audio,
        # reference transformer_draft.ipynb cell 8): generate REMI tokens per
        # chunk, decode to rolls on host, concatenate along time.
        max_t = loaded.audio_cfg.roll_frames_per_chunk
        rolls = loaded.model.predict(
            loaded.variables, jnp.asarray(chunks), max_T=max_t,
            generate_max_len=loaded.model.config.max_output_len,
            constrained=constrained,
            **({"beam_size": beam} if beam > 1 else {}),
        )
        rolls = np.asarray(rolls)
        out = np.zeros((rolls.shape[0], 88, max_t), np.float32)
        out[:, :, : rolls.shape[2]] = rolls[:, :, :max_t]
        return _combine(out)
    n_real = chunks.shape[0]
    if mesh is None and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh()
    if mesh is not None:
        # shard_map over the data axis: inference has no cross-batch
        # collectives, so every shard runs the full pipeline locally —
        # which also lets the Pallas kernels (no SPMD partitioning rule)
        # run per-device under a mesh.
        from jax.sharding import PartitionSpec as P

        chunks, n_real = mesh_lib.pad_to_multiple(np.asarray(chunks), mesh.size, axis=0)
        device_chunks = mesh_lib.shard_batch(chunks, mesh)
        variables = mesh_lib.replicate(loaded.variables, mesh)
        module, acfg = loaded.model.module, loaded.audio_cfg

        @partial(jax.jit, static_argnames=())
        def sharded_pipeline(variables, chunks, threshold):
            def per_shard(variables, chunks_local, threshold):
                return _rolls_local(module, variables, chunks_local, threshold, acfg)

            # check_vma off: no collectives here, and the varying-manual-axes
            # checker rejects scan carries initialized from constants.
            return jax.shard_map(
                per_shard, mesh=mesh,
                in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
                out_specs=P(mesh_lib.DATA_AXIS),
                check_vma=False,
            )(variables, chunks, threshold)

        rolls = sharded_pipeline(variables, device_chunks, jnp.float32(threshold))
        rolls = np.asarray(rolls)[:n_real]
        return _combine(rolls)
    else:
        # Bucket the chunk count to the next power of two so serving many
        # recordings compiles O(log N) programs, not one per length
        # (each new shape costs minutes on a remote-compile backend).
        n = chunks.shape[0]
        bucket = 1
        while bucket < n:
            bucket *= 2
        if bucket != n:
            chunks = np.pad(np.asarray(chunks), ((0, bucket - n), (0, 0)))
        device_chunks = jnp.asarray(chunks)
        variables = loaded.variables
    rolls = _chunks_to_rolls(
        loaded.model.module, variables, device_chunks, threshold, loaded.audio_cfg
    )
    rolls = np.asarray(rolls)[:n_real]  # (N, 88, T)
    return _combine(rolls)  # (88, N*T) when hop_frames is None


class Transcriber:
    """Serving-oriented wrapper: load a checkpoint once, transcribe many
    recordings without re-initializing or re-compiling (the compiled chunk
    pipeline is shape-stable across files)."""

    def __init__(self, checkpoint_path, model_cfg=None, audio_cfg=None, mesh=None,
                 threshold: float = 0.5, use_pallas_lstm: bool | None = None,
                 window: float | None = None, overlap: float = 0.0,
                 constrained: bool = False, beam: int = 1):
        import dataclasses

        if use_pallas_lstm is None:
            # fused kernels on any TPU topology: multi-device inference runs
            # the pipeline under shard_map (per-shard local programs), so the
            # pallas_call never needs an SPMD partitioning rule.
            use_pallas_lstm = jax.devices()[0].platform != "cpu"
        loaded = load_model(checkpoint_path, model_cfg=model_cfg, audio_cfg=audio_cfg)
        if window is not None:
            # Long-window mode: one jitted program over a larger T (e.g.
            # --window 120 -> T=3750 at the shipped geometry). The CNN/LSTM/
            # attention stacks are time-size-agnostic, so the checkpoint
            # weights apply unchanged; attention flips to the flash kernel
            # via the "auto" backend once the score tensor outgrows HBM
            # headroom (MultiHeadSelfAttention.auto_score_bytes).
            if loaded.model.config.is_ast:
                raise ValueError(
                    "--window applies to CNN-RNN checkpoints; the AST tier "
                    "generates per trained chunk length"
                )
            loaded = LoadedModel(
                model=loaded.model, variables=loaded.variables,
                audio_cfg=dataclasses.replace(loaded.audio_cfg,
                                              chunk_length=float(window)),
            )
        if not loaded.model.config.is_ast:
            updates = {}
            if use_pallas_lstm:
                updates["lstm_backend"] = "pallas"
            # "auto" == xla at the default 30 s window (measured faster at
            # T=938, bench.py note); flash engages for long windows
            if loaded.model.config.attention_backend != "pallas":
                updates["attention_backend"] = "auto"
            if updates:
                cfg = dataclasses.replace(loaded.model.config, **updates)
                loaded = LoadedModel(
                    model=TranscriptionModel(cfg), variables=loaded.variables,
                    audio_cfg=loaded.audio_cfg,
                )
        # Pin the weights on device ONCE at load time. jit does not cache
        # host-numpy arguments, so without this every request re-uploads the
        # full parameter tree (~356 MB for the 89M flagship) — on a tunneled
        # PJRT backend that turns a ~31 ms request (bench.py batch1_ms) into
        # multi-second serving latency.
        if mesh is None and len(jax.devices()) > 1:
            mesh = mesh_lib.make_mesh()
        if mesh is not None:
            variables = mesh_lib.replicate(loaded.variables, mesh)
        else:
            variables = jax.device_put(loaded.variables)
        self.loaded = LoadedModel(
            model=loaded.model, variables=variables, audio_cfg=loaded.audio_cfg
        )
        self.mesh = mesh
        self.threshold = threshold
        if constrained and not self.loaded.model.config.is_ast:
            raise ValueError(
                "constrained decoding applies to AST checkpoints (token "
                "grammar masking); the CNN-RNN route thresholds frame probs")
        self.constrained = constrained
        if beam > 1 and not self.loaded.model.config.is_ast:
            raise ValueError(
                "beam search applies to AST checkpoints (token decoding); "
                "the CNN-RNN route has no token hypotheses to rank")
        self.beam = beam
        self.hop_samples = None
        self.hop_frames = None
        if overlap and overlap > 0.0:
            # Overlapped chunks + interior-keep stitching (stitch_rolls):
            # removes the measured seam cost of hard chunk boundaries.
            acfg = self.loaded.audio_cfg
            if self.loaded.model.config.is_ast:
                raise ValueError(
                    "overlap applies to CNN-RNN checkpoints (frame grid "
                    "stitching); the AST token route has no frame alignment")
            if not overlap < acfg.chunk_length:
                raise ValueError(
                    f"overlap ({overlap}s) must be smaller than the "
                    f"inference window ({acfg.chunk_length}s)")
            hop_s = acfg.chunk_samples - int(round(overlap * acfg.sample_rate))
            # snap the hop to the mel hop grid so chunk i's frame f IS
            # global frame i*hop_frames + f (exact, no resampling)
            hop_s = max(acfg.hop_length,
                        (hop_s // acfg.hop_length) * acfg.hop_length)
            self.hop_samples = hop_s
            self.hop_frames = hop_s // acfg.hop_length

    def transcribe_array(self, y: np.ndarray, threshold: float | None = None) -> list:
        """float mono audio at the model sample rate -> list[Note]."""
        from music_transcription_tpu.data import midi as midi_io

        acfg = self.loaded.audio_cfg
        chunks = audio_io.split_into_chunks(np.asarray(y, np.float32),
                                            acfg.chunk_samples,
                                            hop_samples=self.hop_samples)
        roll = transcribe_chunks(
            self.loaded, chunks,
            threshold=self.threshold if threshold is None else threshold,
            mesh=self.mesh, hop_frames=self.hop_frames,
            constrained=self.constrained, beam=self.beam,
        )
        return midi_io.pianoroll_to_notes(roll, fs=acfg.frame_rate)

    def transcribe_file(self, audio_path, output_path=None, threshold=None):
        from music_transcription_tpu.data import midi as midi_io

        acfg = self.loaded.audio_cfg
        y, _ = audio_io.load_audio(audio_path, sr=acfg.sample_rate, mono=True)
        notes = self.transcribe_array(y, threshold=threshold)
        if output_path is None:
            stem, _ = os.path.splitext(str(audio_path))
            output_path = stem + "_transcription.mid"
        midi_io.save_midi(midi_io.notes_to_midi(notes), output_path)
        return output_path


def transcribe_audio(
    audio_path,
    checkpoint_path,
    output_path=None,
    threshold: float = 0.5,
    model_cfg: ModelConfig | None = None,
    audio_cfg: AudioConfig | None = None,
    mesh=None,
    verbose: bool = True,
    window: float | None = None,
    overlap: float = 0.0,
    constrained: bool = False,
    beam: int = 1,
):
    """Full pipeline (reference main.py:229-287). Returns the MIDI path."""

    def log(msg):
        if verbose:
            print(msg)

    # Transcriber picks the serving backends (Pallas LSTM on single-device
    # TPU, scan elsewhere) and carries the loaded model state.
    server = Transcriber(
        checkpoint_path, model_cfg=model_cfg, audio_cfg=audio_cfg,
        mesh=mesh, threshold=threshold, window=window, overlap=overlap,
        constrained=constrained, beam=beam,
    )
    loaded = server.loaded
    acfg = loaded.audio_cfg

    log(f"Loading audio from {audio_path}...")
    y, _ = audio_io.load_audio(audio_path, sr=acfg.sample_rate, mono=True)
    duration = len(y) / acfg.sample_rate
    log(f"Audio duration: {duration:.2f} seconds")

    chunks = audio_io.split_into_chunks(y, acfg.chunk_samples,
                                        hop_samples=server.hop_samples)
    log(f"Split audio into {chunks.shape[0]} chunks of {acfg.chunk_length}s each"
        + (f" (hop {server.hop_samples / acfg.sample_rate:.2f}s, stitched)"
           if server.hop_samples else "")
        + " (batched on device)")

    combined = transcribe_chunks(loaded, chunks, threshold=threshold, mesh=mesh,
                                 hop_frames=server.hop_frames,
                                 constrained=constrained, beam=beam)

    log("Converting to MIDI...")
    notes = midi_io.pianoroll_to_notes(combined, fs=acfg.frame_rate)
    midi = midi_io.notes_to_midi(notes)

    if output_path is None:
        stem, _ = os.path.splitext(str(audio_path))
        output_path = stem + "_transcription.mid"
    midi_io.save_midi(midi, output_path)
    log(f"MIDI file saved to: {output_path}")
    return output_path
