"""Training loop: epochs, validation, checkpoints, run artifacts.

The orchestration layer of the reference (reference train/train_transcriber.py:90-332,
scripts/train_cnn.py:257-359) rebuilt around the jitted data-parallel step:

  * one compiled train step per run (batches pad to a fixed T), fed by the
    threaded host loader + device prefetch
  * NaN-skip accounting on host: the in-step guard suppresses bad updates;
    more than ``max_nan_batches`` skipped batches aborts
    (reference train_transcriber.py:123-127)
  * checkpoint cadence: ``model_epoch_N`` every ``save_every``,
    ``model_best`` on val-loss improvement, ``model_final`` at the end
    (reference scripts/train_cnn.py:345-359) — orbax checkpoints carrying
    params + batch_stats + opt_state + step (full resume, unlike the
    reference's weights-only .pth)
  * run artifacts: manifest JSON (parameters.txt analogue), training_log.txt
    per-epoch lines, loss_curve.png / loss_per_step.png
    (reference scripts/train_cnn.py:20-62,228-255,314-342)
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from music_transcription_tpu.config import (
    AudioConfig,
    ModelConfig,
    TrainConfig,
    config_to_dict,
)
from music_transcription_tpu.data.pipeline import device_prefetch


def install_graceful_sigterm() -> None:
    """Route SIGTERM through KeyboardInterrupt so ``kill <pid>`` on a
    backgrounded training run takes the same abort path as Ctrl-C — the
    try/finally best-state flush. Jobs started with ``&`` from a
    non-interactive shell ignore SIGINT per POSIX job control, so SIGTERM
    is the only graceful stop an operator can actually send them; without
    this handler it kills the process with the device-resident best state
    unflushed."""
    import signal

    def _raise(signum, frame):
        raise KeyboardInterrupt(f"signal {signum}")

    try:
        signal.signal(signal.SIGTERM, _raise)
    except ValueError:  # not the main thread; leave default disposition
        pass
from music_transcription_tpu.parallel.mesh import make_mesh, replicate
from music_transcription_tpu.parallel.train_step import (
    init_train_state,
    jit_data_parallel,
    make_eval_step,
    make_eval_step_shardmap,
    make_train_step,
    make_train_step_shardmap,
)
from music_transcription_tpu.train import checkpoints as ckpt_lib
from music_transcription_tpu.train.optim import make_optimizer


class TrainingUnstableError(RuntimeError):
    pass


class HostMemoryRecycle(RuntimeError):
    """Raised at an epoch boundary when host RSS crossed the configured
    watermark (TrainConfig.rss_watermark_gb). A full-resume checkpoint has
    already been written; the CLI converts this into RECYCLE_EXIT_CODE (67)
    so a supervisor restarts the process with ``--resume auto``."""

    def __init__(self, epoch: int, rss_gb: float, checkpoint: str):
        super().__init__(
            f"host RSS {rss_gb:.1f} GB crossed the watermark after epoch "
            f"{epoch}; checkpoint at {checkpoint}")
        self.epoch = epoch
        self.rss_gb = rss_gb
        self.checkpoint = checkpoint


def train_one_epoch(step_fn, state, loader, rng, *, mesh=None, max_nan: int = 10,
                    nan_count_start: int = 0, log_every: int = 50, verbose: bool = True,
                    heartbeat=None):
    """Run one epoch; returns (state, avg_loss, step_losses, nan_count)."""
    total, step_losses = 0.0, []
    nan_count = nan_count_start
    t_start = time.perf_counter()
    for i, batch in enumerate(device_prefetch(iter(loader), mesh=mesh)):
        state, metrics = step_fn(state, batch, rng)
        loss = float(metrics["loss"])  # device fetch: blocks on the RPC
        if heartbeat is not None:
            heartbeat()
        if float(metrics["skipped"]) > 0:
            nan_count += 1
            if verbose:
                print(f"\n⚠ Warning: NaN/Inf loss detected (count: {nan_count}), update skipped")
            if nan_count > max_nan:
                raise TrainingUnstableError("Too many NaN losses - training unstable!")
            continue
        total += loss
        step_losses.append(loss)
        if verbose and (i + 1) % log_every == 0:
            rate = (i + 1) / (time.perf_counter() - t_start)
            print(
                f"  step {i+1}/{len(loader)} loss={loss:.4f} "
                f"grad_norm={float(metrics['grad_norm']):.2f} ({rate:.2f} it/s)"
            )
    avg = total / max(1, len(step_losses))
    return state, avg, step_losses, nan_count


def evaluate(eval_fn, state, loader, *, mesh=None, heartbeat=None) -> float:
    # pad_to_mesh keeps a partial tail batch shardable; zero rows carry
    # lengths==0, which the masked loss excludes exactly (pipeline.py).
    total, n = 0.0, 0
    for batch in device_prefetch(iter(loader), mesh=mesh, pad_to_mesh=True):
        total += float(eval_fn(state, batch))
        n += 1
        if heartbeat is not None:
            heartbeat()
    return total / max(1, n)


def _plot_curves(run_dir, train_losses, val_losses, all_step_losses):
    """loss_curve.png + loss_per_step.png (reference scripts/train_cnn.py:20-62)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return
    epochs = np.arange(1, len(train_losses) + 1)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(epochs, train_losses, label="train")
    if val_losses:
        ax.plot(epochs, val_losses, label="val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(os.path.join(run_dir, "loss_curve.png"), dpi=100, bbox_inches="tight")
    plt.close(fig)

    flat = [l for ep in all_step_losses for l in ep]
    if flat:
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(flat, lw=0.6)
        pos = 0
        for ep in all_step_losses[:-1]:
            pos += len(ep)
            ax.axvline(pos, color="gray", ls="--", lw=0.5)
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.grid(alpha=0.3)
        fig.savefig(os.path.join(run_dir, "loss_per_step.png"), dpi=100, bbox_inches="tight")
        plt.close(fig)


def train_model(
    *,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    audio_cfg: AudioConfig,
    train_loader,
    val_loader=None,
    run_dir: str = "outputs/run",
    resume_from: str | None = None,
    start_epoch: int = 1,
    mesh=None,
    verbose: bool = True,
    profile_steps: int = 0,
):
    """Full training driver. Returns (model, state, history)."""
    from music_transcription_tpu.models.transcription import TranscriptionModel

    # Multi-host: all processes run the compute (collectives require it);
    # only process 0 writes artifacts and prints.
    is_main = jax.process_index() == 0
    verbose = verbose and is_main

    os.makedirs(run_dir, exist_ok=True)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    partitioning = train_cfg.partitioning
    if partitioning not in ("dp", "zero1", "fsdp", "tp"):
        raise ValueError(
            f"unknown partitioning {partitioning!r} (dp | zero1 | fsdp | tp)"
        )
    if mesh is None:
        mp = train_cfg.model_parallel or 1
        if mp > 1:
            if partitioning == "dp":
                raise ValueError(
                    "model_parallel > 1 with partitioning='dp' would replicate all "
                    "work across the model axis — use partitioning='zero1'/'fsdp'/'tp'"
                )
            from music_transcription_tpu.parallel.partitioning import make_mesh_2d

            n = train_cfg.data_parallel or len(jax.devices()) // mp
            mesh = make_mesh_2d(n, mp)
        else:
            n = train_cfg.data_parallel or len(jax.devices())
            mesh = make_mesh(n) if n > 1 else None
    if partitioning != "dp":
        if mesh is None:
            raise ValueError(
                "partitioning='zero1'/'fsdp'/'tp' shards state over a mesh; "
                "this run resolved to a single device (nothing to shard over)"
            )
        if jax.process_count() > 1:
            raise ValueError(
                "partitioning='zero1'/'fsdp'/'tp' is single-host for now: checkpoint "
                "save gathers shards on process 0, which cannot address other "
                "hosts' shards (use partitioning='dp' on pods)"
            )
    if mesh is not None:
        from music_transcription_tpu.parallel.mesh import DATA_AXIS

        n_data = dict(mesh.shape).get(DATA_AXIS, mesh.size)
        if train_cfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size={train_cfg.batch_size} must divide the data axis ({n_data} shards)"
            )

    model = TranscriptionModel(model_cfg)
    tx = make_optimizer(train_cfg)
    state = init_train_state(
        model, tx, jax.random.key(train_cfg.seed), model.example_input(batch=1, t=64)
    )
    if resume_from:
        try:
            state = ckpt_lib.load_checkpoint(resume_from, like=state)
        except ValueError:
            # best-state checkpoints (--save_best_every flushes) hold only
            # {params, batch_stats, step} — resume from them with a fresh
            # optimizer rather than refusing. Anything else (same keys but
            # mismatched shapes/structure = wrong model config) re-raises
            # the structured restore's error instead of loose-loading junk.
            loose = ckpt_lib.load_checkpoint(resume_from)
            missing = [k for k in state if k not in loose]
            params_match = (
                "params" in loose
                and jax.tree_util.tree_structure(loose["params"])
                == jax.tree_util.tree_structure(state["params"])
                and all(
                    tuple(np.shape(a)) == tuple(np.shape(b))
                    for a, b in zip(jax.tree.leaves(loose["params"]),
                                    jax.tree.leaves(state["params"]))
                )
            )
            if not missing or not params_match:
                raise
            state = {k: (loose[k] if k in loose else state[k]) for k in state}
            if verbose:
                print(f"Partial resume: {resume_from} lacks "
                      f"{'/'.join(missing)}; reinitialized fresh")
        if verbose:
            print(f"Resumed from {resume_from} at step {int(state['step'])}")
    if mesh is not None and partitioning != "dp":
        # ZeRO-1 / FSDP: sharded train state via GSPMD shardings — same step
        # function, new placement (parallel/partitioning.py).
        if model_cfg.lstm_backend == "pallas":
            raise ValueError(
                "partitioning='zero1'/'fsdp'/'tp' uses the compiler-partitioned path; "
                "the fused Pallas LSTM has no partitioning rule (set lstm_backend='scan')"
            )
        from music_transcription_tpu.parallel.mesh import batch_sharding
        from music_transcription_tpu.parallel.partitioning import (
            jit_partitioned,
            shard_state,
            state_shardings,
        )

        shardings = state_shardings(
            state, mesh,
            shard_params=partitioning in ("fsdp", "tp"),
            strategy="tp" if partitioning == "tp" else "fsdp",
        )
        state = shard_state(state, shardings)
        step_fn = jit_partitioned(make_train_step(model, tx), mesh, shardings)
        eval_fn = jax.jit(
            make_eval_step(model), in_shardings=(shardings, batch_sharding(mesh))
        )
    elif mesh is not None:
        state = replicate(state, mesh)
        if model_cfg.lstm_backend == "pallas":
            # explicit-SPMD path: per-shard local programs (fused kernels
            # have no partitioning rule), pmean'd grads, sync-BN.
            step_fn = make_train_step_shardmap(model, tx, mesh)
            eval_fn = make_eval_step_shardmap(model, mesh)
        else:
            step_fn = jit_data_parallel(make_train_step(model, tx), mesh)
            eval_fn = jit_data_parallel(
                make_eval_step(model), mesh, donate_state=False, n_args=2
            )
    else:
        step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
        eval_fn = jax.jit(make_eval_step(model))

    # Run manifest (parameters.txt analogue)
    manifest = {
        "model": config_to_dict(model_cfg),
        "train": config_to_dict(train_cfg),
        "audio": config_to_dict(audio_cfg),
        "devices": [str(d) for d in (mesh.devices.flatten() if mesh else jax.devices()[:1])],
        "start_epoch": start_epoch,
    }
    if is_main:
        with open(os.path.join(run_dir, "parameters.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        # parameters.txt: the reference's flat key=value dump
        # (scripts/train_cnn.py:228-255) for drop-in tooling.
        with open(os.path.join(run_dir, "parameters.txt"), "w") as f:
            for section, values in manifest.items():
                if isinstance(values, dict):
                    for k, v in sorted(values.items()):
                        f.write(f"{section}.{k} = {v}\n")
                else:
                    f.write(f"{section} = {values}\n")

    def save(name, st, inference_only: bool = False):
        # model_best is an inference artifact: params + batch_stats + step
        # only (skipping opt_state cuts the device->host transfer by ~2/3 —
        # it can dominate epoch time on a slow host link). Periodic/final
        # checkpoints keep the full state for exact resume.
        path = os.path.join(ckpt_dir, name)
        if not is_main:  # replicated state: process 0's copy is the state
            return path
        if inference_only:
            st = {k: st[k] for k in ("params", "batch_stats", "step") if k in st}
        host_state = jax.tree.map(np.asarray, st)
        ckpt_lib.save_checkpoint(path, host_state)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump({"model": config_to_dict(model_cfg), "audio": config_to_dict(audio_cfg)}, f)
        return path

    log_path = os.path.join(run_dir, "training_log.txt")
    best_val = float("inf")
    best_epoch = start_epoch - 1
    # Exact best-model retention with write batching: on every improvement
    # the inference payload is device-copied (cheap, stays on device); the
    # copy is flushed to disk at most every save_best_every epochs and once
    # at loop exit — clean end or abort — so model_best always holds the
    # true best and slow device->host links aren't hit per epoch.
    pending_best = None
    pending_best_val = float("inf")
    flushed_best_val = float("inf")
    last_best_flush_epoch = -(10**9)

    def _flush_best():
        nonlocal pending_best, flushed_best_val
        if pending_best is not None and pending_best_val < flushed_best_val:
            save("model_best", pending_best, inference_only=True)
            flushed_best_val = pending_best_val
            if verbose:
                print(f"Saved new best model (val_loss={pending_best_val:.6f})")
        pending_best = None

    watchdog = None
    if getattr(train_cfg, "stall_timeout_s", 0):
        from music_transcription_tpu.train.watchdog import StallWatchdog

        watchdog = StallWatchdog(train_cfg.stall_timeout_s)
    beat = watchdog.beat if watchdog is not None else None

    history = {"train_loss": [], "val_loss": [], "step_losses": []}
    rng_impl = train_cfg.rng_impl
    if rng_impl == "auto":  # see TrainConfig.rng_impl
        rng_impl = "rbg" if jax.devices()[0].platform != "cpu" else "threefry2x32"
    rng = jax.random.key(train_cfg.seed + 1, impl=rng_impl)
    nan_count = 0

    if profile_steps > 0:
        # Trace the first few compiled steps (jax.profiler xplane trace into
        # the run dir) — the tracing hook the reference lacks (SURVEY §5).
        trace_dir = os.path.join(run_dir, "profile")
        jax.profiler.start_trace(trace_dir)
        try:
            it = device_prefetch(iter(train_loader), mesh=mesh)
            for i, batch in enumerate(it):
                state, _ = step_fn(state, batch, rng)
                if i + 1 >= profile_steps:
                    break
            jax.block_until_ready(state["step"])
        finally:
            jax.profiler.stop_trace()
        if verbose:
            print(f"Wrote profiler trace ({profile_steps} steps) to {trace_dir}")

    try:
        for epoch in range(start_epoch, train_cfg.epochs + 1):
            if verbose:
                print(f"\nEpoch {epoch}/{train_cfg.epochs}")
            t0 = time.perf_counter()
            state, train_loss, step_losses, nan_count = train_one_epoch(
                step_fn, state, train_loader, rng, mesh=mesh,
                max_nan=train_cfg.max_nan_batches, nan_count_start=nan_count, verbose=verbose,
                heartbeat=beat,
            )
            epoch_time = time.perf_counter() - t0
            val_loss = (
                evaluate(eval_fn, state, val_loader, mesh=mesh, heartbeat=beat)
                if val_loader is not None else None
            )

            history["train_loss"].append(train_loss)
            history["step_losses"].append(step_losses)
            if val_loss is not None:
                history["val_loss"].append(val_loss)

            line = (
                f"epoch {epoch} train_loss={train_loss:.6f} "
                f"val_loss={'-' if val_loss is None else f'{val_loss:.6f}'} "
                f"time={epoch_time:.1f}s"
            )
            if verbose:
                print(line)
            if is_main:
                with open(log_path, "a") as f:
                    f.write(line + "\n")

            if val_loss is not None and val_loss < best_val:
                best_val = val_loss
                best_epoch = epoch
                # device-copy BEFORE the next step donates this state; the
                # flush below (cadenced) or the finally (on exit) writes it
                pending_best = jax.tree.map(
                    jnp.copy,
                    {k: state[k] for k in ("params", "batch_stats", "step") if k in state},
                )
                pending_best_val = val_loss
                if epoch - last_best_flush_epoch >= train_cfg.save_best_every:
                    _flush_best()
                    last_best_flush_epoch = epoch
            saved_this_epoch = False
            if train_cfg.save_every and epoch % train_cfg.save_every == 0:
                save(f"model_epoch_{epoch}", state)
                saved_this_epoch = True
            if is_main:
                _plot_curves(run_dir, history["train_loss"], history["val_loss"],
                             history["step_losses"])
            watermark = getattr(train_cfg, "rss_watermark_gb", 0.0)
            if watermark:
                from music_transcription_tpu.train.watchdog import host_rss_gb

                rss = host_rss_gb()
                if rss > watermark:
                    # planned recycle: full state persists (exact resume,
                    # optimizer included); the finally flushes model_best
                    path = save(f"model_epoch_{epoch}", state) \
                        if not saved_this_epoch \
                        else os.path.join(ckpt_dir, f"model_epoch_{epoch}")
                    if verbose:
                        print(f"Host RSS {rss:.1f} GB > watermark "
                              f"{watermark:.1f} GB: checkpointed epoch "
                              f"{epoch}, requesting recycle (exit 67)")
                    raise HostMemoryRecycle(epoch, rss, path)
            if (train_cfg.early_stop_patience and val_loader is not None
                    and epoch - best_epoch >= train_cfg.early_stop_patience):
                if verbose:
                    print(f"Early stop: no val improvement since epoch "
                          f"{best_epoch} (patience {train_cfg.early_stop_patience})")
                break
    finally:
        # disarm BEFORE the flush: exit-time orbax writes are legitimately
        # slow (~70 s over the tunneled host link) and must not trip a
        # stall exit that would kill the flush itself
        if watchdog is not None:
            watchdog.stop()
        # clean end OR abort (NaN abort, Ctrl-C): the true best state is
        # device-resident and must not be lost to the write cadence
        _flush_best()

    save("model_final", state)
    return model, state, history
