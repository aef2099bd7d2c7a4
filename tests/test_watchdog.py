"""Stall watchdog: wedged-RPC detection (train/watchdog.py)."""

import time

from music_transcription_tpu.train.watchdog import STALL_EXIT_CODE, StallWatchdog


def test_watchdog_fires_on_stall(capsys):
    calls = []
    wd = StallWatchdog(0.15, check_every_s=0.03, _exit=calls.append)
    try:
        deadline = time.time() + 5.0
        while not calls and time.time() < deadline:
            time.sleep(0.02)
        assert calls == [STALL_EXIT_CODE]
    finally:
        wd.stop()


def test_watchdog_first_compile_grace():
    """Before the FIRST beat the limit is first_grace_factor x timeout —
    every fresh process pays the full remote compile before step 1, and a
    steady-state timeout would fire mid-compile on every supervisor
    restart. After one beat the steady-state timeout applies."""
    calls = []
    wd = StallWatchdog(0.1, check_every_s=0.02, first_grace_factor=6.0,
                       _exit=calls.append)
    try:
        time.sleep(0.3)  # > timeout, < grace*timeout: must NOT fire yet
        assert calls == []
        wd.beat()  # "first step done": steady-state limit from here on
        deadline = time.time() + 5.0
        while not calls and time.time() < deadline:
            time.sleep(0.02)
        assert calls == [STALL_EXIT_CODE]
    finally:
        wd.stop()


def test_watchdog_quiet_while_beating():
    calls = []
    wd = StallWatchdog(0.2, check_every_s=0.03, _exit=calls.append)
    try:
        for _ in range(10):
            time.sleep(0.05)
            wd.beat()
        assert calls == []
    finally:
        wd.stop()
    # disarmed: a stall after stop() must not fire (exit-time checkpoint
    # flushes are legitimately slow)
    time.sleep(0.3)
    assert calls == []


def test_bench_deadline_exits_loudly():
    """bench.py must fail fast (exit 1, diagnostic on stderr, NO JSON line)
    when it can't produce a result inside BENCH_DEADLINE_S — a hung bench
    at round end is worse for the driver than a loud failure."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env={**os.environ, "BENCH_DEADLINE_S": "0.5"},
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 1
    assert "deadline" in proc.stderr
    assert '"metric"' not in proc.stdout  # no fabricated result line


def test_watchdog_cli_wiring(tmp_path):
    """--stall_timeout armed (and never firing) through a real train run."""
    from tests.maestro_fixture import make_maestro_root
    from tests.test_ast import _run_train_ast

    root = make_maestro_root(tmp_path / "maestro")
    run = tmp_path / "run"
    proc = _run_train_ast(["--root_dir", str(root), "--stall_timeout", "300",
                           "--run_dir", str(run)])
    assert proc.returncode == 0, f"{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    assert (run / "model_final" / "config.json").exists()
