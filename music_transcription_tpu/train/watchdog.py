"""Stall watchdog: detect a wedged device RPC and abort the process.

The tunneled axon backend can wedge a single in-flight RPC permanently
(observed twice live: a train step blocked >30 min at zero CPU while the
relay was sick; a fresh process later failed to even initialize). A wedged
process cannot flush its device-retained best state — the flush itself
needs the dead connection — so the graceful-SIGTERM path is useless there.
What an operator wants is a fast, loud, *automatic* exit, so a supervisor
(or `until python scripts/train_*.py --resume ...; do :; done`) restarts
from the last ``--save_best_every`` flush instead of losing hours.

No reference counterpart: the reference trains on local CUDA where a hung
kernel takes the whole process down by itself. This failure mode is
specific to remote/tunneled accelerators.
"""

from __future__ import annotations

import os
import sys
import threading
import time

# distinct from shell/timeout conventions (124, 137, 143): supervisors can
# key restart-from-best on exactly this code
STALL_EXIT_CODE = 66


class StallWatchdog:
    """Daemon thread that force-exits the process when the heartbeat stalls.

    ``beat()`` after every completed unit of device work (train step, val
    batch). If no beat arrives for ``timeout_s`` seconds the watchdog writes
    a diagnostic to stderr and calls ``os._exit(STALL_EXIT_CODE)`` —
    deliberately NOT sys.exit/raise: the main thread is blocked inside a
    dead RPC and will never see an exception; only ``os._exit`` escapes.

    Until the FIRST beat the effective timeout is ``first_grace_factor``×
    larger: every fresh process pays the full remote compile (~4–7 min,
    per-process cache) before step 1, and a steady-state-sized timeout
    would otherwise fire mid-compile on every supervisor restart — an
    infinite exit-66/recompile loop that burns relay time while making
    zero progress. Still pick ``timeout_s`` generously (the grace is a
    backstop, not a license for tight timeouts).
    """

    def __init__(self, timeout_s: float, context: str = "train step",
                 check_every_s: float = 5.0, first_grace_factor: float = 4.0,
                 _exit=os._exit):
        self.timeout_s = float(timeout_s)
        self.context = context
        self._check = float(check_every_s)
        self._grace = float(first_grace_factor)
        self._exit = _exit  # injectable for tests
        self._beaten = False
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stall-watchdog")
        self._thread.start()

    def beat(self) -> None:
        self._beaten = True
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2 * self._check)

    def _run(self) -> None:
        while not self._stop.wait(self._check):
            stale = time.monotonic() - self._last
            limit = self.timeout_s if self._beaten else self.timeout_s * self._grace
            if stale > limit:
                sys.stderr.write(
                    f"\n[stall-watchdog] no completed {self.context} for "
                    f"{stale:.0f}s (> {limit:.0f}s): the device "
                    f"connection is likely wedged. Exiting {STALL_EXIT_CODE} "
                    f"so a supervisor can resume from the last best-state "
                    f"flush (see --save_best_every).\n")
                sys.stderr.flush()
                self._exit(STALL_EXIT_CODE)
                return  # only reached with an injected test exit


# Host-memory recycle: the axon PJRT client retains every H2D payload in
# host RSS (DESIGN.md "Transfer-once feeding"), so even slab-staged feeding
# grows the host by ~one slab per rotation. Nothing in-process releases it;
# the bounded-memory answer is to checkpoint at an epoch boundary and exit
# with this code so a supervisor restarts the process (fresh client, RSS
# back to baseline) and resumes exactly (--resume auto). Distinct from
# STALL_EXIT_CODE so supervisors can tell planned recycles from wedges.
RECYCLE_EXIT_CODE = 67


def host_rss_gb() -> float:
    """Resident-set size of this process in GB (0.0 where unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1e6  # kB -> GB
    except OSError:  # pragma: no cover - non-procfs platform
        pass
    return 0.0
