"""Stage timing and device tracing — the observability subsystem.

The reference hand-rolls wall-clock pairs around every phase
(local_faldoi.cpp:1074-1282, global_faldoi.cpp:621-845) and prints a
percentage breakdown.  Here: a ``StageTimer`` collecting named spans with
the same style of report, plus an optional ``jax.profiler`` trace context
for device-level inspection (replaces the reference's per-substep chrono
instrumentation, which XLA fusion makes meaningless per-op).
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Optional


class StageTimer:
    """Collects named wall-clock spans and prints a breakdown."""

    def __init__(self, enabled: bool = True, out=sys.stderr):
        self.enabled = enabled
        self.out = out
        self.spans: Dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.time() - t
            if self.enabled:
                print(f"({name}) took {self.spans[name]:.3f}s", file=self.out)

    def report(self):
        """Total + percentage breakdown (tvl2OF profiling style,
        global_faldoi.cpp:824-843)."""
        total = time.time() - self._t0
        if not self.enabled:
            return
        print(f"all stages took {total:.3f}s", file=self.out)
        for name, s in sorted(self.spans.items(), key=lambda kv: -kv[1]):
            print(f"\t({name}) total: {s:.3f}, perc.: {100 * s / total:.1f}%",
                  file=self.out)


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield


_tunnel_warmed = False

# --- background-thread registry -------------------------------------------
# Daemon threads issuing PJRT RPCs (the tunnel warmer, LocalSolver's rung
# prewarmer) race the PJRT client's C++ destructor at interpreter exit and
# were the r4 bench's rc-134 teardown abort ("FATAL: exception not
# rethrown").  Every such thread registers here; ``shutdown_background``
# flags them to stop and joins with a timeout before teardown begins.
import threading as _threading

_bg_threads: list = []
_bg_lock = _threading.Lock()
_stop_event = _threading.Event()


def stop_requested() -> bool:
    """Long-running background loops poll this between units of work."""
    return _stop_event.is_set()


_atexit_registered = False


def register_background(t: "_threading.Thread") -> None:
    global _atexit_registered
    with _bg_lock:
        _bg_threads.append(t)
        if not _atexit_registered:
            # Join the background threads BEFORE the PJRT client's C++
            # teardown (atexit is LIFO and jax registers its handlers at
            # import, i.e. earlier — so ours runs first).  Without this,
            # any plain script using the prewarm/warm-tunnel threads
            # aborts at exit ("FATAL: exception not rethrown", rc 134).
            import atexit

            atexit.register(shutdown_background, 30.0)
            _atexit_registered = True


def shutdown_background(timeout_s: float = 60.0) -> list:
    """Signal background threads to stop and join them.  Returns the
    threads still alive after the timeout (e.g. one wedged mid-RPC on a
    dead tunnel) — callers who must guarantee a clean exit code can then
    fall back to ``os._exit`` after flushing output."""
    import time as _t

    _stop_event.set()
    deadline = _t.time() + timeout_s
    with _bg_lock:
        threads = list(_bg_threads)
    alive = []
    for t in threads:
        t.join(timeout=max(0.0, deadline - _t.time()))
        if t.is_alive():
            alive.append(t)
    return alive


def warm_tunnel(sync: bool = False) -> None:
    """Absorb the tunneled TPU backend's one-time first-transfer stall.

    The axon relay's first device->host literal transfer of a process
    triggers a server-side bootstrap measured at 70-850 s (erratic); fired
    mid-pipeline it stalls the growing's first ladder sync for that long
    (EXPERIMENTS_r03.jsonl ctimer2-4).  Fired at process start on an empty
    device it was measured at the low end, and a daemon thread lets data
    loading / tracing / compiles proceed under it.  Idempotent per process;
    a no-op wherever transfers are instant (CPU, healthy local devices).
    """
    global _tunnel_warmed
    if _tunnel_warmed:
        return
    _tunnel_warmed = True

    def _go():
        try:
            import jax.numpy as jnp

            float(jnp.zeros(()))
        except Exception:
            pass

    if sync:
        _go()
        return
    import threading

    t = threading.Thread(target=_go, daemon=True, name="faldoi-warm-tunnel")
    register_background(t)
    t.start()
