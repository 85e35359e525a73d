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

    threading.Thread(target=_go, daemon=True).start()
