"""Tracing & profiling hooks.

The reference's observability is wall-clock logs per phase
("Mapping finished in Xs", bgkoctomap_static_node.cpp:98-99; "One cloud
finished in", bgkoctomap_server.cpp:88-89) plus a compile-time Debug_Msg.
Here: a lightweight phase timer usable as a context manager (enabled with
LA3DM_PROFILE=1) and a jax.profiler trace wrapper for device timelines.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall-clock per named phase; ~zero cost when disabled."""

    def __init__(self, enabled: bool | None = None):
        self.enabled = (os.environ.get("LA3DM_PROFILE", "") == "1"
                        if enabled is None else enabled)
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name:32s} {1e3 * self.totals[name]:9.1f} ms "
                         f"({self.counts[name]}x, "
                         f"{1e3 * self.totals[name] / max(self.counts[name], 1):.2f} ms/call)")
        return "\n".join(lines)


TIMER = PhaseTimer()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace for TensorBoard timelines of the device work."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
