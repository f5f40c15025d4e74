"""Timers, counters and device-trace hooks.

The reference tracks wall-clock only (gettimeofday wrappers,
/root/reference/src_semi/lorads_utils.c:52-58, plus per-phase
accumulators in main.c:314-317 and CG stats def_lorads_cgs.h:43-46).
This module carries the same counters and adds the TPU-native layer:
`jax.profiler` trace sessions that capture XLA execution timelines.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional


@dataclasses.dataclass
class PhaseTimers:
    """Per-phase wall-clock accumulators (main.c:314-317 analogue)."""

    read: float = 0.0
    presolve: float = 0.0
    alm: float = 0.0
    admm: float = 0.0
    reopt: float = 0.0
    dual_infeas: float = 0.0
    total: float = 0.0

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


class Stopwatch:
    """Accumulating context-manager timer."""

    def __init__(self):
        self.elapsed = 0.0

    @contextlib.contextmanager
    def __call__(self):
        t0 = time.time()
        try:
            yield
        finally:
            self.elapsed += time.time() - t0


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """Capture an XLA device trace viewable in TensorBoard/XProf.

    No-op when logdir is None (the default), so production runs pay
    nothing.  Usage:

        with device_trace("/tmp/lorads_trace"):
            solver.solve()
    """
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class CGStats:
    """Cumulative CG statistics (def_lorads_cgs.h:43-46 analogue)."""

    iters: int = 0
    solves: int = 0

    def add(self, iters: int, solves: int = 1):
        self.iters += int(iters)
        self.solves += solves
