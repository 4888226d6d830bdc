"""Generic callback wrappers (reference
``src/Numerics/ODESolvers/GenericCallbacks.jl``: AtInit :86,
EveryXWallTimeSeconds :127, EveryXSimulationTime :169,
EveryXSimulationSteps :205).

Callbacks receive the host-side SolveState; they must not trace into jit.
"""

from __future__ import annotations

import time
from typing import Callable


class AtInit:
    """Fire the wrapped callback also at solver init."""

    def __init__(self, cb):
        self.cb = cb

    def init(self, state):
        if hasattr(self.cb, "init"):
            self.cb.init(state)
        self._fire(state)

    def _fire(self, state):
        if hasattr(self.cb, "call"):
            return self.cb.call(state)
        return self.cb(state)

    def call(self, state):
        return self._fire(state)

    def fini(self, state):
        if hasattr(self.cb, "fini"):
            self.cb.fini(state)


class EveryXSimulationSteps:
    def __init__(self, fn: Callable, nsteps: int):
        self.fn = fn
        self.nsteps = int(nsteps)
        self._count = 0

    def init(self, state):
        self._count = 0
        if hasattr(self.fn, "init"):
            self.fn.init(state)

    def call(self, state):
        self._count += 1
        if self._count >= self.nsteps:
            self._count = 0
            return bool(self.fn(state) or False) if callable(self.fn) else False
        return False

    def fini(self, state):
        if hasattr(self.fn, "fini"):
            self.fn.fini(state)


class EveryXSimulationTime:
    def __init__(self, fn: Callable, simtime: float):
        self.fn = fn
        self.simtime = float(simtime)
        self._next = None

    def init(self, state):
        self._next = state.t + self.simtime

    def call(self, state):
        if state.t >= self._next - 1e-12:
            self._next += self.simtime
            return bool(self.fn(state) or False)
        return False


class EveryXWallTimeSeconds:
    """Wall-clock-interval callback.  Single-process: plain wall time (the
    reference synchronizes the clock across MPI ranks, Callbacks.jl:127;
    in SPMD JAX every process takes the same branch by construction when
    using the same host clock policy — multihost sync added in
    parallel.multihost)."""

    def __init__(self, fn: Callable, seconds: float):
        self.fn = fn
        self.seconds = float(seconds)
        self._next = None

    def init(self, state):
        self._next = time.monotonic() + self.seconds

    def call(self, state):
        if time.monotonic() >= self._next:
            self._next = time.monotonic() + self.seconds
            return bool(self.fn(state) or False)
        return False
