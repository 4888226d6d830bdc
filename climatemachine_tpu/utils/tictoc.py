"""Lightweight phase timing.

Scope of reference ``src/Utilities/TicToc/TicToc.jl`` (@tic/@toc macros,
TimingInfo :20, compile-time gate :13): per-site call counts and wall
time, disabled by default.

Device-aware: ``toc`` can block on a jax array so kernel time is
attributed to the phase that launched it (the reference relies on
device-synchronizing measurement similarly).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Optional

_ENABLED = False
_TIMINGS: Dict[str, "TimingInfo"] = {}


@dataclass
class TimingInfo:
    ncalls: int = 0
    time: float = 0.0


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def reset():
    _TIMINGS.clear()


def timings() -> Dict[str, TimingInfo]:
    return dict(_TIMINGS)


@contextmanager
def tictoc(name: str, sync=None):
    """with tictoc("phase", sync=arr): ... — times the block; if ``sync``
    is given its block_until_ready() is awaited before stopping."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            try:
                sync.block_until_ready()
            except Exception:
                pass
        info = _TIMINGS.setdefault(name, TimingInfo())
        info.ncalls += 1
        info.time += time.perf_counter() - t0


def report() -> str:
    lines = ["# tictoc: site  ncalls  total_s  per_call_ms"]
    for name, info in sorted(_TIMINGS.items()):
        per = 1e3 * info.time / max(info.ncalls, 1)
        lines.append(f"{name:30s} {info.ncalls:8d} {info.time:10.3f} "
                     f"{per:10.3f}")
    return "\n".join(lines)
