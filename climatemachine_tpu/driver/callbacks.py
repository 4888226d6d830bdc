"""Standard driver callbacks.

Scope of reference ``src/Numerics/ODESolvers/GenericCallbacks.jl``
(EveryXWallTimeSeconds :127, EveryXSimulationTime :169,
EveryXSimulationSteps :205, AtInit :86) and
``src/Driver/Callbacks/Callbacks.jl`` (show_updates/SummaryLogCallback
:38-95, monitor_timestep_duration :224, monitor_courant_numbers :280,
checkpoint :378, ConservationCheck wiring :423).

Callback protocol (ode.solve): objects with optional ``init(state)``,
``call(state) -> bool_stop``, ``fini(state)``.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("climatemachine")


class EveryXSimulationSteps:
    """Fire every N steps (reference GenericCallbacks.jl:205)."""

    def __init__(self, fn: Callable, nsteps: int):
        self.fn = fn
        self.nsteps = int(nsteps)

    def init(self, state):
        self._last = state.step

    def call(self, state):
        if state.step - self._last >= self.nsteps:
            self._last = state.step
            return bool(self.fn(state) or False)
        return False

    def fini(self, state):
        pass


class EveryXSimulationTime:
    """Fire every Δt_sim seconds of simulated time (reference :169)."""

    def __init__(self, fn: Callable, dt_sim: float):
        self.fn = fn
        self.dt_sim = float(dt_sim)

    def init(self, state):
        self._next = state.t + self.dt_sim

    def call(self, state):
        if state.t >= self._next - 1e-12:
            while self._next <= state.t + 1e-12:
                self._next += self.dt_sim
            return bool(self.fn(state) or False)
        return False

    def fini(self, state):
        pass


class EveryXWallTimeSeconds:
    """Fire every Δt_wall seconds of wall clock (reference :127; the MPI
    wall-clock sync becomes trivial in a single-controller run)."""

    def __init__(self, fn: Callable, dt_wall: float):
        self.fn = fn
        self.dt_wall = float(dt_wall)

    def init(self, state):
        self._next = time.monotonic() + self.dt_wall

    def call(self, state):
        if time.monotonic() >= self._next:
            self._next = time.monotonic() + self.dt_wall
            return bool(self.fn(state) or False)
        return False

    def fini(self, state):
        pass


class AtInit:
    """Also fire once at init (reference :86)."""

    def __init__(self, inner):
        self.inner = inner

    def init(self, state):
        if hasattr(self.inner, "init"):
            self.inner.init(state)
        self.inner.fn(state)

    def call(self, state):
        return self.inner.call(state)

    def fini(self, state):
        if hasattr(self.inner, "fini"):
            self.inner.fini(state)


@dataclass
class SummaryLog:
    """Periodic runtime/simtime/norm(Q) log lines (reference
    SummaryLogCallback, Callbacks.jl:38-95)."""
    grid: object
    every_steps: int = 100

    def make(self):
        from climatemachine_tpu.dg.reductions import norm

        t0 = {"wall": None}

        def fn(state):
            if t0["wall"] is None:
                t0["wall"] = time.monotonic()
            n = float(norm(self.grid, state.q))
            logger.info(
                "step %d  simtime %.3e  runtime %.1fs  norm(Q) %.8e",
                state.step, state.t, time.monotonic() - t0["wall"], n)
            if not np.isfinite(n):
                logger.error("norm(Q) is not finite — aborting")
                return True

        return EveryXSimulationSteps(fn, self.every_steps)


@dataclass
class ConservationCheck:
    """Assert tracked integrals drift below tolerance (reference
    Driver.jl:621 ConservationCheck)."""
    grid: object
    model: object
    varname: str = "rho"
    error_threshold: float = 1e-7
    every_steps: int = 100

    def make(self):
        from climatemachine_tpu.dg.reductions import weightedsum

        ref = {}
        sl = self.model.prog_spec.index(self.varname).start

        def fn(state):
            total = float(weightedsum(self.grid, state.q, sl))
            if "v0" not in ref:
                ref["v0"] = total
                return
            delta = abs(total - ref["v0"]) / abs(ref["v0"])
            if delta > self.error_threshold:
                logger.error("conservation violation in %s: δ=%.3e",
                             self.varname, delta)
                return True

        return AtInit(EveryXSimulationSteps(fn, self.every_steps))


@dataclass
class MonitorCourant:
    """Log advective/nondiffusive Courant numbers (reference
    Callbacks.jl:280)."""
    grid: object
    model: object
    dt: float
    every_steps: int = 100

    def make(self):
        from climatemachine_tpu.dg.courant import (advective_courant,
                                                   courant,
                                                   nondiffusive_courant)

        def fn(state):
            ca = courant(advective_courant, self.model, self.grid,
                         state.q, state.aux, self.dt)
            cn = courant(nondiffusive_courant, self.model, self.grid,
                         state.q, state.aux, self.dt)
            logger.info("courant: advective %.3f acoustic %.3f", ca, cn)

        return EveryXSimulationSteps(fn, self.every_steps)


@dataclass
class AdaptTimestep:
    """Recompute dt from the target Courant number and update the solver
    in place (reference Callbacks.jl:340 adapt_timestep + updatedt!); the
    solve loop re-jits the step when it sees the new dt."""
    solver_config: object
    every_steps: int = 100
    # skip updates below this relative change: a new dt re-jits the step
    # function, so do not recompile for round-off-level CFL drift
    rtol: float = 1e-3

    def make(self):
        from climatemachine_tpu.dg.courant import calculate_dt

        sc = self.solver_config

        def fn(state):
            dtmodel = sc.dg.balance_law
            if getattr(sc, "ode_solver_type", None) is not None:
                dtmodel = sc.ode_solver_type.getdtmodel(sc.dg.balance_law)
            ndt = float(calculate_dt(sc.dg.grid, dtmodel, state.q,
                                     state.aux, sc.cfl, sc.cfl_direction))
            if abs(ndt - sc.solver.dt) <= self.rtol * sc.solver.dt:
                return
            logger.info("updating time step: %.16g => %.16g",
                        sc.solver.dt, ndt)
            sc.solver.dt = ndt

        return EveryXSimulationSteps(fn, self.every_steps)


def show_not_finite_fields(spec, arr, label=""):
    """Log per-field NaN/Inf counts (reference MPIStateArrays.jl:884
    show_not_finite_fields); returns the offending field names."""
    bad = []
    a = np.asarray(arr)
    for i, nm in enumerate(spec.flattened_names()):
        n_bad = int((~np.isfinite(a[..., i])).sum())
        if n_bad:
            logger.warning("%s: field %s has %d non-finite values",
                           label, nm, n_bad)
            bad.append(nm)
    return bad


@dataclass
class MonitorTimestepDuration:
    """Wall-time per step statistics (reference Callbacks.jl:224:
    device-sync + time_ns deltas, max/min/median/std)."""
    every_steps: int = 100

    def make(self):
        times = {"last": None, "samples": []}

        def fn(state):
            state.q.block_until_ready()
            now = time.monotonic()
            if times["last"] is not None:
                per = (now - times["last"]) / self.every_steps
                times["samples"].append(per)
                s = np.asarray(times["samples"])
                logger.info(
                    "timestep duration: last %.3f ms  median %.3f ms  "
                    "max %.3f ms", 1e3 * per, 1e3 * np.median(s),
                    1e3 * s.max())
            times["last"] = now

        return EveryXSimulationSteps(fn, self.every_steps)


@dataclass
class CheckpointCallback:
    """Interval checkpoints with keep-one rotation (reference
    Callbacks.jl:378-408)."""
    directory: str
    name: str
    every_steps: int = 1000
    keep_one: bool = True

    def make(self):
        from climatemachine_tpu.driver import checkpoint as cp

        counter = {"num": 0}

        def fn(state):
            cp.write_checkpoint(self.directory, self.name, counter["num"],
                                state.q, state.aux, state.t, state.step)
            if self.keep_one and counter["num"] > 0:
                cp.rm_checkpoint(self.directory, self.name,
                                 counter["num"] - 1)
            counter["num"] += 1

        return EveryXSimulationSteps(fn, self.every_steps)
