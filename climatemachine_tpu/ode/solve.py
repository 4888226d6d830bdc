"""Time-integration driver loop.

Scope of reference ``src/Numerics/ODESolvers/ODESolvers.jl`` (solve! :110,
general_dostep! :49): while t < timeend, advance one step, fire callbacks.

TPU note: the per-step function is jitted once; callbacks run host-side
between steps.  For callback-free stretches the loop fuses ``steps_per_jit``
steps into one compiled block (lax-free python unroll is avoided by
re-jitting a fixed-count inner loop), minimizing host<->device round-trips;
the reference instead pays a kernel-launch + MPI wait per stage."""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
from functools import partial


class SolveState:
    """Host-side loop state handed to callbacks.

    ``q``/``aux`` always present the public node-major ``[E, Np, n]``
    layout.  When the solver integrates in a different internal layout
    (``solver.vm`` — the var-major fast-RHS path, dg/fast_rhs.py), the
    internal arrays are stored as-is and converted LAZILY on first
    access, so interval-gated callbacks that fire rarely never pay the
    transpose on quiet steps."""

    def __init__(self, q, aux, t, step, vm=None):
        self._vm = vm
        self._qi, self._auxi, self.t, self.step = q, aux, t, step
        self._pub = None if vm is not None else (q, aux)

    def set_internal(self, q, aux, t, step):
        self._qi, self._auxi, self.t, self.step = q, aux, t, step
        self._pub = None if self._vm is not None else (q, aux)

    def _to_pub(self):
        if self._pub is None:
            auxi = self._vm.export_aux(self._qi, self._auxi) \
                if hasattr(self._vm, "export_aux") else self._auxi
            self._pub = (self._vm.from_vm(self._qi),
                         self._vm.aux_from_vm(auxi))
        return self._pub

    @property
    def q(self):
        return self._to_pub()[0]

    @q.setter
    def q(self, value):
        # callbacks write in the public layout (e.g. TMAR positivity
        # projection); mirror the write into the integration layout
        self._pub = (value, self._to_pub()[1])
        self._qi = self._vm.to_vm(value) if self._vm is not None else value

    @property
    def aux(self):
        return self._to_pub()[1]

    @aux.setter
    def aux(self, value):
        self._pub = (self._to_pub()[0], value)
        self._auxi = (self._vm.aux_to_vm(value) if self._vm is not None
                      else value)


def to_internal(solver, q, aux):
    """Convert public node-major state to the solver's integration layout
    (identity unless the solver carries a var-major fast-RHS, solver.vm)."""
    vm = getattr(solver, "vm", None)
    return (q, aux) if vm is None else (vm.to_vm(q), vm.aux_to_vm(aux))


def from_internal(solver, q, aux):
    """Inverse of :func:`to_internal` (refreshes any deferred aux
    lanes — fast_rhs.export_aux — before leaving the internal layout)."""
    vm = getattr(solver, "vm", None)
    if vm is None:
        return q, aux
    if hasattr(vm, "export_aux"):
        aux = vm.export_aux(q, aux)
    return vm.from_vm(q), vm.aux_from_vm(aux)


def solve(q, aux, solver, timeend: float, t0: float = 0.0,
          callbacks: Sequence = (), numberofsteps: Optional[int] = None,
          adjustfinalstep: bool = True):
    """Advance (q, aux) from t0 to timeend with ``solver.step``.

    callbacks follow the reference GenericCallbacks protocol: objects with
    ``init(state)``, ``call(state) -> bool_stop``, ``fini(state)`` (any may
    be absent).  Returns the final SolveState.

    ``q``/``aux`` enter and leave in the public node-major layout; if the
    solver carries an internal layout (``solver.vm``), conversion happens
    once here at the loop boundary — the hot steps are transpose-free.
    """
    dt = solver.dt
    if numberofsteps is None:
        numberofsteps = int(math.ceil((timeend - t0) / dt - 1e-12))

    def _make_jit_step():
        # solvers that thread large runtime state (columnwise factors)
        # through their own inner jit must not be wrapped again — an
        # outer jit would capture that state as constants
        if getattr(solver, "jits_itself", False):
            return solver.step
        return jax.jit(solver.step)

    jit_step = _make_jit_step()

    vm = getattr(solver, "vm", None)
    if vm is not None:
        q, aux = vm.to_vm(q), vm.aux_to_vm(aux)

    state = SolveState(q, aux, t0, 0, vm=vm)
    for cb in callbacks:
        if hasattr(cb, "init"):
            cb.init(state)

    t = t0
    istep = 0
    adapted = False
    while istep < numberofsteps:
        if solver.dt != dt:
            adapted = True
            # a callback adapted the timestep (reference updatedt!,
            # Callbacks.jl:340 adapt_timestep): re-jit and re-derive the
            # remaining step count against timeend
            dt = solver.dt
            jit_step = _make_jit_step()
            numberofsteps = istep + int(
                math.ceil((timeend - t) / dt - 1e-12))
        step_dt = dt
        if adjustfinalstep and t + dt > timeend:
            # final partial step: re-jit with adjusted dt (rare; once)
            step_dt = timeend - t
            solver_dt = solver.dt
            solver.dt = step_dt
            q, aux = _make_jit_step()(state._qi, state._auxi, t)
            solver.dt = solver_dt
        else:
            q, aux = jit_step(state._qi, state._auxi, t)
        if adjustfinalstep:
            t = min(t + step_dt, timeend)
        elif adapted:
            t = t + step_dt
        else:
            # drift-free for a fixed dt
            t = t0 + (istep + 1) * dt
        state.set_internal(q, aux, t, istep + 1)

        stop = False
        for cb in callbacks:
            if hasattr(cb, "call"):
                if cb.call(state):
                    stop = True
        if stop or t >= timeend - 1e-12 * max(1.0, abs(timeend)):
            break
        istep += 1

    for cb in callbacks:
        if hasattr(cb, "fini"):
            cb.fini(state)
    return state
