"""Bridge to external ODE-solver libraries.

Scope of reference ``src/Numerics/ODESolvers/DifferentialEquations.jl``
(DiffEqJLSolver :133): wrap a third-party ODE package's integrator behind
the framework's ``solver.step(q, aux, t)`` surface so the driver loop,
callbacks, and solver configurations can use it unchanged.

Two backends:

- ``ExternalODESolver(rhs, dt)`` wraps ``jax.experimental.ode.odeint``
  (adaptive Dormand-Prince 5(4)); each framework step integrates one
  ``dt`` window with the external adaptive stepper inside (the reference
  bridge likewise hides the package's internal substepping behind
  fixed-dt dostep!, DifferentialEquations.jl:60-86).
- ``DiffraxSolver(rhs, dt, solver=..., ...)`` wraps ``diffrax`` when the
  package is importable; raises ImportError with guidance otherwise.

Both treat aux as frozen across the external integration window (the
external packages integrate pure dq/dt = f(q, t); aux updates re-enter
through the framework RHS on the next window), matching the reference
bridge, which passes only Q to DiffEq.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


class ExternalODESolver:
    """jax.experimental.ode.odeint (adaptive DP5) behind the framework
    step surface."""

    def __init__(self, rhs: Callable, dt: float, rtol: float = 1e-8,
                 atol: float = 1e-8, mxstep: int = 10_000):
        self.rhs = rhs
        self.dt = float(dt)
        self.rtol, self.atol, self.mxstep = rtol, atol, mxstep
        self.dt_fixed = True

    def step(self, q, aux, t):
        from jax.experimental.ode import odeint

        def f(y, s):
            tend, _ = self.rhs(y, aux, s)
            return tend

        ts = jnp.asarray([t, t + self.dt], dtype=q.dtype)
        path = odeint(f, q, ts, rtol=self.rtol, atol=self.atol,
                      mxstep=self.mxstep)
        q1 = path[-1]
        _, aux1 = self.rhs(q1, aux, t + self.dt)
        return q1, aux1


class DiffraxSolver:
    """diffrax.diffeqsolve behind the framework step surface (optional
    dependency; reference DifferentialEquations.jl:133)."""

    def __init__(self, rhs: Callable, dt: float, solver=None,
                 rtol: float = 1e-8, atol: float = 1e-8,
                 max_steps: int = 4096):
        try:
            import diffrax
        except ImportError as e:
            raise ImportError(
                "DiffraxSolver needs the optional 'diffrax' package; use "
                "ExternalODESolver (jax.experimental.ode) or a built-in "
                "integrator instead") from e
        self._diffrax = diffrax
        self.rhs = rhs
        self.dt = float(dt)
        self.solver = solver or diffrax.Tsit5()
        self.rtol, self.atol = rtol, atol
        self.max_steps = max_steps
        self.dt_fixed = True

    def step(self, q, aux, t):
        dfx = self._diffrax

        def f(s, y, args):
            tend, _ = self.rhs(y, aux, s)
            return tend

        sol = dfx.diffeqsolve(
            dfx.ODETerm(f), self.solver, t0=t, t1=t + self.dt,
            dt0=self.dt / 8, y0=q,
            stepsize_controller=dfx.PIDController(rtol=self.rtol,
                                                  atol=self.atol),
            max_steps=self.max_steps)
        q1 = sol.ys[-1]
        _, aux1 = self.rhs(q1, aux, t + self.dt)
        return q1, aux1
