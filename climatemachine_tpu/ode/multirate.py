"""Multirate Runge-Kutta: slow outer LSRK2N, fast inner substepping.

Scope of reference ``src/Numerics/ODESolvers/MultirateRungeKuttaMethod.jl``
(MultirateRungeKutta :27, dostep! :104-170): per slow stage s the
accumulated slow tendency dQslow is injected into the fast solver as a
constant forcing scaled by B_s/γ (γ = fractional stage interval), and the
fast solver advances γ·dt in substeps.

TPU note: the whole nested stage/substep structure is a static Python
loop — one fused XLA program per multirate step.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


class MultirateRungeKutta:
    """slow_solver/fast_solver: LowStorageRungeKutta2N instances (their
    ``rhs`` and tableaus are used; dt of the fast solver sets the
    substep target)."""

    def __init__(self, slow_solver, fast_solver, dt: float = None):
        self.slow = slow_solver
        self.fast = fast_solver
        self.dt = float(dt if dt is not None else slow_solver.dt)
        self.dt_fixed = True

    def step(self, q, aux, t):
        slow, fast = self.slow, self.fast
        dt = self.dt
        S = slow.nstages
        dqslow = None
        for s in range(S):
            t_stage = t + slow.C[s] * dt
            tend, aux = slow.rhs(q, aux, t_stage)
            dqslow = tend if dqslow is None else slow.A[s] * dqslow + tend

            gamma = (1.0 - slow.C[s]) if s == S - 1 else \
                (slow.C[s + 1] - slow.C[s])
            if gamma <= 0:
                continue
            slow_delta = slow.B[s] / gamma
            nsub = max(int(jnp.ceil(gamma * dt / fast.dt))
                       if not isinstance(fast.dt, float)
                       else int(-(-gamma * dt // fast.dt)), 1)
            fast_dt = gamma * dt / nsub
            forcing = slow_delta * dqslow
            tf = t_stage
            for _ in range(nsub):
                q, aux = self._fast_step(q, aux, tf, fast_dt, forcing)
                tf += fast_dt
        return q, aux

    def _fast_step(self, q, aux, t, fast_dt, forcing):
        """One fast LSRK2N step with constant slow forcing added to every
        stage tendency (reference fast-stage update with slow_δ)."""
        fast = self.fast
        dq = None
        for s in range(fast.nstages):
            tend, aux = fast.rhs(q, aux, t + fast.C[s] * fast_dt)
            tend = tend + forcing
            dq = tend if dq is None else fast.A[s] * dq + tend
            q = q + (fast.B[s] * fast_dt) * dq
        return q, aux
