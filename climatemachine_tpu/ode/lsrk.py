"""Low-storage 2N Runge-Kutta methods.

Scope of reference ``src/Numerics/ODESolvers/LowStorageRungeKuttaMethod.jl``
(LowStorageRungeKutta2N :26, LSRK54CarpenterKennedy :293,
LSRK144NiegemannDiehlBusch :349, LSRKEulerMethod :247).

Tableaus from the published papers:
- Carpenter & Kennedy (1994), "Fourth-order 2N-storage Runge-Kutta schemes",
  NASA TM-109112.
- Niegemann, Diehl & Busch (2012), JCP 231(2): 14-stage optimized scheme.

TPU note: a step is a pure function ``(q, aux, t) -> (q', aux')``; the
stage loop is a static Python loop that unrolls under jit so XLA sees one
fused graph per step (no host sync between stages, unlike the reference's
per-stage kernel launches + MPI waits)."""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


class LowStorageRungeKutta2N:
    """2N-storage RK: dQ = A_s dQ + dt f(Q); Q += B_s dQ.

    ``pre_stage(q, aux, t) -> q`` mirrors the reference's in-place state
    mutation at the start of every RHS evaluation (e.g. the ocean
    models' vertical filters in update_auxiliary_state!,
    hydrostatic_boussinesq_model.jl:626-663): the stage continues from
    the PROJECTED state, exactly as the reference's mutated Q does.
    """

    def __init__(self, rhs: Callable, dt: float, A, B, C, pre_stage=None):
        self.rhs = rhs
        self.dt = float(dt)
        self.A = tuple(float(a) for a in A)
        self.B = tuple(float(b) for b in B)
        self.C = tuple(float(c) for c in C)
        self.nstages = len(self.A)
        self.dt_fixed = True
        self.pre_stage = pre_stage

    def step(self, q, aux, t):
        dt = self.dt
        dq = None
        for s in range(self.nstages):
            ts = t + self.C[s] * dt
            if self.pre_stage is not None:
                q = self.pre_stage(q, aux, ts)
            tend, aux = self.rhs(q, aux, ts)
            dq = tend if dq is None else self.A[s] * dq + tend
            q = q + (self.B[s] * dt) * dq
        # per-step state projection (e.g. the Held-Suarez every-step
        # exponential filter) fused into the same compiled step
        post = getattr(self, "post_step", None)
        if post is not None:
            q = post(q, aux)
        return q, aux


def LSRKEulerMethod(rhs, dt, pre_stage=None):
    """Forward Euler in LSRK form (reference :247)."""
    return LowStorageRungeKutta2N(rhs, dt, A=(0.0,), B=(1.0,), C=(0.0,),
                                  pre_stage=pre_stage)


def LSRK54CarpenterKennedy(rhs, dt, pre_stage=None):
    """5-stage 4th-order Carpenter-Kennedy (reference :293)."""
    A = (0.0,
         -567301805773.0 / 1357537059087.0,
         -2404267990393.0 / 2016746695238.0,
         -3550918686646.0 / 2091501179385.0,
         -1275806237668.0 / 842570457699.0)
    B = (1432997174477.0 / 9575080441755.0,
         5161836677717.0 / 13612068292357.0,
         1720146321549.0 / 2090206949498.0,
         3134564353537.0 / 4481467310338.0,
         2277821191437.0 / 14882151754819.0)
    C = (0.0,
         1432997174477.0 / 9575080441755.0,
         2526269341429.0 / 6820363962896.0,
         2006345519317.0 / 3224310063776.0,
         2802321613138.0 / 2924317926251.0)
    return LowStorageRungeKutta2N(rhs, dt, A, B, C, pre_stage=pre_stage)


def LSRK144NiegemannDiehlBusch(rhs, dt, pre_stage=None):
    """14-stage 4th-order optimized-stability LSRK (reference :349)."""
    A = (0.0,
         -0.7188012108672410,
         -0.7785331173421570,
         -0.0053282796654044,
         -0.8552979934029281,
         -3.9564138245774565,
         -1.5780575380587385,
         -2.0837094552574054,
         -0.7483334182761610,
         -0.7032861106563359,
         0.0013917096117681,
         -0.0932075369637460,
         -0.9514200470875948,
         -7.1151571693922548)
    B = (0.0367762454319673,
         0.3136296607553959,
         0.1531848691869027,
         0.0030097086818182,
         0.3326293790646110,
         0.2440251405350864,
         0.3718879239592277,
         0.6204126221582444,
         0.1524043173028741,
         0.0760894927419266,
         0.0077604214040978,
         0.0024647284755382,
         0.0780348340049386,
         5.5059777270269628)
    C = (0.0,
         0.0367762454319673,
         0.1249685262725025,
         0.2446177702277698,
         0.2476149531070420,
         0.2969311120382472,
         0.3978149645802642,
         0.5270854589440328,
         0.6981269994175695,
         0.8190890835352128,
         0.8527059887098624,
         0.8604711817462826,
         0.8627060376969976,
         0.8734213127600976)
    return LowStorageRungeKutta2N(rhs, dt, A, B, C, pre_stage=pre_stage)
