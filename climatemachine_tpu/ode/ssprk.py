"""Strong-stability-preserving Runge-Kutta methods.

Scope of reference
``src/Numerics/ODESolvers/StrongStabilityPreservingRungeKuttaMethod.jl``
(StrongStabilityPreservingRungeKutta :25, SSPRK33ShuOsher, SSPRK34SpiteriRuuth).

Shu & Osher (1988) 3-stage 3rd order; Spiteri & Ruuth (2002) 4-stage 3rd
order.  Form: Q_s = a1*Q0 + a2*Q_{s-1} + b*dt*f(Q_{s-1})."""

from __future__ import annotations


class StrongStabilityPreservingRungeKutta:
    def __init__(self, rhs, dt, RKA1, RKA2, RKB, RKC):
        self.rhs = rhs
        self.dt = float(dt)
        self.A1, self.A2 = tuple(RKA1), tuple(RKA2)
        self.B, self.C = tuple(RKB), tuple(RKC)
        self.nstages = len(self.B)

    def step(self, q, aux, t):
        dt = self.dt
        q0 = q
        for s in range(self.nstages):
            tend, aux = self.rhs(q, aux, t + self.C[s] * dt)
            q = self.A1[s] * q0 + self.A2[s] * q + self.B[s] * dt * tend
        return q, aux


def SSPRK22Heuns(rhs, dt):
    """Heun's method as 2-stage SSP RK2 (reference
    StrongStabilityPreservingRungeKuttaMethod.jl:203)."""
    return StrongStabilityPreservingRungeKutta(
        rhs, dt,
        RKA1=(1.0, 0.5), RKA2=(0.0, 0.5),
        RKB=(1.0, 0.5), RKC=(0.0, 1.0))


def SSPRK22Ralstons(rhs, dt):
    """Ralston's 2nd-order SSP RK2 (reference
    StrongStabilityPreservingRungeKuttaMethod.jl:234)."""
    return StrongStabilityPreservingRungeKutta(
        rhs, dt,
        RKA1=(1.0, 5.0 / 8.0), RKA2=(0.0, 3.0 / 8.0),
        RKB=(2.0 / 3.0, 3.0 / 4.0), RKC=(0.0, 2.0 / 3.0))


def SSPRK33ShuOsher(rhs, dt):
    return StrongStabilityPreservingRungeKutta(
        rhs, dt,
        RKA1=(1.0, 3.0 / 4.0, 1.0 / 3.0),
        RKA2=(0.0, 1.0 / 4.0, 2.0 / 3.0),
        RKB=(1.0, 1.0 / 4.0, 2.0 / 3.0),
        RKC=(0.0, 1.0, 1.0 / 2.0))


def SSPRK34SpiteriRuuth(rhs, dt):
    return StrongStabilityPreservingRungeKutta(
        rhs, dt,
        RKA1=(1.0, 0.0, 2.0 / 3.0, 0.0),
        RKA2=(0.0, 1.0, 1.0 / 3.0, 1.0),
        RKB=(1.0 / 2.0, 1.0 / 2.0, 1.0 / 6.0, 1.0 / 2.0),
        RKC=(0.0, 1.0 / 2.0, 1.0, 1.0 / 2.0))
