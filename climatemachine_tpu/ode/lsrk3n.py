"""Runge-Kutta schemes published as 3N-storage in the reference.

Scope of reference ``src/Numerics/ODESolvers/LowStorageRungeKutta3NMethod.jl``
(LowStorageRungeKutta3N :59, LS3NRK44Classic :255, LS3NRK33Heuns :307 —
the ocean split-explicit fast solver).

TPU note: the 3N-storage register economy is an artifact of in-place GPU
programming; under XLA the same classical tableaus are expressed directly
(the compiler owns buffer reuse), so these are implemented as standard
explicit RK with the identical update sequence and order.
"""

from __future__ import annotations

import numpy as np


class ExplicitRungeKutta:
    """Standard explicit RK from a Butcher tableau."""

    def __init__(self, rhs, dt, A, b, c, pre_stage=None):
        self.rhs = rhs
        self.dt = float(dt)
        self.A = np.asarray(A, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.c = np.asarray(c, dtype=np.float64)
        self.nstages = len(self.b)
        self.dt_fixed = True
        self.pre_stage = pre_stage

    def step(self, q, aux, t):
        dt = self.dt
        ks = []
        for i in range(self.nstages):
            qi = q
            for j in range(i):
                if self.A[i, j]:
                    qi = qi + (dt * self.A[i, j]) * ks[j]
            ti = t + self.c[i] * dt
            if self.pre_stage is not None:
                # project the stage state (reference mutates Q at the
                # start of every RHS evaluation)
                qi = self.pre_stage(qi, aux, ti)
            k, aux = self.rhs(qi, aux, ti)
            ks.append(k)
        out = q
        for i in range(self.nstages):
            if self.b[i]:
                out = out + (dt * self.b[i]) * ks[i]
        return out, aux


def LS3NRK44Classic(rhs, dt, pre_stage=None):
    """Classical RK4 (reference :255)."""
    A = [[0, 0, 0, 0],
         [0.5, 0, 0, 0],
         [0, 0.5, 0, 0],
         [0, 0, 1.0, 0]]
    b = [1 / 6, 1 / 3, 1 / 3, 1 / 6]
    c = [0, 0.5, 0.5, 1.0]
    return ExplicitRungeKutta(rhs, dt, A, b, c, pre_stage=pre_stage)


def LS3NRK33Heuns(rhs, dt, pre_stage=None):
    """Heun's third-order method (reference :307)."""
    A = [[0, 0, 0],
         [1 / 3, 0, 0],
         [0, 2 / 3, 0]]
    b = [0.25, 0.0, 0.75]
    c = [0, 1 / 3, 2 / 3]
    return ExplicitRungeKutta(rhs, dt, A, b, c, pre_stage=pre_stage)


class LowStorageRungeKutta3N:
    """True 3N-register form (reference LowStorageRungeKutta3NMethod.jl
    :59 update! :201): per stage

        dQ += f(Q, t + C[s] dt)
        Q  += B[s,0] dt dQ + B[s,1] dt dR
        dR += A[(s+1) % n, 1] dQ
        dQ  = A[(s+1) % n, 0] dQ

    Numerically identical to the Butcher form above; kept because the
    SplitExplicit01 LSRK3n coupling schedules its fast windows from the
    RKW weight row and interleaves substepping between these stage
    updates (ocean/split_explicit.py variant="split01_3n")."""

    def __init__(self, rhs, dt, RKA, RKB, RKC, RKW):
        self.rhs = rhs
        self.dt = float(dt)
        self.RKA = np.asarray(RKA, dtype=np.float64)
        self.RKB = np.asarray(RKB, dtype=np.float64)
        self.RKC = np.asarray(RKC, dtype=np.float64)
        self.RKW = np.asarray(RKW, dtype=np.float64)
        self.nstages = len(self.RKC)
        self.dt_fixed = True

    def step(self, q, aux, t):
        dt, n = self.dt, self.nstages
        dq = dr = None
        for s in range(n):
            tend, aux = self.rhs(q, aux, t + self.RKC[s] * dt)
            dq = tend if dq is None else dq + tend
            q = q + (self.RKB[s, 0] * dt) * dq
            if dr is not None and self.RKB[s, 1]:
                q = q + (self.RKB[s, 1] * dt) * dr
            a2 = self.RKA[(s + 1) % n, 1]
            if a2:
                dr = a2 * dq if dr is None else dr + a2 * dq
            dq = self.RKA[(s + 1) % n, 0] * dq
        return q, aux


def LS3NRK33Heuns3N(rhs, dt):
    """Heun's third-order method in the 3N-register form (reference
    :307-:330 RKA/RKB/RKC/RKW)."""
    return LowStorageRungeKutta3N(
        rhs, dt,
        RKA=[[0.0, 0.0], [0.0, 1.0], [-1.0, 1.0 / 3.0]],
        RKB=[[1.0 / 3.0, 0.0], [2.0 / 3.0, -1.0 / 3.0],
             [3.0 / 4.0, 1.0 / 4.0]],
        RKC=[0.0, 1.0 / 3.0, 2.0 / 3.0],
        RKW=[1.0 / 4.0, 0.0, 3.0 / 4.0])
