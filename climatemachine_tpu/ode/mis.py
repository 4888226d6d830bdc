"""Multirate Infinitesimal Step (MIS) methods.

Scope of reference ``src/Numerics/ODESolvers/MultirateInfinitesimalStepMethod.jl``
(MultirateInfinitesimalStep :97, dostep! :252-330; tableaus MIS2 :404,
MIS3C :572, MISRK3 :633 — Knoth & Wensch 2014, Wicker & Skamarock 2002).

Each slow stage solves an inner fast ODE
    z' = F_fast(z, a + b·τ) + offset,  τ ∈ [0, d_i·dt]
with z(0) = yn + Σ_j α_ij (Z_j − yn) and
offset = Σ_j (γ_ij/(d_i·dt)) (Z_j − yn) + Σ_j (β_ij/d_i) F_slow(Z_j).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


class MultirateInfinitesimalStep:
    def __init__(self, slow_rhs: Callable, fast_rhs: Callable,
                 fast_method: Callable, nsubsteps: int, alpha, beta, gamma,
                 dt: float):
        self.slow_rhs = slow_rhs
        self.fast_rhs = fast_rhs
        self.fast_method = fast_method
        self.nsubsteps = int(nsubsteps)
        self.dt = float(dt)
        self.dt_fixed = True

        a = np.asarray(alpha, dtype=np.float64)
        b = np.asarray(beta, dtype=np.float64).copy()
        g = np.asarray(gamma, dtype=np.float64).copy()
        s = a.shape[0]
        d = b.sum(axis=1)
        c = np.zeros(s)
        for i in range(s):
            c[i] = d[i]
            if i > 0:
                c[i] += sum((a[i, j] + g[i, j]) * c[j] for j in range(i))
            if abs(d[i]) > 1e-10:
                b[i, :] /= d[i]
                g[i, :] /= d[i]
        ctil = a @ c
        self.alpha, self.beta, self.gamma = a, b, g
        self.d, self.c, self.ctil = d, c, ctil
        self.nstages = s

    def step(self, q, aux, t):
        dt = self.dt
        a, b, g = self.alpha, self.beta, self.gamma
        d, c, ctil = self.d, self.c, self.ctil
        yn = q
        dY = {}      # Z_j - yn for stage index j>=1 (0-based)
        fY = {}      # slow tendencies of Z_j

        Z = q
        for i in range(1, self.nstages):
            f, aux = self.slow_rhs(Z, aux, t + c[i - 1] * dt)
            fY[i - 1] = f
            dY[i - 1] = Z - yn

            z0 = yn
            offset = None
            for j in range(1, i):
                if a[i, j]:
                    z0 = z0 + a[i, j] * dY[j]
            for j in range(i):
                contrib = 0.0
                if j >= 1 and g[i, j]:
                    contrib = (g[i, j] / dt) * dY[j]
                if b[i, j]:
                    contrib = contrib + b[i, j] * fY[j]
                if not isinstance(contrib, float):
                    offset = contrib if offset is None else offset + contrib

            if abs(d[i]) < 1e-10:
                Z = z0 + dt * (offset if offset is not None else 0.0)
                continue

            nsub = max(int(np.ceil(self.nsubsteps * d[i])), 1)
            dtau = d[i] * dt / nsub
            t_a = t + ctil[i] * dt
            t_b = (c[i] - ctil[i]) / d[i]

            def rhs(z, ax, tau, _off=offset, _ta=t_a, _tb=t_b):
                fz, ax = self.fast_rhs(z, ax, _ta + _tb * tau)
                return (fz if _off is None else fz + _off), ax

            fast = self.fast_method(rhs, dtau)
            ztau, tau = z0, 0.0
            for _ in range(nsub):
                ztau, aux = fast.step(ztau, aux, tau)
                tau += dtau
            Z = ztau
        return Z, aux


def _mis(alpha, beta, gamma):
    def ctor(slow_rhs, fast_rhs, fast_method, nsubsteps, dt):
        return MultirateInfinitesimalStep(slow_rhs, fast_rhs, fast_method,
                                          nsubsteps, alpha, beta, gamma, dt)
    return ctor


MIS2 = _mis(
    alpha=[[0, 0, 0, 0], [0, 0, 0, 0],
           [0, 0.536946566710, 0, 0],
           [0, 0.480892968551, 0.500561163566, 0]],
    beta=[[0, 0, 0, 0],
          [0.126848494553, 0, 0, 0],
          [-0.784838278826, 1.37442675268, 0, 0],
          [-0.0456727081749, -0.00875082271190, 0.524775788629, 0]],
    gamma=[[0, 0, 0, 0], [0, 0, 0, 0],
           [0, 0.652465126004, 0, 0],
           [0, -0.0732769849457, 0.144902430420, 0]])

MIS3C = _mis(
    alpha=[[0, 0, 0, 0], [0, 0, 0, 0],
           [0, 0.589557277145, 0, 0],
           [0, 0.544036601551, 0.565511042564, 0]],
    beta=[[0, 0, 0, 0],
          [0.397525189225, 0, 0, 0],
          [-0.227036463644, 0.624528794618, 0, 0],
          [-0.00295238076840, -0.270971764284, 0.671323159437, 0]],
    gamma=[[0, 0, 0, 0], [0, 0, 0, 0],
           [0, 0.142798786398, 0, 0],
           [0, -0.0428918957402, 0.0202720980282, 0]])

MISRK3 = _mis(
    alpha=np.zeros((4, 4)),
    beta=[[0, 0, 0, 0],
          [1.0 / 3.0, 0, 0, 0],
          [0, 0.5, 0, 0],
          [0, 0, 1.0, 0]],
    gamma=np.zeros((4, 4)))
