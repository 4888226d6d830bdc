"""Solver-type strategy objects: assemble time integrators for a config.

Scope of reference ``src/Driver/SolverTypes/`` (ExplicitSolverType,
IMEXSolverType :66 — implicit model AtmosAcousticGravityLinearModel,
implicit solver ManyColumnLU, HEVI vertical splitting).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from climatemachine_tpu.atmos.linear import AtmosAcousticGravityLinearModel
from climatemachine_tpu.dg.spatial import (DGModel, VERTICAL,
                                            remainder_DGModel)
from climatemachine_tpu.ode import ark as ark_mod
from climatemachine_tpu.ode.lsrk import (LSRK54CarpenterKennedy,
                                         LSRK144NiegemannDiehlBusch)
from climatemachine_tpu.solvers.columnwise import (ColumnLayout,
                                                   ManyColumnSolver)


@dataclass
class ExplicitSolverType:
    """Reference ExplicitSolverType.jl:17."""
    solver_method: Callable = LSRK54CarpenterKennedy

    def make(self, dg: DGModel, q0, aux0, dt: float):
        return self.solver_method(lambda q, a, t: dg(q, a, t), dt)

    def getdtmodel(self, bl):
        """Model with the most restrictive dt (reference
        ExplicitSolverType.jl:33: the full balance law)."""
        return bl


@dataclass
class IMEXSolverType:
    """HEVI IMEX (reference IMEXSolverType.jl:66): implicit operator =
    vertical-direction AtmosAcousticGravityLinearModel, columnwise solve,
    split-explicit-implicit remainder."""
    implicit_model: Callable = AtmosAcousticGravityLinearModel
    solver_method: Callable = ark_mod.ARK2GiraldoKellyConstantinescu

    def getdtmodel(self, bl):
        """Most restrictive dynamics are treated implicitly (reference
        IMEXSolverType.jl:118): dt is set by the linear model."""
        return self.implicit_model(bl)

    def make(self, dg: DGModel, q0, aux0, dt: float):
        atmos = dg.balance_law
        grid = dg.grid
        lin = self.implicit_model(atmos)
        dg_lin = DGModel(lin, grid,
                         numerical_flux_first_order=dg.nf1,
                         direction=VERTICAL, update_aux=False,
                         exchange=dg.exchange)

        layout = ColumnLayout(grid, atmos.prog_spec.num)
        col_solver = ManyColumnSolver(
            lambda x: dg_lin(x, aux0, 0.0)[0], layout, q0)

        dg_rem = remainder_DGModel(dg, dg_lin)

        def rhs_ex(q, aux, t):
            # fused full − linear (reference remainder_DGModel; one
            # volume + face pass instead of two)
            return dg_rem(q, aux, t)

        def rhs_im(q, aux, t):
            tend, _ = dg_lin(q, aux, t)
            return tend, aux

        solver = self.solver_method(rhs_ex, rhs_im, col_solver, dt)
        # eager factorization for every distinct implicit diagonal
        import numpy as np
        for g in sorted({float(solver.A_im[i, i])
                         for i in range(solver.nstages)} - {0.0}):
            col_solver.prefactorize(g * dt)
        return solver


@dataclass
class MultirateSolverType:
    """Slow-fast multirate (reference MultirateSolverType.jl:59,
    SlowFastSplitting): fast = acoustic-gravity linear model in ALL
    directions, slow = fused remainder; the config dt drives the slow
    solver, the fast solver substeps at dt / timestep_ratio."""
    fast_model: Callable = AtmosAcousticGravityLinearModel
    slow_method: Callable = LSRK54CarpenterKennedy
    fast_method: Callable = LSRK54CarpenterKennedy
    timestep_ratio: int = 100

    def getdtmodel(self, bl):
        """Most restrictive dynamics live in the fast model (reference
        MultirateSolverType.jl:109)."""
        return self.fast_model(bl)

    def make(self, dg: DGModel, q0, aux0, dt: float):
        from climatemachine_tpu.ode.multirate import MultirateRungeKutta

        lin = self.fast_model(dg.balance_law)
        dg_fast = DGModel(lin, dg.grid,
                          numerical_flux_first_order=dg.nf1,
                          direction=dg.direction, update_aux=False,
                          exchange=dg.exchange)
        dg_slow = remainder_DGModel(dg, dg_fast)
        slow = self.slow_method(lambda q, a, t: dg_slow(q, a, t), dt)
        fast = self.fast_method(lambda q, a, t: dg_fast(q, a, t),
                                dt / self.timestep_ratio)
        return MultirateRungeKutta(slow, fast, dt=dt)


@dataclass
class MISSolverType:
    """Multirate-infinitesimal-step slow-fast splitting (reference
    MISSolverType.jl:48): fast linear model in all directions, slow =
    fused remainder, MIS outer method with nsubsteps fast substeps."""
    fast_model: Callable = AtmosAcousticGravityLinearModel
    mis_method: Callable = None          # e.g. ode.mis.MIS2 (default)
    fast_method: Callable = LSRK54CarpenterKennedy
    nsubsteps: int = 10

    def getdtmodel(self, bl):
        return self.fast_model(bl)

    def make(self, dg: DGModel, q0, aux0, dt: float):
        from climatemachine_tpu.ode.mis import MIS2

        mis = self.mis_method or MIS2
        lin = self.fast_model(dg.balance_law)
        dg_fast = DGModel(lin, dg.grid,
                          numerical_flux_first_order=dg.nf1,
                          direction=dg.direction, update_aux=False,
                          exchange=dg.exchange)
        dg_slow = remainder_DGModel(dg, dg_fast)
        return mis(lambda q, a, t: dg_slow(q, a, t),
                   lambda q, a, t: dg_fast(q, a, t),
                   lambda rhs, d: self.fast_method(rhs, d),
                   nsubsteps=self.nsubsteps, dt=dt)
