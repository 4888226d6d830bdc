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
from climatemachine_tpu.solvers.columnwise import (BlockTridiagColumnSolver,
                                                   ColumnLayout,
                                                   ManyColumnSolver)


@dataclass
class ExplicitSolverType:
    """Reference ExplicitSolverType.jl:17."""
    solver_method: Callable = LSRK54CarpenterKennedy
    # "vm"/"auto": integrate in the var-major fast-RHS layout when
    # dg/fast_rhs.py supports the configuration (solver.vm is set; the
    # solve() loop converts once at its boundary); "grid": generic RHS
    state_layout: str = "auto"

    def make(self, dg: DGModel, q0, aux0, dt: float):
        rhs = lambda q, a, t: dg(q, a, t)
        vm = None
        sharded = hasattr(dg, "inner") and hasattr(dg, "mesh")
        if self.state_layout in ("auto", "vm") and not sharded:
            from climatemachine_tpu.balance_laws.interface import BalanceLaw
            from climatemachine_tpu.dg import fast_rhs as _fr
            identity_pre = (type(dg.balance_law).preprocess_state
                            is BalanceLaw.preprocess_state)
            if identity_pre and _fr.supports(dg):
                vm = _fr.VarMajorRHS(dg)
                if not vm.moist:
                    # defer the air_T/theta_v aux-lane refresh to the
                    # export boundary (fast_rhs._thermo_update docs)
                    vm.thermo_writes_aux = False
                rhs = vm
            elif self.state_layout == "vm":
                raise ValueError("state_layout='vm' requested but "
                                 "fast_rhs does not support this config")
        try:
            solver = self.solver_method(
                rhs, dt, pre_stage=None if vm is not None else dg.pre_stage)
        except TypeError:
            solver = self.solver_method(rhs, dt)
        solver.vm = vm
        return solver

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
    # "banded" = BlockTridiagColumnSolver (reference ManyColumnLU memory
    # scaling, the default); "dense" = ManyColumnSolver small-grid oracle
    columnwise_solver: str = "banded"
    # verify at setup that the implicit operator frozen at (aux0, t=0) is
    # actually aux/t-independent (a time-dependent linear model would
    # otherwise silently use a stale factorization)
    check_frozen_operator: bool = True
    # "vm": integrator state rides the var-major fast RHS layout
    # (dg/fast_rhs.py) when supported — q/aux are [E, n, Np]; "grid":
    # node-major [E, Np, n]; "auto" picks vm when fast_rhs supports the
    # configuration on a local (non-sharded) grid
    state_layout: str = "auto"

    def getdtmodel(self, bl):
        """Most restrictive dynamics are treated implicitly (reference
        IMEXSolverType.jl:118): dt is set by the linear model."""
        return self.implicit_model(bl)

    def make(self, dg: DGModel, q0, aux0, dt: float):
        atmos = dg.balance_law
        grid = dg.grid
        lin = self.implicit_model(atmos)
        # ShardedDGModel facade: build the vertical linear model and the
        # fused remainder locally, then re-wrap both over the same mesh
        # (the vertical operator is column-local — its "halo" moves
        # nothing — and the remainder keeps the var-major row halo)
        sharded = hasattr(dg, "inner") and hasattr(dg, "mesh")
        inner = dg.inner if sharded else dg
        dg_lin_local = DGModel(lin, grid,
                               numerical_flux_first_order=dg.nf1,
                               direction=VERTICAL, update_aux=False,
                               exchange=inner.exchange)
        dg_rem = remainder_DGModel(inner, dg_lin_local)
        dg_lin = dg_lin_local
        if sharded:
            from climatemachine_tpu.parallel.sharded import ShardedDGModel
            dg_lin = ShardedDGModel(dg_lin_local, dg.mesh, halo=dg.halo)
            dg_rem = ShardedDGModel(dg_rem, dg.mesh, halo=dg.halo)

        if self.check_frozen_operator:
            # the columnwise factorization freezes the operator at
            # (aux0, t=0); probe at a perturbed aux/t and refuse a
            # time- or state-dependent linear model
            import jax.numpy as jnp
            f0, _ = dg_lin(q0, aux0, 0.0)
            aux_p = atmos.update_auxiliary_state(grid, q0 * 1.001, aux0,
                                                 86400.0)
            f1, _ = dg_lin(q0, aux_p, 86400.0)
            scale = float(jnp.max(jnp.abs(f0))) + 1e-300
            tol = 1e-5 if q0.dtype == jnp.float32 else 1e-11
            err = float(jnp.max(jnp.abs(f1 - f0)))
            if err > tol * scale:
                raise ValueError(
                    "IMEX implicit operator is aux/t-dependent (relative "
                    f"drift {err / scale:.3e}); the frozen columnwise "
                    "factorization would be stale — use HEVISolverType "
                    "(JFNK) or disable with check_frozen_operator=False")

        layout = ColumnLayout(grid, atmos.prog_spec.num)
        solver_cls = {"banded": BlockTridiagColumnSolver,
                      "dense": ManyColumnSolver}[self.columnwise_solver]
        col_solver = solver_cls(
            lambda x: dg_lin(x, aux0, 0.0)[0], layout, q0)

        def rhs_ex(q, aux, t):
            # fused full − linear (reference remainder_DGModel; one
            # volume + face pass instead of two)
            return dg_rem(q, aux, t)

        def rhs_im(q, aux, t):
            tend, _ = dg_lin(q, aux, t)
            return tend, aux

        solver = self.solver_method(rhs_ex, rhs_im, col_solver, dt)
        # the block-layout step can consume the FULL RHS (F' = F + G)
        # with the linear split absorbed into the stage coefficients —
        # cheaper than the fused remainder (ode/ark.py _step_blocks)
        solver.rhs_full = lambda q, a, t: dg(q, a, t)
        # var-major state layout: the full RHS and the grid<->block
        # converters operate on [E, n, Np] states (dg/fast_rhs.py);
        # callers convert q0/aux0 with solver.to_vm/from_vm
        solver.vm = None
        blocks_path = (hasattr(col_solver, "solve_blocks")
                       and getattr(col_solver, "exact_linear_solve", False)
                       and getattr(col_solver, "implied_g", "op") == "op")
        if self.state_layout in ("auto", "vm") and not sharded \
                and blocks_path:
            from climatemachine_tpu.dg import fast_rhs as _fr
            if _fr.supports(dg):
                vm = _fr.VarMajorRHS(dg)
                if not vm.moist:
                    vm.thermo_writes_aux = False
                solver.vm = vm
                solver.rhs_full = vm
                from climatemachine_tpu.solvers.columnwise import \
                    VMColumnLayout
                col_solver.state_layout = VMColumnLayout(layout)
            elif self.state_layout == "vm":
                raise ValueError("state_layout='vm' requested but "
                                 "fast_rhs does not support this config")
        # eager factorization for every distinct implicit diagonal
        import numpy as np
        for g in sorted({float(solver.A_im[i, i])
                         for i in range(solver.nstages)} - {0.0}):
            col_solver.prefactorize(g * dt)
        return solver


class _NonlinearColumnSolver:
    """Implicit-stage solver for a NONLINEAR vertical operator: solves
    F(Q) = Q − α·dt·f_im(Q) − rhs = 0 by Jacobian-free Newton-Krylov
    (reference NonLinearBackwardEulerSolver + JacobianFreeNewtonKrylovSolver
    wired by HEVISolverType.jl:146-186)."""

    def __init__(self, rhs_im, aux0, t0=0.0, n_newton=10, n_krylov=30,
                 fd_eps=1e-10):
        self.rhs_im = rhs_im
        self.aux0 = aux0
        self.t0 = t0
        self.n_newton = n_newton
        self.n_krylov = n_krylov
        self.fd_eps = fd_eps

    def solve(self, rhs, alpha_dt, factors=None):
        from climatemachine_tpu.solvers.iterative import newton_krylov

        def F(qq):
            f, _ = self.rhs_im(qq, self.aux0, self.t0)
            return qq - alpha_dt * f - rhs

        x, _ = newton_krylov(F, rhs, n_newton=self.n_newton,
                             n_krylov=self.n_krylov, fd_eps=self.fd_eps)
        return x


@dataclass
class HEVISolverType:
    """Horizontally-explicit vertically-implicit with the FULL (nonlinear)
    vertical dynamics implicit (reference HEVISolverType.jl:54): the
    implicit operator is the vertical-direction DG of the full balance
    law (vdg, :137-147), solved per stage by JFNK + Krylov (:150-170),
    with the explicit part the naive full − vertical split
    (split_explicit_implicit = false, :179)."""
    solver_method: Callable = ark_mod.ARK2ImplicitExplicitMidpoint
    nonlinear_max_iterations: int = 10
    linear_max_subspace_size: int = 30
    nonlinear_eps: float = 1e-10

    def getdtmodel(self, bl):
        """Most restrictive dynamics are treated implicitly (reference
        HEVISolverType.jl:104)."""
        return bl

    def make(self, dg: DGModel, q0, aux0, dt: float):
        vdg = DGModel(dg.balance_law, dg.grid,
                      numerical_flux_first_order=dg.nf1,
                      direction=VERTICAL, update_aux=False,
                      exchange=dg.exchange)

        def rhs_ex(q, aux, t):
            # naive split: explicit = full − vertical (reference
            # split_explicit_implicit=false + NaiveVariant)
            full, aux = dg(q, aux, t)
            vert, _ = vdg(q, aux, t)
            return full - vert, aux

        def rhs_im(q, aux, t):
            tend, _ = vdg(q, aux, t)
            return tend, aux

        col_solver = _NonlinearColumnSolver(
            rhs_im, aux0, n_newton=self.nonlinear_max_iterations,
            n_krylov=self.linear_max_subspace_size,
            fd_eps=self.nonlinear_eps)
        return self.solver_method(rhs_ex, rhs_im, col_solver, dt)


class _BackwardEulerODESolver:
    """Fully-implicit backward-Euler stepper on the complete model,
    each step solved by JFNK (the reference reaches fully-implicit
    stepping through the DiffEq bridge, ImplicitSolverType.jl:17; this
    is the native equivalent)."""

    def __init__(self, rhs, dt, n_newton=10, n_krylov=30):
        self.rhs = rhs
        self.dt = float(dt)
        self.n_newton = n_newton
        self.n_krylov = n_krylov
        self.dt_fixed = True

    def step(self, q, aux, t):
        from climatemachine_tpu.solvers.iterative import newton_krylov
        dt = self.dt

        def F(qq):
            f, _ = self.rhs(qq, aux, t + dt)
            return qq - dt * f - q

        q1, _ = newton_krylov(F, q, n_newton=self.n_newton,
                              n_krylov=self.n_krylov)
        _, aux1 = self.rhs(q1, aux, t + dt)
        return q1, aux1


@dataclass
class ImplicitSolverType:
    """Fully implicit time stepping (reference ImplicitSolverType.jl:17):
    the complete model is advanced implicitly; dt is not limited by any
    wavespeed, only accuracy."""
    solver_method: Callable = _BackwardEulerODESolver
    n_newton: int = 10
    n_krylov: int = 30

    def getdtmodel(self, bl):
        """The entire model contributes to integrator stability
        (reference ImplicitSolverType.jl:36-40)."""
        return bl

    def make(self, dg: DGModel, q0, aux0, dt: float):
        return self.solver_method(lambda q, a, t: dg(q, a, t), dt,
                                  n_newton=self.n_newton,
                                  n_krylov=self.n_krylov)


@dataclass
class SplitExplicitSolverType:
    """Ocean barotropic/baroclinic split-explicit strategy (reference
    SplitExplicitSolverType.jl:18): slow 3-D method at dt_slow + fast
    2-D method substepping at dt_fast.  ``make`` takes the 3-D and 2-D
    DG models (the reference pulls dg_2D/Q_2D from dg_3D.modeldata,
    :75-77)."""
    dt_slow: float = 0.0
    dt_fast: float = 0.0
    slow_method: Callable = LSRK54CarpenterKennedy
    fast_method: Callable = None     # default LS3NRK33Heuns

    def getdtmodel(self, bl):
        """Explicit: the full model restricts dt (reference :47-51)."""
        return bl

    def make(self, dg3: DGModel, dg2: DGModel, dt_slow: float = None,
             dt_fast: float = None):
        from climatemachine_tpu.ocean.split_explicit import \
            SplitExplicitSolver
        from climatemachine_tpu.ode.lsrk3n import LS3NRK33Heuns

        dts = float(dt_slow if dt_slow is not None else self.dt_slow)
        dtf = float(dt_fast if dt_fast is not None else self.dt_fast)
        fast_method = self.fast_method or LS3NRK33Heuns
        slow = self.slow_method(lambda a, b, t: dg3(a, b, t), dts,
                                pre_stage=dg3.pre_stage)
        fast = fast_method(lambda a, b, t: dg2(a, b, t), dtf,
                           pre_stage=dg2.pre_stage)
        return SplitExplicitSolver(slow, fast, dg3, dg2, dt=dts,
                                   fast_dt=dtf)


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
