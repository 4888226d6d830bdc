"""Split-explicit barotropic/baroclinic ocean coupling.

Scope of reference ``src/Numerics/ODESolvers/SplitExplicitMethod.jl``
(SplitExplicitSolver :30, dostep! :70-177) and
``src/Ocean/SplitExplicit/`` (HydrostaticBoussinesqCoupling.jl,
ShallowWaterCoupling.jl, Communication.jl: tendency_from_slow_to_fast!
:14, reconcile_from_fast_to_slow! :82).

Per slow LSRK2N stage: the 3-D baroclinic tendency is evaluated, its
column integral forces the 2-D barotropic model (Gᵁ), the vertical mean
is removed from the 3-D tendency (ΔGᵘ), the fast model substeps the
stage interval, and the fast (U, η) replace the barotropic content of
the 3-D state (Δu correction + η copy-down).

TPU-first: all couplings are the ColumnOps reshapes — column totals,
top-value extraction, and down-stack broadcasts are contractions and
slicing, executed in one fused step program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.columns import ColumnOps
from climatemachine_tpu.ocean.core import Coupled
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel, _Ih)
from climatemachine_tpu.ocean.shallow_water import ShallowWaterModel


class CoupledHBModel(HydrostaticBoussinesqModel):
    """Baroclinic side (reference HydrostaticBoussinesqCoupling.jl):
    no gη flux (fast model owns it), Coriolis acts on the flow deviation
    uᵈ, the vertically-averaged tendency ΔGᵘ is subtracted via source."""

    def __init__(self, *args, **kw):
        from climatemachine_tpu.utils.variables import VarSpec
        kw.setdefault("coupling", Coupled())
        super().__init__(*args, **kw)
        # horizontal viscous rows act on the deviation uᵈ
        self.grad_spec = VarSpec(u=2, ud=2, theta=1)

    # gη removed: only pkin + advection (reference hydrostatic_pressure!
    # ::Coupled = nothing)
    def flux_first_order(self, q, aux, t):
        ps = self.param_set
        s = self.prog_spec
        theta = self.prog(q, "theta")
        u = self.prog(q, "u")
        F = jnp.zeros(q.shape[:-1] + (3, s.num,), dtype=q.dtype)
        pkin = self.aux_get(aux, "pkin")
        F = s.set(F, "u", ps.grav * pkin[..., None, None] * _Ih(q.dtype))
        if self.momentum_advection == "nonlinear":
            v = self._velocity3(q, aux)
            F = s.set(F, "u", s.get(F, "u")
                      + v[..., :, None] * u[..., None, :])
        if self.tracer_advection == "nonlinear":
            v = self._velocity3(q, aux)
            F = s.set(F, "theta", v * theta[..., None])
        return F

    # flow deviation each RHS (reference compute_flow_deviation!)
    def update_auxiliary_state(self, grid, q, aux, t):
        cols = self._cols(grid)
        u = self.prog(q, "u")
        int_u = cols.column_total(u)
        ud = u - int_u / self.problem.H
        return self.aux_spec.set(aux, "ud", ud)

    # Coriolis on deviation + ΔGᵘ correction
    def source(self, q, gf, aux, t):
        s = self.prog_spec
        out = jnp.zeros_like(q)
        out = s.set(out, "eta", self.aux_get(aux, "wz0"))
        ud = self.aux_get(aux, "ud")
        y = self.aux_get(aux, "y")
        f = self.coriolis_parameter(y)
        cor = jnp.stack([f * ud[..., 1], -f * ud[..., 0]], axis=-1)
        out = s.set(out, "u", cor + self.aux_get(aux, "dGu"))
        return out

    # viscosity: horizontal derivative rows act on uᵈ, vertical on u
    # (reference velocity_gradient_flux! ::Coupled)
    def compute_gradient_argument(self, q, aux, t):
        gs = self.grad_spec
        out = jnp.zeros(q.shape[:-1] + (gs.num,), dtype=q.dtype)
        out = gs.set(out, "u", self.prog(q, "u"))
        out = gs.set(out, "ud", self.aux_get(aux, "ud"))
        return gs.set(out, "theta", self.prog(q, "theta"))

    def compute_gradient_flux(self, grad_g, q, aux, t):
        gs, fs = self.grad_spec, self.gf_spec
        grad_u = grad_g[..., :, gs.index("u")]
        grad_ud = grad_g[..., :, gs.index("ud")]
        grad_th = grad_g[..., :, gs.index("theta").start]
        out = jnp.zeros(q.shape[:-1] + (fs.num,), dtype=q.dtype)
        out = fs.set(out, "div_h_u", grad_u[..., 0, 0] + grad_u[..., 1, 1])
        mixed = jnp.concatenate([grad_ud[..., :2, :], grad_u[..., 2:, :]],
                                axis=-2)
        nu = jnp.asarray([self.nu_h, self.nu_h, self.nu_z], dtype=q.dtype)
        out = fs.set(out, "nu_grad_u", -nu[:, None] * mixed)
        kz = jnp.where(grad_th[..., 2] < 0, self.kappa_c, self.kappa_z)
        kap = jnp.stack([jnp.full_like(kz, self.kappa_h),
                         jnp.full_like(kz, self.kappa_h), kz], axis=-1)
        return fs.set(out, "kappa_grad_theta", -kap * grad_th)


class BarotropicModel(ShallowWaterModel):
    """Fast side (reference ShallowWaterCoupling.jl): forcing = Gᵁ."""

    def __init__(self, problem, **kw):
        kw.setdefault("coupling", Coupled())
        super().__init__(problem, **kw)

    def source(self, q, gf, aux, t):
        s = self.prog_spec
        out = jnp.zeros_like(q)
        U = self.prog(q, "U")
        y = self.aux_get(aux, "y")
        f = self.problem.coriolis_parameter(self, y)
        su = jnp.stack([f * U[..., 1], -f * U[..., 0]], axis=-1)
        su = su + self.aux_get(aux, "GU")
        return s.set(out, "U", su)


class SplitExplicitSolver:
    """(reference SplitExplicitMethod.jl:30) slow LSRK2N over the 3-D
    model + fast substepping of the 2-D model.

    State is the pytree (q3, q2); aux is (aux3, aux2).
    """

    def __init__(self, slow_solver, fast_solver, dg3, dg2, dt=None,
                 fast_dt=None, coupled=True):
        self.slow = slow_solver          # LSRK2N with rhs = dg3
        self.fast = fast_solver          # ExplicitRungeKutta with rhs = dg2
        self.dg3, self.dg2 = dg3, dg2
        self.dt = float(dt if dt is not None else slow_solver.dt)
        self.fast_dt = float(fast_dt if fast_dt is not None
                             else fast_solver.dt)
        # Uncoupled runs the same double-RHS stage loop (matching the
        # reference dostep!, which always evaluates the slow RHS twice and
        # hence filters Q twice per stage) but skips the transfers
        # (reference Communication.jl dispatches to no-ops for Uncoupled)
        self.coupled = coupled
        self.cols = ColumnOps(dg3.grid)
        self.H = dg3.balance_law.problem.H
        self.dt_fixed = True

    # --- coupling reshapes --------------------------------------------------
    def _col_total_2d(self, f3):
        """Column ∫ f dz -> 2-D nodal layout [E2, Np2, n]."""
        tot3 = self.cols.column_total(f3)
        st = self.cols.to_stack(tot3)
        return st[:, 0, 0, :, :]

    def _to_3d(self, f2):
        """Broadcast a 2-D field down every column [E2, Np2, n] -> 3-D."""
        sh = (self.cols.n_horz, self.cols.n_vert, self.cols.Nq[2],
              f2.shape[1], f2.shape[2])
        return self.cols.from_stack(
            jnp.broadcast_to(f2[:, None, None, :, :], sh))

    def step(self, q, aux, t):
        q3, q2 = q
        aux3, aux2 = aux
        m3 = self.dg3.balance_law
        m2 = self.dg2.balance_law
        slow = self.slow
        dt = self.dt

        dq3 = None
        u_sl = m3.prog_spec.index("u")
        for s in range(slow.nstages):
            t_stage = t + slow.C[s] * dt
            if self.coupled:
                # initialize_states!: ΔGᵘ = 0
                aux3 = m3.aux_spec.set(
                    aux3, "dGu", jnp.zeros_like(m3.aux_get(aux3, "dGu")))
                # slow tendency (no accumulation) for the transfer; the
                # reference RHS filters Q in place first
                # (update_auxiliary_state!, hydrostatic_boussinesq_model
                # .jl:637-663) — mirror that side effect via pre_stage
                q3 = self.dg3.pre_stage(q3, aux3, t_stage)
                tend3, aux3 = self.dg3(q3, aux3, t_stage)
                int_du = self._col_total_2d(tend3[..., u_sl])  # [E2,Np2,2]
                aux2 = m2.aux_spec.set(aux2, "GU", int_du)
                aux3 = m3.aux_spec.set(aux3, "dGu",
                                       -self._to_3d(int_du) / self.H)
            else:
                # reference evaluates the slow RHS here too (result
                # discarded for Uncoupled); only its filter side effect
                # on Q survives
                q3 = self.dg3.pre_stage(q3, aux3, t_stage)
            # slow tendency with ΔGᵘ correction (2N accumulation); the
            # second RHS call filters Q again (the exponential θ filter
            # is not idempotent, so this second application is part of
            # the reference trajectory)
            q3 = self.dg3.pre_stage(q3, aux3, t_stage)
            tend3, aux3 = self.dg3(q3, aux3, t_stage)
            dq3 = tend3 if dq3 is None else slow.A[s] * dq3 + tend3

            # fast substepping over the stage interval
            gamma = (1.0 - slow.C[s]) if s == slow.nstages - 1 else \
                (slow.C[s + 1] - slow.C[s])
            if gamma > 0:
                nsub = max(int(-(-gamma * dt // self.fast_dt)), 1)
                fdt = gamma * dt / nsub
                self.fast.dt = fdt
                tf = t_stage
                for _ in range(nsub):
                    q2, aux2 = self.fast.step(q2, aux2, tf)
                    tf += fdt

            # slow state update
            q3 = q3 + (slow.B[s] * dt) * dq3

            if self.coupled:
                # reconcile_from_fast_to_slow!
                int_u = self._col_total_2d(q3[..., u_sl])
                U2 = m2.prog(q2, "U")
                du = (U2 - int_u) / self.H
                aux2 = m2.aux_spec.set(aux2, "du", du)
                q3 = q3.at[..., u_sl].add(self._to_3d(du))
                eta2 = m2.prog(q2, "eta")[..., None]
                eta3 = self._to_3d(eta2)[..., 0]
                q3 = m3.prog_spec.set(q3, "eta", eta3)
        return (q3, q2), (aux3, aux2)
