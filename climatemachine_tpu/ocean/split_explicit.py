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
from climatemachine_tpu.ocean import core as oc
from climatemachine_tpu.ocean.core import Coupled
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel, _Ih)
from climatemachine_tpu.ocean.shallow_water import ShallowWaterModel


class CoupledHBModel(HydrostaticBoussinesqModel):
    """Baroclinic side (reference HydrostaticBoussinesqCoupling.jl):
    no gη flux (fast model owns it), Coriolis acts on the flow deviation
    uᵈ, the vertically-averaged tendency ΔGᵘ is subtracted via source."""

    def __init__(self, *args, num_impl_steps: int = 0, ivdc_dt: float = 0.0,
                 add_fast_substeps: int = 0, **kw):
        from climatemachine_tpu.utils.variables import VarSpec
        kw.setdefault("coupling", Coupled())
        super().__init__(*args, **kw)
        # horizontal viscous rows act on the deviation uᵈ
        self.grad_spec = VarSpec(u=2, ud=2, theta=1)
        # implicit vertical diffusion/convection (reference OceanModel.jl:8
        # numImplSteps/ivdc_dt): when on, the EXPLICIT vertical
        # diffusivity is κᶻ/2 with no convective branch (OceanModel.jl:
        # 255-262) — the IVDC solve carries the other half + κᶜ
        self.num_impl_steps = int(num_impl_steps)
        self.ivdc_dt = float(ivdc_dt)
        # fast-substep averaging ratio (reference OceanModel.jl
        # add_fast_substeps; Communication.jl:104-120)
        self.add_fast_substeps = int(add_fast_substeps)

    # 01 convention: pkin STORES ∫(−g·αᵀθ) (OceanModel.jl:178) and the
    # flux is pkin·Iʰ without a further g factor (:409) — the flux
    # product is identical to the uncoupled HBM's g·∫(−αᵀθ), but the
    # AUX VALUE carries g (gated by the simple_box_ivd golden table)
    def update_auxiliary_state_gradient(self, dg, gf, q, aux, t):
        cols = self._cols(dg.grid)
        div_h_u = self.gf_spec.get(gf, "div_h_u")
        w = cols.indefinite_integral(-div_h_u[..., None])[..., 0]
        theta = self.prog(q, "theta")
        pkin = cols.reverse_indefinite_integral(
            (-self.param_set.grav * self.alpha_T * theta)[..., None])[..., 0]
        wz0 = cols.broadcast_top(w[..., None])[..., 0]
        aux = self.aux_spec.set(aux, "w", w)
        aux = self.aux_spec.set(aux, "pkin", pkin)
        aux = self.aux_spec.set(aux, "wz0", wz0)
        return aux, q

    # gη removed: only pkin + advection (reference hydrostatic_pressure!
    # ::Coupled = nothing)
    def flux_first_order(self, q, aux, t):
        ps = self.param_set
        s = self.prog_spec
        theta = self.prog(q, "theta")
        u = self.prog(q, "u")
        F = jnp.zeros(q.shape[:-1] + (3, s.num,), dtype=q.dtype)
        pkin = self.aux_get(aux, "pkin")
        F = s.set(F, "u", pkin[..., None, None] * _Ih(q.dtype))
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

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        qP, auxP = super().boundary_state(tag, nrm, q_minus, aux_minus, t)
        # NoSlip walls also zero the flow deviation at the wall for the
        # gradient pass (reference CoastlineNoSlip ::NumericalFluxGradient
        # sets A⁺.u_d = 0, OceanBoundaryConditions.jl:244-260; the
        # average of ±ud gives the same wall value)
        bc = self.problem.boundary_conditions[tag - 1]
        if isinstance(bc.velocity, oc.Impenetrable) and isinstance(
                bc.velocity.drag, oc.NoSlip):
            auxP = self.aux_spec.set(auxP, "ud",
                                     -self.aux_get(aux_minus, "ud"))
        return qP, auxP

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
        if self.num_impl_steps > 0:
            # implicit mixing active: explicit vertical κ is κᶻ/2, no
            # convective branch (reference OceanModel.jl:257-258)
            kz = jnp.full(grad_th.shape[:-1], 0.5 * self.kappa_z,
                          dtype=q.dtype)
        else:
            kz = jnp.where(grad_th[..., 2] < 0, self.kappa_c, self.kappa_z)
        kap = jnp.stack([jnp.full_like(kz, self.kappa_h),
                         jnp.full_like(kz, self.kappa_h), kz], axis=-1)
        return fs.set(out, "kappa_grad_theta", -kap * grad_th)


class BarotropicModel(ShallowWaterModel):
    """Fast side (reference ShallowWaterCoupling.jl / SplitExplicit01
    BarotropicModel.jl): forcing = Gᵁ; aux additionally carries the
    multi-rate averaging accumulators (U_c, η_c), the mid-window saved
    state (U_s, η_s), and the η diagnostics (η_diag, Δη)."""

    def __init__(self, problem, **kw):
        from climatemachine_tpu.utils.variables import VarSpec
        kw.setdefault("coupling", Coupled())
        super().__init__(problem, **kw)
        self.aux_spec = VarSpec(coord=2, y=1, GU=2, du=2,
                                U_c=2, eta_c=1, U_s=2, eta_s=1,
                                eta_diag=1, deta=1)

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
    """Slow LSRK2N over the 3-D model + fast substepping of the 2-D
    model.  State is the pytree (q3, q2); aux is (aux3, aux2).

    Two reference variants:

    - ``variant="new"`` (default; reference SplitExplicitMethod.jl:30 +
      SplitExplicit/Communication.jl): per stage the fast model substeps
      the stage interval at (a rounding of) ``fast_dt`` and its END
      state reconciles the slow state; η is copied down every stage.
    - ``variant="split01"`` (reference SplitExplicit01/
      SplitExplicitLSRK2nMethod.jl + Communication.jl): multi-rate with
      the ``add_fast_substeps`` weighted averaging window (substep
      1/add further, average the fast state over the window, restart
      the next stage from the mid-window save), fast_dt carried across
      stages, η copied + Δη diagnosed at the LAST stage only, and the
      ``num_impl_steps`` IVDC implicit θ mixing after the stage loop
      (both knobs read from the 3-D model, reference OceanModel.jl:8).
    """

    def __init__(self, slow_solver, fast_solver, dg3, dg2, dt=None,
                 fast_dt=None, coupled=True, variant="new"):
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
        assert variant in ("new", "split01", "split01_3n")
        self.variant = variant
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
        if self.variant == "split01_3n":
            return self._step_split01_3n(q, aux, t)
        q3, q2 = q
        aux3, aux2 = aux
        m3 = self.dg3.balance_law
        m2 = self.dg2.balance_law
        slow = self.slow
        dt = self.dt
        add = getattr(m3, "add_fast_substeps", 0)

        split01 = self.variant == "split01"
        dq3 = None
        u_sl = m3.prog_spec.index("u")
        for s in range(slow.nstages):
            t_stage = t + slow.C[s] * dt
            # fractional slow-stage interval
            gamma = (1.0 - slow.C[s]) if s == slow.nstages - 1 else \
                (slow.C[s + 1] - slow.C[s])
            fract_dt = gamma * dt

            # --- initialize_fast_state! (Communication.jl:91-137); the
            # dostep! loop re-creates fast_time_rec = [fast_dt_in, 0]
            # EVERY STAGE (SplitExplicitLSRK2nMethod.jl:117-120), so the
            # substep count is always derived from the input fast_dt
            fast_dt = self.fast_dt
            if add == 0 or not split01:
                steps = max(int(-(-fract_dt // fast_dt)), 1)
                k_lo = k_save = k_hi = steps
            else:
                steps = max(int(-(-fract_dt // fast_dt // add)), 1)
                k_save = add * steps
                k_lo = (add - 1) * steps
                k_hi = (add + 1) * steps
            fast_dt = fract_dt / k_save
            if self.coupled:
                if split01:
                    zc = jnp.zeros_like(m2.aux_get(aux2, "U_c"))
                    aux2 = m2.aux_spec.set(aux2, "U_c", zc)
                    aux2 = m2.aux_spec.set(
                        aux2, "eta_c",
                        jnp.zeros_like(m2.aux_get(aux2, "eta_c")))
                    if s > 0:
                        # restart the fast trajectory from the previous
                        # stage's mid-window save (Communication.jl:130)
                        q2 = m2.prog_spec.set(q2, "U",
                                              m2.aux_get(aux2, "U_s"))
                        q2 = m2.prog_spec.set(
                            q2, "eta", m2.aux_get(aux2, "eta_s"))

                # initialize_adjustment!: ΔGᵘ = 0
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

            # fast substepping over the (widened) averaging window with
            # running accumulation (cummulate_fast_solution!,
            # Communication.jl:216-243)
            self.fast.dt = fast_dt
            tf = t_stage
            count = 0.0
            for sub in range(1, k_hi + 1):
                q2, aux2 = self.fast.step(q2, aux2, tf)
                tf += fast_dt
                if self.coupled and split01:
                    if sub >= k_lo:
                        aux2 = m2.aux_spec.set(
                            aux2, "U_c", m2.aux_get(aux2, "U_c")
                            + m2.prog(q2, "U"))
                        aux2 = m2.aux_spec.set(
                            aux2, "eta_c", m2.aux_get(aux2, "eta_c")
                            + m2.prog(q2, "eta"))
                        count += 1.0
                    if sub == k_save:
                        aux2 = m2.aux_spec.set(aux2, "U_s",
                                               m2.prog(q2, "U"))
                        aux2 = m2.aux_spec.set(aux2, "eta_s",
                                               m2.prog(q2, "eta"))

            # slow state update
            q3 = q3 + (slow.B[s] * dt) * dq3

            if self.coupled and split01:
                # reconcile_from_fast_to_slow! (SplitExplicit01/
                # Communication.jl:245-338)
                U_c = m2.aux_get(aux2, "U_c") / count
                eta_c = m2.aux_get(aux2, "eta_c") / count
                aux2 = m2.aux_spec.set(aux2, "U_c", U_c)
                aux2 = m2.aux_spec.set(aux2, "eta_c", eta_c)
                int_u = self._col_total_2d(q3[..., u_sl])
                du = (U_c - int_u) / self.H
                aux2 = m2.aux_spec.set(aux2, "du", du)
                q3 = q3.at[..., u_sl].add(self._to_3d(du))
                if s == slow.nstages - 1:
                    # η diagnostics + 2D→3D η copy + fast-state reset,
                    # last stage only (Communication.jl:317-336)
                    eta_sl = m3.prog_spec.index("eta").start
                    eta3_top = self._col_top_2d(q3[..., eta_sl:eta_sl + 1])
                    aux2 = m2.aux_spec.set(aux2, "eta_diag",
                                           eta3_top[..., 0])
                    aux2 = m2.aux_spec.set(
                        aux2, "deta", eta_c - eta3_top[..., 0])
                    q3 = m3.prog_spec.set(
                        q3, "eta", self._to_3d(eta_c[..., None])[..., 0])
                    q2 = m2.prog_spec.set(q2, "U",
                                          m2.aux_get(aux2, "U_s"))
                    q2 = m2.prog_spec.set(q2, "eta",
                                          m2.aux_get(aux2, "eta_s"))
            elif self.coupled:
                # new-module reconcile (SplitExplicit/Communication.jl:82):
                # fast END state, η copied every stage
                int_u = self._col_total_2d(q3[..., u_sl])
                U2 = m2.prog(q2, "U")
                du = (U2 - int_u) / self.H
                aux2 = m2.aux_spec.set(aux2, "du", du)
                q3 = q3.at[..., u_sl].add(self._to_3d(du))
                eta2 = m2.prog(q2, "eta")[..., None]
                q3 = m3.prog_spec.set(q3, "eta", self._to_3d(eta2)[..., 0])

        # implicit vertical diffusion/convection of θ after the stage
        # loop (SplitExplicitLSRK2nMethod.jl:218-264)
        n_impl = getattr(m3, "num_impl_steps", 0)
        if split01 and n_impl > 0:
            from climatemachine_tpu.ocean.ivdc import ivdc_solve
            for _ in range(n_impl):
                q3 = ivdc_solve(m3, self.dg3, q3, aux3, m3.ivdc_dt)
        return (q3, q2), (aux3, aux2)

    def _step_split01_3n(self, q, aux, t):
        """Reference SplitExplicit01/SplitExplicitLSRK3nMethod.jl +
        Communication.jl set_fast_for_stepping! (:8-:88): the slow model
        walks the LowStorageRungeKutta3N two-register recurrence
        (LS3NRK33Heuns); the fast windows are scheduled on the LCM-12
        grid of the RK coefficients, the stage-1 window start saves the
        original fast state (S_fast), middle stages RESTART from it, and
        the last stage starts at the RKW[1] weight offset from the
        mid-window save."""
        import math
        q3, q2 = q
        aux3, aux2 = aux
        m3 = self.dg3.balance_law
        m2 = self.dg2.balance_law
        slow = self.slow                 # LowStorageRungeKutta3N
        dt = self.dt
        add = getattr(m3, "add_fast_substeps", 0)
        rkA, rkB = slow.RKA, slow.RKB
        rkC, rkW = slow.RKC, slow.RKW
        nst = slow.nstages
        u_sl = m3.prog_spec.index("u")

        # LCM-12 fast grid (set_fast_for_stepping!:31-35)
        steps0 = max(math.ceil(dt / self.fast_dt / 12.0), 1)
        ntsFull = 12 * steps0
        fast_dt_full = dt / ntsFull
        add_steps = (ntsFull // add) if add > 0 else 0

        dq3 = dr3 = None
        S2 = None
        for s in range(nst):
            t_stage = t + rkC[s] * dt
            if s == nst - 1:
                t0f = rkW[0] * dt
                fract = 1.0 - rkW[0]
                save_flag = 1
            else:
                t0f = 0.0
                fract = float(rkC[s + 1])
                save_flag = 0
            steps = max(math.ceil(fract * dt / fast_dt_full), 1)
            addc = min(add_steps, steps - 1)
            k_lo, k_hi = steps - addc, steps + addc
            k_save = save_flag * steps
            if s == 0:
                k_save = int(round(ntsFull * rkW[0]))
            fast_dt = fract * dt / steps

            # fast-state select (set_fast_for_stepping!:72-81)
            if s == 0:
                S2 = q2
            elif s == nst - 1:
                q2 = m2.prog_spec.set(q2, "U", m2.aux_get(aux2, "U_s"))
                q2 = m2.prog_spec.set(q2, "eta",
                                      m2.aux_get(aux2, "eta_s"))
            else:
                q2 = S2

            aux2 = m2.aux_spec.set(
                aux2, "U_c", jnp.zeros_like(m2.aux_get(aux2, "U_c")))
            aux2 = m2.aux_spec.set(
                aux2, "eta_c", jnp.zeros_like(m2.aux_get(aux2, "eta_c")))
            aux3 = m3.aux_spec.set(
                aux3, "dGu", jnp.zeros_like(m3.aux_get(aux3, "dGu")))

            # transfer tendency (tendency_from_slow_to_fast!)
            q3 = self.dg3.pre_stage(q3, aux3, t_stage)
            tend3, aux3 = self.dg3(q3, aux3, t_stage)
            int_du = self._col_total_2d(tend3[..., u_sl])
            aux2 = m2.aux_spec.set(aux2, "GU", int_du)
            aux3 = m3.aux_spec.set(aux3, "dGu",
                                   -self._to_3d(int_du) / self.H)

            # slow 3N register walk (LowStorageRungeKutta3NMethod.jl
            # update! :201: dQ += f; Q += b1 dt dQ + b2 dt dR;
            # dR += a2 dQ; dQ *= a1) — update BEFORE the fast window
            # (SplitExplicitLSRK3nMethod.jl:179-196)
            q3 = self.dg3.pre_stage(q3, aux3, t_stage)
            tend3, aux3 = self.dg3(q3, aux3, t_stage)
            dq3 = tend3 if dq3 is None else dq3 + tend3
            q3 = q3 + (rkB[s, 0] * dt) * dq3
            if dr3 is not None and rkB[s, 1]:
                q3 = q3 + (rkB[s, 1] * dt) * dr3
            a2 = rkA[(s + 1) % nst, 1]
            if a2:
                dr3 = a2 * dq3 if dr3 is None else dr3 + a2 * dq3
            dq3 = rkA[(s + 1) % nst, 0] * dq3

            # fast substepping over the scheduled window
            self.fast.dt = fast_dt
            count = 0.0
            for sub in range(1, k_hi + 1):
                tf = t + t0f + (sub - 1) * fast_dt
                q2, aux2 = self.fast.step(q2, aux2, tf)
                if sub >= k_lo:
                    aux2 = m2.aux_spec.set(
                        aux2, "U_c",
                        m2.aux_get(aux2, "U_c") + m2.prog(q2, "U"))
                    aux2 = m2.aux_spec.set(
                        aux2, "eta_c",
                        m2.aux_get(aux2, "eta_c") + m2.prog(q2, "eta"))
                    count += 1.0
                if sub == k_save:
                    aux2 = m2.aux_spec.set(aux2, "U_s",
                                           m2.prog(q2, "U"))
                    aux2 = m2.aux_spec.set(aux2, "eta_s",
                                           m2.prog(q2, "eta"))

            # reconcile (same as split01)
            U_c = m2.aux_get(aux2, "U_c") / count
            eta_c = m2.aux_get(aux2, "eta_c") / count
            aux2 = m2.aux_spec.set(aux2, "U_c", U_c)
            aux2 = m2.aux_spec.set(aux2, "eta_c", eta_c)
            int_u = self._col_total_2d(q3[..., u_sl])
            du = (U_c - int_u) / self.H
            aux2 = m2.aux_spec.set(aux2, "du", du)
            q3 = q3.at[..., u_sl].add(self._to_3d(du))
            if s == nst - 1:
                eta_sl = m3.prog_spec.index("eta").start
                eta3_top = self._col_top_2d(q3[..., eta_sl:eta_sl + 1])
                aux2 = m2.aux_spec.set(aux2, "eta_diag",
                                       eta3_top[..., 0])
                aux2 = m2.aux_spec.set(aux2, "deta",
                                       eta_c - eta3_top[..., 0])
                q3 = m3.prog_spec.set(
                    q3, "eta", self._to_3d(eta_c[..., None])[..., 0])
                q2 = m2.prog_spec.set(q2, "U", m2.aux_get(aux2, "U_s"))
                q2 = m2.prog_spec.set(q2, "eta",
                                      m2.aux_get(aux2, "eta_s"))

        n_impl = getattr(m3, "num_impl_steps", 0)
        if n_impl > 0:
            from climatemachine_tpu.ocean.ivdc import ivdc_solve
            for _ in range(n_impl):
                q3 = ivdc_solve(m3, self.dg3, q3, aux3, m3.ivdc_dt)
        return (q3, q2), (aux3, aux2)

    def _col_top_2d(self, f3):
        """Top-surface nodal values -> 2-D layout [E2, Np2, n]."""
        st = self.cols.to_stack(f3)
        return st[:, -1, -1, :, :]
