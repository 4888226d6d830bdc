"""3-D hydrostatic Boussinesq ocean model.

Scope of reference ``src/Ocean/HydrostaticBoussinesq/
hydrostatic_boussinesq_model.jl`` (HydrostaticBoussinesqModel :24; fluxes
:428-535; source :545-585; w/pkin stack integrals :668-712; per-RHS
vertical filters :626-663) and ``LinearHBModel.jl``.

Primitive hydrostatic equations with a linear free surface:
  ∂u/∂t + ∇·(v⊗u + g(η + pkin) I_h) = -f×u + ∇·(ν∇u) + forcing
  ∂η/∂t = w(z=0)
  ∂θ/∂t + ∇·(vθ) = ∇·(κ∇θ)
with w = -∫_b^z ∇ʰ·u dz (continuity) and pkin = ∫_z^0 -αᵀθ dz.

TPU-first: the stack integrals are the ColumnOps MXU contraction +
layer cumsum (no per-column scan); the per-RHS vertical filters are the
modal filter matrices (one contraction).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.dg.columns import ColumnOps
from climatemachine_tpu.ocean import core as oc
from climatemachine_tpu.physics.parameters import EARTH, PlanetParameterSet
from climatemachine_tpu.utils.variables import VarSpec


def _Ih(dtype):
    """3x2 horizontal embedding (reference Iʰ)."""
    return jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], dtype=dtype)


@dataclass
class OceanForcing:
    u: Optional[Callable] = None
    v: Optional[Callable] = None
    eta: Optional[Callable] = None
    theta: Optional[Callable] = None


class HydrostaticBoussinesqModel(BalanceLaw):
    """(reference hydrostatic_boussinesq_model.jl:24)"""

    def __init__(self, problem, param_set: PlanetParameterSet = EARTH,
                 coupling=None, momentum_advection=None,
                 tracer_advection="nonlinear",
                 forcing: OceanForcing = None,
                 rho_o=1000.0, c_h=0.0, c_z=0.0, alpha_T=2e-4,
                 nu_h=5e3, nu_z=5e-3, kappa_h=1e3, kappa_z=1e-4,
                 kappa_c=1e-1, f_o=1e-4, beta=1e-11,
                 apply_vert_filters: bool = True):
        self.apply_vert_filters = apply_vert_filters
        self.problem = problem
        self.param_set = param_set
        self.coupling = coupling or oc.Uncoupled()
        # default None matches the reference (hydrostatic_boussinesq_
        # model.jl:47 momentum_advection = nothing); pass "nonlinear"
        # for the ∇·(v⊗u) term (NonLinearAdvectionTerm)
        self.momentum_advection = momentum_advection
        self.tracer_advection = tracer_advection
        self.forcing = forcing or OceanForcing()
        self.rho_o, self.c_h, self.c_z = rho_o, c_h, c_z
        self.alpha_T = alpha_T
        self.nu_h, self.nu_z = nu_h, nu_z
        self.kappa_h, self.kappa_z, self.kappa_c = kappa_h, kappa_z, kappa_c
        self.f_o, self.beta = f_o, beta

        self.prog_spec = VarSpec(u=2, eta=1, theta=1)
        self.aux_spec = VarSpec(coord=3, y=1, w=1, pkin=1, wz0=1,
                                ud=2, dGu=2)
        self.grad_spec = VarSpec(u=2, theta=1)
        self.gf_spec = VarSpec(div_h_u=1, nu_grad_u=(3, 2),
                               kappa_grad_theta=3)
        self._colops = {}
        self._filters = {}

    # --- schemas ------------------------------------------------------------
    def vars_state(self, state_type) -> VarSpec:
        if isinstance(state_type, st.Prognostic):
            return self.prog_spec
        if isinstance(state_type, st.Auxiliary):
            return self.aux_spec
        if isinstance(state_type, st.Gradient):
            return self.grad_spec
        if isinstance(state_type, st.GradientFlux):
            return self.gf_spec
        if isinstance(state_type, st.UpwardIntegrals):
            return VarSpec(div_h_u=1, alpha_theta=1)
        if isinstance(state_type, st.DownwardIntegrals):
            return VarSpec(alpha_theta=1)
        return VarSpec()

    def prog(self, q, name):
        return self.prog_spec.get(q, name)

    def aux_get(self, aux, name):
        return self.aux_spec.get(aux, name)

    # --- helpers ------------------------------------------------------------
    def _cols(self, grid) -> ColumnOps:
        key = id(grid)
        if key not in self._colops:
            self._colops[key] = ColumnOps(grid)
        return self._colops[key]

    def _vert_filters(self, grid):
        """(cutoff on u, exponential on θ) vertical filters (reference
        modeldata vert_filter/exp_filter, solver setup)."""
        key = id(grid)
        if key not in self._filters:
            from climatemachine_tpu.mesh.filters import (CutoffFilter,
                                                         ExponentialFilter)
            # reference solver setup: CutoffFilter(grid, Nvert-1) with
            # Nvert = vertical poly order N -> zero the top TWO modes
            # (hydrostatic_spindown.jl:103, simple_box.jl config)
            Nv = grid.Nq[-1] - 2
            self._filters[key] = (CutoffFilter(grid, Nc=Nv),
                                  ExponentialFilter(grid, Nc=1, s=8))
        return self._filters[key]

    # --- initialization -----------------------------------------------------
    def nodal_init_state_auxiliary(self, geom, aux):
        coords = geom["coords"]
        aux = self.aux_spec.set(aux, "y", coords[..., 1])
        return self.problem.init_aux(self, coords, aux)

    def init_state_prognostic(self, coords, aux, t):
        return self.problem.init_state(self, coords, aux, t)

    # --- per-RHS filters (reference update_auxiliary_state!, :626-663) ------
    def preprocess_state(self, dg, q, aux, t):
        if not self.apply_vert_filters:
            return q
        vert_cut, exp_f = self._vert_filters(dg.grid)
        qf = vert_cut(q, direction="vertical")
        q = self.prog_spec.set(q, "u", self.prog_spec.get(qf, "u"))
        qe = exp_f(q, direction="vertical")
        return self.prog_spec.set(q, "theta", self.prog_spec.get(qe, "theta"))

    # --- gradient pass ------------------------------------------------------
    def compute_gradient_argument(self, q, aux, t):
        out = jnp.zeros(q.shape[:-1] + (self.grad_spec.num,), dtype=q.dtype)
        out = self.grad_spec.set(out, "u", self.prog(q, "u"))
        return self.grad_spec.set(out, "theta", self.prog(q, "theta"))

    def compute_gradient_flux(self, grad_g, q, aux, t):
        """(reference compute_gradient_flux!, :247-271): store ∇ʰ·u, -ν∇u,
        -κ∇θ with convective-adjustment vertical diffusivity."""
        gs, fs = self.grad_spec, self.gf_spec
        grad_u = grad_g[..., :, gs.index("u")]          # [..., 3, 2]
        grad_th = grad_g[..., :, gs.index("theta").start]  # [..., 3]
        out = jnp.zeros(q.shape[:-1] + (fs.num,), dtype=q.dtype)
        out = fs.set(out, "div_h_u", grad_u[..., 0, 0] + grad_u[..., 1, 1])
        nu = jnp.asarray([self.nu_h, self.nu_h, self.nu_z], dtype=q.dtype)
        out = fs.set(out, "nu_grad_u", -nu[:, None] * grad_u)
        kz = jnp.where(grad_th[..., 2] < 0, self.kappa_c, self.kappa_z)
        kap = jnp.stack([jnp.full_like(kz, self.kappa_h),
                         jnp.full_like(kz, self.kappa_h), kz], axis=-1)
        return fs.set(out, "kappa_grad_theta", -kap * grad_th)

    # --- stack integrals (reference update_auxiliary_state_gradient!) -------
    def update_auxiliary_state_gradient(self, dg, gf, q, aux, t):
        cols = self._cols(dg.grid)
        div_h_u = self.gf_spec.get(gf, "div_h_u")
        w = cols.indefinite_integral(-div_h_u[..., None])[..., 0]
        theta = self.prog(q, "theta")
        pkin = cols.reverse_indefinite_integral(
            (-self.alpha_T * theta)[..., None])[..., 0]
        wz0 = cols.broadcast_top(w[..., None])[..., 0]
        aux = self.aux_spec.set(aux, "w", w)
        aux = self.aux_spec.set(aux, "pkin", pkin)
        aux = self.aux_spec.set(aux, "wz0", wz0)
        return aux, q

    # --- fluxes -------------------------------------------------------------
    def _velocity3(self, q, aux):
        u = self.prog(q, "u")
        w = self.aux_get(aux, "w")
        return jnp.concatenate([u, w[..., None]], axis=-1)

    def flux_first_order(self, q, aux, t):
        ps = self.param_set
        s = self.prog_spec
        eta = self.prog(q, "eta")
        theta = self.prog(q, "theta")
        u = self.prog(q, "u")
        F = jnp.zeros(q.shape[:-1] + (3, s.num,), dtype=q.dtype)
        Ih = _Ih(q.dtype)
        pkin = self.aux_get(aux, "pkin")
        # g(η + pkin) I_h into u flux
        F = s.set(F, "u", ps.grav * (eta + pkin)[..., None, None] * Ih)
        if self.momentum_advection == "nonlinear":
            v = self._velocity3(q, aux)
            Fu = s.get(F, "u") + v[..., :, None] * u[..., None, :]
            F = s.set(F, "u", Fu)
        if self.tracer_advection == "nonlinear":
            v = self._velocity3(q, aux)
            F = s.set(F, "theta", v * theta[..., None])
        return F

    def flux_second_order(self, q, gf, hyper, aux, t):
        s, fs = self.prog_spec, self.gf_spec
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        F = s.set(F, "u", fs.get(gf, "nu_grad_u"))
        return s.set(F, "theta", fs.get(gf, "kappa_grad_theta"))

    # --- source -------------------------------------------------------------
    def coriolis_parameter(self, y):
        """Delegates to the problem (reference coriolis_parameter,
        simple_box_problem.jl:77-146)."""
        if hasattr(self.problem, "coriolis_parameter"):
            return self.problem.coriolis_parameter(self, y)
        return self.f_o + self.beta * y

    def source(self, q, gf, aux, t):
        s = self.prog_spec
        out = jnp.zeros_like(q)
        out = s.set(out, "eta", self.aux_get(aux, "wz0"))
        u = self.prog(q, "u")
        y = self.aux_get(aux, "y")
        f = self.coriolis_parameter(y)
        cor = jnp.stack([f * u[..., 1], -f * u[..., 0]], axis=-1)
        out = s.set(out, "u", cor)
        fr = self.forcing
        if any(x is not None for x in (fr.u, fr.v, fr.eta, fr.theta)):
            args = (y, t, u[..., 0], u[..., 1], self.aux_get(aux, "w"),
                    self.prog(q, "eta"), self.prog(q, "theta"))
            if fr.u is not None or fr.v is not None:
                su = fr.u(*args) if fr.u else 0.0
                sv = fr.v(*args) if fr.v else 0.0
                out = s.set(out, "u", s.get(out, "u")
                            + jnp.stack([jnp.broadcast_to(su, y.shape),
                                         jnp.broadcast_to(sv, y.shape)],
                                        axis=-1))
            if fr.eta is not None:
                out = s.set(out, "eta", s.get(out, "eta") + fr.eta(*args))
            if fr.theta is not None:
                out = s.set(out, "theta", s.get(out, "theta") + fr.theta(*args))
        return out

    # --- numerics -----------------------------------------------------------
    def wavespeed(self, nrm, q, aux, t):
        c = jnp.asarray([self.c_h, self.c_h, self.c_z], dtype=q.dtype)
        return jnp.abs(jnp.einsum("...c,c->...", nrm, c))

    def numerical_flux_penalty(self, nrm, qM, auxM, qP, auxP, dq):
        """Δη = 0: η carries no flux jump (reference update_penalty!,
        :598-616)."""
        return self.prog_spec.set(dq, "eta", jnp.zeros_like(
            self.prog(dq, "eta")))

    # --- boundary conditions ------------------------------------------------
    def boundary_conditions(self):
        return self.problem.boundary_conditions

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        bc = self.problem.boundary_conditions[tag - 1]
        uM = self.prog(q_minus, "u")
        uP = oc.velocity_ghost(bc.velocity, nrm[..., :2], uM)
        qP = self.prog_spec.set(q_minus, "u", uP)
        wM = self.aux_get(aux_minus, "w")
        wP = wM
        if isinstance(bc.velocity, oc.Impenetrable):
            wP = -wM if isinstance(bc.velocity.drag, oc.NoSlip) else wM
        auxP = self.aux_spec.set(aux_minus, "w", wP)
        return qP, auxP

    def boundary_state_gradient_flux(self, tag, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        """Second-order ghost: 2·target − minus so the central AVERAGE
        equals the reference's boundary flux.  The reference evaluates
        flux_second_order(Q⁺, D⁺) with the ghost DIRECTLY
        (NumericalFluxes.jl:938-966 normal_boundary_flux_second_order!);
        this framework's surface pass always averages minus/plus, so the
        ghost is chosen to make the average equal the reference's D⁺:

        - FreeSlip:   ref D⁺ = 0  (bc_velocity.jl:147) → ghost −D⁻
        - NoSlip:     ref D⁺ = D⁻ (bc_velocity.jl:71)  → ghost copy
        - Kin.Stress: ref D⁺ = n⊗τ (bc_velocity.jl:233) → 2(n⊗τ) − D⁻
        - Insulating: ref D⁺ = 0  (bc_temperature.jl:45) → −D⁻
        - Temp.Flux:  ref D⁺ = n·f (bc_temperature.jl:85) → 2(n·f) − D⁻
        """
        bc = self.problem.boundary_conditions[tag - 1]
        fs = self.gf_spec
        gfP = gf_minus
        v = bc.velocity
        if isinstance(v.drag, oc.FreeSlip):
            gfP = fs.set(gfP, "nu_grad_u", -fs.get(gf_minus, "nu_grad_u"))
        elif isinstance(v.drag, oc.KinematicStress) and (
                v.drag.stress
                or getattr(self.problem, "_stress", None)):
            # KinematicStress() with no explicit function dispatches to
            # the problem's own stress (reference kinematic_stress(p, y, ρ),
            # homogeneous_box.jl:65 / ocean_gyre.jl:92)
            stress = v.drag.stress or self.problem._stress
            y = self.aux_get(aux_minus, "y")
            tau = stress(self.problem, y, t)            # [..., 2]
            target = nrm[..., :, None] * tau[..., None, :]
            gfP = fs.set(gfP, "nu_grad_u",
                         2 * target - fs.get(gf_minus, "nu_grad_u"))
        # NoSlip: copy (reference D⁺.ν∇u = D⁻.ν∇u)
        tbc = bc.temperature
        if isinstance(tbc, oc.Insulating):
            gfP = fs.set(gfP, "kappa_grad_theta",
                         -fs.get(gf_minus, "kappa_grad_theta"))
        elif isinstance(tbc, oc.TemperatureFlux) and tbc.flux:
            y = self.aux_get(aux_minus, "y")
            theta = self.prog(q_minus, "theta")
            target = nrm * tbc.flux(self.problem, y, theta, t)[..., None]
            gfP = fs.set(gfP, "kappa_grad_theta",
                         2 * target - fs.get(gf_minus, "kappa_grad_theta"))
        return gfP


HBModel = HydrostaticBoussinesqModel


class LinearHBModel(BalanceLaw):
    """Linearization for IMEX vertical-implicit ocean solves (reference
    LinearHBModel.jl): keeps the pressure/continuity couplings and the
    viscous fluxes, drops advection."""

    def __init__(self, ocean: HydrostaticBoussinesqModel):
        self.ocean = ocean

    def vars_state(self, state_type):
        return self.ocean.vars_state(state_type)

    def compute_gradient_argument(self, q, aux, t):
        return self.ocean.compute_gradient_argument(q, aux, t)

    def compute_gradient_flux(self, grad_g, q, aux, t):
        return self.ocean.compute_gradient_flux(grad_g, q, aux, t)

    def flux_second_order(self, q, gf, hyper, aux, t):
        return self.ocean.flux_second_order(q, gf, hyper, aux, t)

    def flux_first_order(self, q, aux, t):
        o = self.ocean
        s = o.prog_spec
        eta = o.prog(q, "eta")
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        return s.set(F, "u",
                     o.param_set.grav * eta[..., None, None] * _Ih(q.dtype))

    def wavespeed(self, nrm, q, aux, t):
        return self.ocean.wavespeed(nrm, q, aux, t)

    def boundary_conditions(self):
        return self.ocean.boundary_conditions()

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        return self.ocean.boundary_state(tag, nrm, q_minus, aux_minus, t)

    def boundary_state_gradient_flux(self, *args):
        return self.ocean.boundary_state_gradient_flux(*args)

    def update_auxiliary_state(self, grid, q, aux, t):
        return aux
