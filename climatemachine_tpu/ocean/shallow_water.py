"""2-D barotropic shallow-water model.

Scope of reference ``src/Ocean/ShallowWater/ShallowWaterModel.jl``
(ShallowWaterModel :63: prognostic η, U(2); flux gHη I_h + U⊗U/H;
source -f×U + wind stress + linear drag; turbulence LinearDrag or
ConstantViscosity).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.ocean import core as oc
from climatemachine_tpu.physics.parameters import EARTH, PlanetParameterSet
from climatemachine_tpu.utils.variables import VarSpec


@dataclass
class LinearDrag:
    lam: float


@dataclass
class ConstantViscosity:
    nu: float


class ShallowWaterModel(BalanceLaw):
    """(reference ShallowWaterModel.jl:63)"""

    def __init__(self, problem, param_set: PlanetParameterSet = EARTH,
                 turbulence=None, advection="nonlinear", c=0.0,
                 coupling=None, f_o=1e-4, beta=1e-11):
        self.problem = problem
        self.param_set = param_set
        self.turbulence = turbulence or ConstantViscosity(0.0)
        self.advection = advection
        self.c = c
        self.coupling = coupling or oc.Uncoupled()
        # beta-plane parameters consumed by problem.coriolis_parameter
        # (reference ShallowWaterModel.jl fields fo/beta, simple_box
        # coriolis_parameter m.fo + m.beta*y)
        self.f_o, self.beta = f_o, beta

        self.ncoord = 2                      # 2-D barotropic model
        self.prog_spec = VarSpec(eta=1, U=2)
        self.aux_spec = VarSpec(coord=2, y=1, GU=2, du=2)
        visc = isinstance(self.turbulence, ConstantViscosity)
        self.grad_spec = VarSpec(U=2) if visc else VarSpec()
        self.gf_spec = VarSpec(nu_grad_U=(2, 2)) if visc else VarSpec()

    def vars_state(self, state_type) -> VarSpec:
        if isinstance(state_type, st.Prognostic):
            return self.prog_spec
        if isinstance(state_type, st.Auxiliary):
            return self.aux_spec
        if isinstance(state_type, st.Gradient):
            return self.grad_spec
        if isinstance(state_type, st.GradientFlux):
            return self.gf_spec
        return VarSpec()

    def prog(self, q, name):
        return self.prog_spec.get(q, name)

    def aux_get(self, aux, name):
        return self.aux_spec.get(aux, name)

    def nodal_init_state_auxiliary(self, geom, aux):
        coords = geom["coords"]
        aux = self.aux_spec.set(aux, "y", coords[..., 1])
        if hasattr(self.problem, "init_aux"):
            aux = self.problem.init_aux(self, coords, aux)
        return aux

    def init_state_prognostic(self, coords, aux, t):
        return self.problem.init_state(self, coords, aux, t)

    def flux_first_order(self, q, aux, t):
        ps = self.param_set
        s = self.prog_spec
        eta = self.prog(q, "eta")
        U = self.prog(q, "U")
        H = self.problem.H
        F = jnp.zeros(q.shape[:-1] + (2, s.num), dtype=q.dtype)
        F = s.set(F, "eta", U)
        eye = jnp.eye(2, dtype=q.dtype)
        FU = ps.grav * H * eta[..., None, None] * eye
        if self.advection == "nonlinear":
            FU = FU + U[..., :, None] * U[..., None, :] / H
        return s.set(F, "U", FU)

    def compute_gradient_argument(self, q, aux, t):
        out = jnp.zeros(q.shape[:-1] + (self.grad_spec.num,), dtype=q.dtype)
        return self.grad_spec.set(out, "U", self.prog(q, "U"))

    def compute_gradient_flux(self, grad_g, q, aux, t):
        grad_U = grad_g[..., :, self.grad_spec.index("U")]
        out = jnp.zeros(q.shape[:-1] + (self.gf_spec.num,), dtype=q.dtype)
        return self.gf_spec.set(out, "nu_grad_U",
                                -self.turbulence.nu * grad_U)

    def flux_second_order(self, q, gf, hyper, aux, t):
        s = self.prog_spec
        F = jnp.zeros(q.shape[:-1] + (2, s.num), dtype=q.dtype)
        return s.set(F, "U", self.gf_spec.get(gf, "nu_grad_U"))

    def source(self, q, gf, aux, t):
        s = self.prog_spec
        out = jnp.zeros_like(q)
        U = self.prog(q, "U")
        y = self.aux_get(aux, "y")
        f = self.problem.coriolis_parameter(self, y)
        su = jnp.stack([f * U[..., 1], -f * U[..., 0]], axis=-1)
        if hasattr(self.problem, "kinematic_stress"):
            su = su + self.problem.kinematic_stress(y)
        if isinstance(self.turbulence, LinearDrag):
            su = su - self.turbulence.lam * U
        return s.set(out, "U", su)

    def wavespeed(self, nrm, q, aux, t):
        return jnp.full(q.shape[:-1], self.c, dtype=q.dtype)

    def boundary_conditions(self):
        return self.problem.boundary_conditions

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        bc = self.problem.boundary_conditions[tag - 1]
        UM = self.prog(q_minus, "U")
        UP = oc.velocity_ghost(bc.velocity, nrm[..., :2], UM)
        return self.prog_spec.set(q_minus, "U", UP), aux_minus

    def boundary_state_gradient_flux(self, tag, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        bc = self.problem.boundary_conditions[tag - 1]
        if self.gf_spec.num and isinstance(bc.velocity.drag, oc.FreeSlip):
            return self.gf_spec.set(
                gf_minus, "nu_grad_U",
                -self.gf_spec.get(gf_minus, "nu_grad_U"))
        return gf_minus
