"""Implicit vertical diffusion / convective adjustment (IVDC).

Scope of reference ``src/Ocean/SplitExplicit01/IVDCModel.jl``: a linear
balance law for the operator L(θ) = θ/Δt − ∂z(κ ∂zθ) with the
convective-adjustment diffusivity chosen by the *pre-step* stratification
(κ = κᶜ where ∂θⁿ/∂z < 0, else κᶻ/2; reference diffusivity_tensor :95),
solved iteratively each step so the fast convective diffusivity imposes
no explicit-CFL restriction.  The reference drives it with
BatchedGeneralizedMinimalResidual; here the operator (vertical-direction
DG, column-local by the stacked-grid invariant) is applied to the whole
grid at once and solved matrix-free with restarted GMRES — every column
converges in the shared Krylov space, and the per-iteration work is the
same fused einsum RHS as the rest of the framework.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.solvers.iterative import gmres
from climatemachine_tpu.utils.variables import VarSpec


class IVDCModel(BalanceLaw):
    """Operator balance law (reference IVDCModel.jl:27): prognostic θ,
    aux carries the frozen per-node vertical diffusivity κ; RHS evaluates
    L(θ) = θ/Δt − ∂z(κ ∂zθ) with insulating (zero-flux) boundaries."""

    def __init__(self, kappa_z: float, kappa_c: float, dt: float):
        self.kappa_z, self.kappa_c, self.dt = kappa_z, kappa_c, dt
        self.prog_spec = VarSpec(theta=1)
        self.aux_spec = VarSpec(coord=3, kappa=1)
        self.grad_spec = VarSpec(theta=1)
        self.gf_spec = VarSpec(kappa_dz_theta=3)

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

    def init_state_prognostic(self, coords, aux, t):
        return jnp.zeros(coords.shape[:-1] + (1,), dtype=coords.dtype)

    def compute_gradient_argument(self, q, aux, t):
        return q

    def compute_gradient_flux(self, grad_g, q, aux, t):
        kap = self.aux_spec.get(aux, "kappa")
        # vertical component only (reference diffusivity_tensor: diagonal
        # (0, 0, κ)); sign makes the DG functor evaluate −∂z(κ∂zθ)
        out = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype)
        return out.at[..., 2].set(kap * grad_g[..., 2, 0])

    def flux_second_order(self, q, gf, hyper, aux, t):
        # F₂ = κ∇θ (vertical) so the DG tendency −∇·F₂ + S gives L(θ)
        return gf[..., :, None]

    def source(self, q, gf, aux, t):
        return q / self.dt

    def wavespeed(self, nrm, q, aux, t):
        return jnp.zeros(q.shape[:-1], dtype=q.dtype)

    def boundary_conditions(self) -> Tuple:
        return (1, 2)

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        return q_minus, aux_minus

    def boundary_state_gradient_flux(self, tag, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        # insulating: reflect so the central flux vanishes
        return -gf_minus


def ivdc_coefficients(model, dg_hb, q, aux):
    """Frozen diffusivity field from the pre-step stratification
    (reference IVDCModel.jl:95: κᶜ where ∂θ/∂z<0, else κᶻ/2)."""
    theta = model.prog(q, "theta")
    dth = dg_hb.dg_gradient_of(theta[..., None], direction="vertical")
    dthdz = dth[..., 2, 0]
    return jnp.where(dthdz < 0, model.kappa_c, 0.5 * model.kappa_z)


def ivdc_solve(model, dg_hb, q, aux, dt, n_krylov: int = 24,
               restarts: int = 2):
    """One backward-Euler implicit vertical diffusion/convection step on
    the temperature of a hydrostatic Boussinesq state (reference
    SplitExplicit01 implicit step): solve L θⁿ⁺¹ = θⁿ/Δt, return the
    state with θ replaced."""
    from climatemachine_tpu.dg.spatial import DGModel, init_state_auxiliary

    kap = ivdc_coefficients(model, dg_hb, q, aux)
    ivdc = IVDCModel(model.kappa_z, model.kappa_c, dt)
    dg_op = DGModel(ivdc, dg_hb.grid, direction="vertical")
    aux_op = init_state_auxiliary(ivdc, dg_hb.grid)
    aux_op = ivdc.aux_spec.set(aux_op, "kappa", kap)

    theta_n = model.prog(q, "theta")[..., None]

    def L(x):
        tend, _ = dg_op(x.reshape(theta_n.shape), aux_op, 0.0)
        return tend.reshape(x.shape)

    rhs = theta_n / dt
    sol, _res = gmres(L, rhs.reshape(-1), n_krylov=n_krylov,
                      restarts=restarts)
    theta_new = sol.reshape(theta_n.shape)[..., 0]
    return model.prog_spec.set(q, "theta", theta_new)
