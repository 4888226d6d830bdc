"""Linearized acoustic(-gravity) models — the IMEX implicit operators.

Scope of reference ``src/Atmos/Model/linear.jl`` (AtmosAcousticLinearModel
:215, AtmosAcousticGravityLinearModel :249, linearized_air_pressure :18)
and ``linear_tendencies.jl`` / ``linear_atmos_tendencies.jl``: Mass ←
Advect; Momentum ← LinearPressureGradient (+ Gravity source for the
-Gravity variant, vertical direction only); Energy ← LinearEnergyFlux.

These are linear (affine-free) balance laws about the hydrostatic
reference state; run with ``direction=VERTICAL`` they form the HEVI
implicit operator, column-local by the stacked-grid invariant.
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.utils.variables import VarSpec


class AtmosLinearModel(BalanceLaw):
    """Shares prognostic/aux schemas with the parent AtmosModel (the
    reference requires the linear state to be a contiguous subset,
    linear.jl:96-107)."""

    def __init__(self, atmos):
        if not atmos.ref_state.subtract_off and atmos.num_state(st.Auxiliary()):
            pass
        self.atmos = atmos

    # schemas delegate to the full model
    def vars_state(self, state_type):
        if isinstance(state_type, (st.Gradient, st.GradientFlux,
                                   st.Hyperdiffusive)):
            return VarSpec()
        return self.atmos.vars_state(state_type)

    @property
    def param_set(self):
        return self.atmos.param_set

    def linearized_pressure(self, q, aux):
        """p_L = ρ R_d T_0 + R_d/cv_d (ρe − ρΦ) (dry; reference
        linearized_air_pressure, linear.jl:18-37)."""
        ps = self.param_set
        rho = self.atmos.prog(q, "rho")
        rhoe = self.atmos.prog(q, "rhoe")
        Phi = self.atmos.aux_get(aux, "orientation.Phi")
        return rho * ps.R_d * ps.T_0 + ps.R_d / ps.cv_d * (rhoe - rho * Phi)

    def flux_first_order(self, q, aux, t):
        a = self.atmos
        spec = a.prog_spec
        rho = a.prog(q, "rho")
        rhou = a.prog(q, "rhou")
        pL = self.linearized_pressure(q, aux)

        n = spec.num
        F = jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)
        F = spec.set(F, "rho", rhou)
        eye = jnp.eye(3, dtype=q.dtype)
        F = spec.set(F, "rhou", pL[..., None, None] * eye)
        F = spec.set(F, "rhoe", self._energy_coeff(aux)[..., None] * rhou)
        return F

    def _energy_coeff(self, aux):
        raise NotImplementedError

    def wavespeed(self, nrm, q, aux, t):
        T_ref = self.atmos.aux_get(aux, "ref_state.T")
        return td.soundspeed_air(self.param_set, T_ref) * jnp.ones(
            q.shape[:-1], dtype=q.dtype)

    def boundary_conditions(self):
        return self.atmos.boundary_conditions()

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        return self.atmos.boundary_state(tag, nrm, q_minus, aux_minus, t)

    def update_auxiliary_state(self, grid, q, aux, t):
        return aux  # linear models never touch aux (linear.jl:119-127)


class AtmosAcousticLinearModel(AtmosLinearModel):
    """Acoustic-only: energy coefficient (ρe_ref + p_ref)/ρ_ref − Φ, no
    gravity source (reference linear.jl:215)."""

    def _energy_coeff(self, aux):
        a = self.atmos
        ref_rhoe = a.aux_get(aux, "ref_state.rhoe")
        ref_p = a.aux_get(aux, "ref_state.p")
        ref_rho = a.aux_get(aux, "ref_state.rho")
        Phi = a.aux_get(aux, "orientation.Phi")
        return (ref_rhoe + ref_p) / ref_rho - Phi

    def source(self, q, gf, aux, t):
        return jnp.zeros_like(q)


class AtmosAcousticGravityLinearModel(AtmosLinearModel):
    """Acoustic + gravity: energy coefficient (ρe_ref + p_ref)/ρ_ref and
    momentum source -ρ∇Φ (reference linear.jl:249,
    linear_tendencies.jl:33-46)."""

    def _energy_coeff(self, aux):
        a = self.atmos
        ref_rhoe = a.aux_get(aux, "ref_state.rhoe")
        ref_p = a.aux_get(aux, "ref_state.p")
        ref_rho = a.aux_get(aux, "ref_state.rho")
        return (ref_rhoe + ref_p) / ref_rho

    def source(self, q, gf, aux, t):
        a = self.atmos
        rho = a.prog(q, "rho")
        grad_Phi = a.aux_get(aux, "orientation.grad_Phi")
        out = jnp.zeros_like(q)
        sl = a.prog_spec.index("rhou")
        return out.at[..., sl].add(-rho[..., None] * grad_Phi)
