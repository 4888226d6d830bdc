"""Moisture models: dry, equilibrium (saturation-adjusted), non-equilibrium.

Scope of reference ``src/Atmos/Model/moisture.jl`` (DryModel :54,
EquilMoist :75, NonEquilMoist :126) and ``tendencies_moisture.jl``
(Advect :9, MoistureDiffusion :31).

TPU-first: the saturation adjustment runs once per RHS in the nodal aux
update (fixed-iteration Newton, fully fused) and the adjusted temperature
is cached in aux (the reference does the same via
atmos_nodal_update_auxiliary_state!, moisture.jl:87-102); flux/wavespeed
evaluations reuse the cached temperature.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.utils.variables import VarSpec


class MoistureModel:
    def vars_prognostic(self) -> VarSpec:
        return VarSpec()

    def vars_aux(self) -> VarSpec:
        return VarSpec()

    def vars_gradient(self) -> VarSpec:
        return VarSpec()

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec()

    def update_aux(self, model, q, aux, t):
        return aux

    def thermo(self, model, q, aux):
        """(T, p, q_pp or None) from conserved state + cached aux."""
        raise NotImplementedError

    def gradient_argument(self, model, q, aux, t, out):
        return out

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        return out

    def flux_second_order(self, model, q, gf, aux, D_t, F):
        return F


class DryModel(MoistureModel):
    """Dry limit (reference moisture.jl:54); aux caches θ_v and T for the
    SGS closures (vars_state(::DryModel, Auxiliary) = θ_v, air_T)."""

    def vars_aux(self) -> VarSpec:
        return VarSpec(theta_v=1, air_T=1)

    def update_aux(self, model, q, aux, t):
        ps = model.param_set
        T, p, _ = self._compute(model, q, aux)
        theta_v = T * (ps.MSLP / p) ** ps.kappa_d
        aux = model.aux_spec.set(aux, "moisture.air_T", T)
        return model.aux_spec.set(aux, "moisture.theta_v", theta_v)

    def _compute(self, model, q, aux):
        ps = model.param_set
        rho = model.prog(q, "rho")
        if model.physics.energy.is_theta:
            T, p = model.physics.energy.thermo_dry(
                ps, rho, model.prog(q, "rhoe"))
            return T, p, None
        rhou = model.prog(q, "rhou")
        rhoe = model.prog(q, "rhoe")
        Phi = model.aux_get(aux, "orientation.Phi")
        e_int = td.internal_energy_from_state(rho, rhoe, rhou, Phi)
        T = td.air_temperature(ps, e_int)
        if model.physics.compressibility.is_anelastic:
            # PhaseDry_pe: thermodynamic state from (p_ref, e_int)
            # (reference thermo_states_anelastic.jl:46-57)
            return T, model.aux_get(aux, "ref_state.p"), None
        return T, td.air_pressure(ps, T, rho), None

    def thermo(self, model, q, aux):
        return self._compute(model, q, aux)


@dataclass
class EquilMoist(MoistureModel):
    """Equilibrium moisture via saturation adjustment (reference
    moisture.jl:75-123): prognostic ρq_tot; aux caches (T, θ_v, q_liq,
    q_ice)."""
    maxiter: int = 6

    def vars_prognostic(self) -> VarSpec:
        return VarSpec(rhoq_tot=1)

    def vars_aux(self) -> VarSpec:
        return VarSpec(temperature=1, theta_v=1, q_liq=1, q_ice=1)

    def vars_gradient(self) -> VarSpec:
        return VarSpec(q_tot=1)

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec(d_q_tot=3)

    def update_aux(self, model, q, aux, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        rhoe = model.prog(q, "rhoe")
        q_tot = model.prog(q, "moisture.rhoq_tot") / rho
        Phi = model.aux_get(aux, "orientation.Phi")
        e_int = td.internal_energy_from_state(rho, rhoe, rhou, Phi)
        T = td.saturation_adjustment(ps, e_int, rho, q_tot,
                                     n_iter=self.maxiter)
        pp = td.phase_partition_equil(ps, T, rho, q_tot)
        # Anelastic1D: thermodynamic pressure is the reference pressure
        # (reference thermo_states_anelastic.jl:59-78 PhaseEquil_peq; the
        # adjustment itself runs at rho = rho_ref, a documented
        # approximation of the fixed-p solve)
        if model.physics.compressibility.is_anelastic:
            p = model.aux_get(aux, "ref_state.p")
        else:
            p = td.air_pressure(ps, T, rho, pp)
        theta_v = td.virtual_temperature(ps, T, pp) * \
            (ps.MSLP / p) ** ps.kappa_d
        s = model.aux_spec
        aux = s.set(aux, "moisture.temperature", T)
        aux = s.set(aux, "moisture.theta_v", theta_v)
        aux = s.set(aux, "moisture.q_liq", pp.liq)
        aux = s.set(aux, "moisture.q_ice", pp.ice)
        return aux

    def thermo(self, model, q, aux):
        ps = model.param_set
        rho = model.prog(q, "rho")
        q_tot = model.prog(q, "moisture.rhoq_tot") / rho
        T = model.aux_get(aux, "moisture.temperature")
        pp = td.phase_partition_equil(ps, T, rho, q_tot)
        if model.physics.compressibility.is_anelastic:
            return T, model.aux_get(aux, "ref_state.p"), pp
        return T, td.air_pressure(ps, T, rho, pp), pp

    def gradient_argument(self, model, q, aux, t, out):
        rho = model.prog(q, "rho")
        q_tot = model.prog(q, "moisture.rhoq_tot") / rho
        return model.grad_spec.set(out, "moisture.q_tot", q_tot)

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        sl = model.grad_spec.index("moisture.q_tot")
        return model.gf_spec.set(out, "moisture.d_q_tot",
                                 grad_g[..., :, sl.start])

    def flux_second_order(self, model, q, gf, aux, D_t, F):
        """-ρ D_t ∇q_tot into ρq_tot AND ρ (total-water mass/momentum
        coupling, reference tendencies_moisture.jl:31 + mass/momentum
        MoistureDiffusion)."""
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        d_q = model.gf_spec.get(gf, "moisture.d_q_tot")    # [..., 3]
        f_q = -rho[..., None] * D_t * d_q
        s = model.prog_spec
        F = s.set(F, "moisture.rhoq_tot",
                  s.get(F, "moisture.rhoq_tot") + f_q)
        F = s.set(F, "rho", s.get(F, "rho") + f_q)
        Fm = s.get(F, "rhou") + f_q[..., :, None] * (rhou / rho[..., None])[..., None, :]
        F = s.set(F, "rhou", Fm)
        return F


class NonEquilMoist(MoistureModel):
    """Prognostic q_tot, q_liq, q_ice (reference moisture.jl:126); phase
    changes relax toward equilibrium with a fixed timescale source."""

    tau_cond: float = 10.0

    def vars_prognostic(self) -> VarSpec:
        return VarSpec(rhoq_tot=1, rhoq_liq=1, rhoq_ice=1)

    def vars_aux(self) -> VarSpec:
        return VarSpec(temperature=1, theta_v=1)

    def _phase(self, model, q):
        rho = model.prog(q, "rho")
        return td.PhasePartition(
            model.prog(q, "moisture.rhoq_tot") / rho,
            model.prog(q, "moisture.rhoq_liq") / rho,
            model.prog(q, "moisture.rhoq_ice") / rho)

    def update_aux(self, model, q, aux, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        rhoe = model.prog(q, "rhoe")
        Phi = model.aux_get(aux, "orientation.Phi")
        pp = self._phase(model, q)
        e_int = td.internal_energy_from_state(rho, rhoe, rhou, Phi)
        T = td.air_temperature(ps, e_int, pp)
        p = td.air_pressure(ps, T, rho, pp)
        theta_v = td.virtual_temperature(ps, T, pp) * \
            (ps.MSLP / p) ** ps.kappa_d
        aux = model.aux_spec.set(aux, "moisture.temperature", T)
        return model.aux_spec.set(aux, "moisture.theta_v", theta_v)

    def thermo(self, model, q, aux):
        ps = model.param_set
        rho = model.prog(q, "rho")
        pp = self._phase(model, q)
        T = model.aux_get(aux, "moisture.temperature")
        return T, td.air_pressure(ps, T, rho, pp), pp
