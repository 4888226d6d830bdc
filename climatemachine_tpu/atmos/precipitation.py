"""Precipitation models and microphysics sources.

Scope of reference ``src/Atmos/Model/precipitation.jl``
(NoPrecipitation :38, RainModel :58, RainSnowModel :92) and
``multiphysics_types.jl`` (RemovePrecipitation :40, WarmRain_1M :88),
re-providing the needed CloudMicrophysics.jl subset (0-moment removal,
warm-rain 1-moment Kessler-type processes, rain terminal velocity).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from climatemachine_tpu.atmos.sources import Source
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.utils.variables import VarSpec


class NoPrecipitation:
    def vars_prognostic(self) -> VarSpec:
        return VarSpec()


@dataclass
class RainModel(NoPrecipitation):
    """Warm-rain 1-moment: prognostic ρq_rai with sedimentation
    (reference precipitation.jl:58; CloudMicrophysics 1M)."""
    # terminal velocity v = v0 * (q_rai)^(1/8)-type power law (simplified
    # mass-weighted Marshall-Palmer)
    v0: float = 14.0
    q_exp: float = 0.125

    def vars_prognostic(self) -> VarSpec:
        return VarSpec(rhoq_rai=1)

    def terminal_velocity(self, q_rai):
        return self.v0 * jnp.maximum(q_rai, 0.0) ** self.q_exp

    def flux_first_order(self, model, q, aux, F, u):
        """Advection + sedimentation along -k̂."""
        s = model.prog_spec
        rq = s.get(q, "precipitation.rhoq_rai")
        k = model.aux_get(aux, "orientation.grad_Phi") / model.param_set.grav
        rho = s.get(q, "rho")
        vt = self.terminal_velocity(rq / rho)
        vel = u - vt[..., None] * k
        return s.set(F, "precipitation.rhoq_rai", rq[..., None] * vel)


@dataclass
class RemovePrecipitation(Source):
    """0-moment: condensate above threshold is removed on timescale τ
    with the matching internal-energy sink (reference
    multiphysics_types.jl:40; CloudMicrophysics remove_precipitation)."""
    tau: float = 1000.0
    qc_0: float = 5e-4

    def contributions(self, model, q, gf, aux, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        T, p, u, pp = model.thermo_full(q, aux)
        if pp is None:
            return {}
        q_cond = pp.liq + pp.ice
        S_qt = -rho * jnp.maximum(q_cond - self.qc_0, 0.0) / self.tau
        lam = td.liquid_fraction(ps, T)
        I_l = ps.cv_l * (T - ps.T_0)
        I_i = ps.cv_i * (T - ps.T_0) - ps.e_int_i0
        Phi = model.aux_get(aux, "orientation.Phi")
        S_e = S_qt * (lam * I_l + (1 - lam) * I_i + Phi)
        out = {"moisture.rhoq_tot": S_qt, "rhoe": S_e, "rho": S_qt}
        return out


@dataclass
class WarmRain1M(Source):
    """Kessler-type warm-rain processes: autoconversion, accretion, rain
    evaporation (reference multiphysics_types.jl:88 WarmRain_1M;
    CloudMicrophysics 1-moment)."""
    tau_acnv: float = 1000.0
    q_liq_threshold: float = 5e-4
    accr_coeff: float = 2.2          # Kessler k2
    evap_coeff: float = 1e-3

    def contributions(self, model, q, gf, aux, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        T, p, u, pp = model.thermo_full(q, aux)
        if pp is None:
            return {}
        s = model.prog_spec
        q_rai = jnp.maximum(s.get(q, "precipitation.rhoq_rai") / rho, 0.0)

        # autoconversion + accretion (cloud liquid -> rain)
        acnv = jnp.maximum(pp.liq - self.q_liq_threshold, 0.0) / self.tau_acnv
        accr = self.accr_coeff * pp.liq * q_rai ** 0.875
        # rain evaporation in subsaturated air
        q_sat = td.q_vap_saturation(ps, T, rho)
        subsat = jnp.maximum(1.0 - pp.vap / q_sat, 0.0)
        evap = self.evap_coeff * subsat * q_rai ** 0.65

        dq_rain = acnv + accr - evap           # gain of rain
        Phi = model.aux_get(aux, "orientation.Phi")
        I_l = ps.cv_l * (T - ps.T_0)
        return {
            "precipitation.rhoq_rai": rho * dq_rain,
            "moisture.rhoq_tot": -rho * dq_rain,
            "rho": -rho * dq_rain,
            "rhoe": -rho * dq_rain * (I_l + Phi),
        }
