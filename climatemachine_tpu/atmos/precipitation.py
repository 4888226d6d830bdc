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


@dataclass
class RainSnowModel(NoPrecipitation):
    """Cold-rain 1-moment: prognostic ρq_rai AND ρq_sno, each advected
    and sedimenting along −k̂ (reference precipitation.jl:92
    RainSnowModel).  Terminal velocities are mass-weighted power laws
    (simplified Marshall-Palmer; snow falls slower than rain)."""
    v0_rai: float = 14.0
    q_exp_rai: float = 0.125
    v0_sno: float = 2.5
    q_exp_sno: float = 0.0625

    def vars_prognostic(self) -> VarSpec:
        return VarSpec(rhoq_rai=1, rhoq_sno=1)

    def terminal_velocity_rain(self, q_rai):
        return self.v0_rai * jnp.maximum(q_rai, 0.0) ** self.q_exp_rai

    def terminal_velocity_snow(self, q_sno):
        return self.v0_sno * jnp.maximum(q_sno, 0.0) ** self.q_exp_sno

    def flux_first_order(self, model, q, aux, F, u):
        s = model.prog_spec
        k = model.aux_get(aux, "orientation.grad_Phi") / model.param_set.grav
        rho = s.get(q, "rho")
        rq = s.get(q, "precipitation.rhoq_rai")
        vt = self.terminal_velocity_rain(rq / rho)
        F = s.set(F, "precipitation.rhoq_rai",
                  rq[..., None] * (u - vt[..., None] * k))
        sq = s.get(q, "precipitation.rhoq_sno")
        vs = self.terminal_velocity_snow(sq / rho)
        F = s.set(F, "precipitation.rhoq_sno",
                  sq[..., None] * (u - vs[..., None] * k))
        return F


@dataclass
class RainSnow1M(Source):
    """Cold-rain 1-moment process set (reference multiphysics_types.jl:146
    RainSnow_1M / rain_snow_sources :158): rain & snow autoconversion,
    cloud liquid/ice accretion by rain and snow (with the freeze/melt
    temperature branches), ice-rain accretion rain sink (freezing),
    rain<->snow accretion, rain evaporation, snow
    sublimation/deposition, and snow melt — with the reference's energy
    bookkeeping.  Rates are simplified Kessler/Lin-type power laws in
    place of CloudMicrophysics.jl's Marshall-Palmer integrals."""
    tau_acnv_rai: float = 1000.0
    q_liq_threshold: float = 5e-4
    tau_acnv_sno: float = 1000.0
    q_ice_threshold: float = 1e-4
    accr_coeff: float = 2.2
    evap_coeff: float = 1e-3
    subl_coeff: float = 5e-4
    melt_coeff: float = 5e-5

    def contributions(self, model, q, gf, aux, t):
        ps = model.param_set
        s = model.prog_spec
        rho = model.prog(q, "rho")
        T, p, u, pp = model.thermo_full(q, aux)
        if pp is None:
            return {}
        q_rai = jnp.maximum(s.get(q, "precipitation.rhoq_rai") / rho, 0.0)
        q_sno = jnp.maximum(s.get(q, "precipitation.rhoq_sno") / rho, 0.0)

        I_l = ps.cv_l * (T - ps.T_0)
        I_i = ps.cv_i * (T - ps.T_0) - ps.e_int_i0
        L_f = td.latent_heat_fusion(ps, T)
        Phi = model.aux_get(aux, "orientation.Phi")
        freezing = T < ps.T_freeze

        S_qr = jnp.zeros_like(rho)
        S_qs = jnp.zeros_like(rho)
        S_e = jnp.zeros_like(rho)

        # autoconversion liq->rain, ice->snow
        acnv_r = jnp.maximum(pp.liq - self.q_liq_threshold, 0.0) \
            / self.tau_acnv_rai
        S_qr += acnv_r
        S_e -= acnv_r * (I_l + Phi)
        acnv_s = jnp.maximum(pp.ice - self.q_ice_threshold, 0.0) \
            / self.tau_acnv_sno
        S_qs += acnv_s
        S_e -= acnv_s * (I_i + Phi)

        # accretion: cloud liquid by rain; cloud ice by snow
        accr_lr = self.accr_coeff * pp.liq * q_rai ** 0.875
        S_qr += accr_lr
        S_e -= accr_lr * (I_l + Phi)
        accr_is = self.accr_coeff * pp.ice * q_sno ** 0.875
        S_qs += accr_is
        S_e -= accr_is * (I_i + Phi)

        # cloud liquid by snow: freezes below T_freeze, else melts to rain
        accr_ls = self.accr_coeff * pp.liq * q_sno ** 0.875
        alpha = ps.cv_l / L_f * (T - ps.T_freeze)
        S_qs += jnp.where(freezing, accr_ls, -accr_ls * alpha)
        S_qr += jnp.where(freezing, 0.0, accr_ls * (1 + alpha))
        S_e -= jnp.where(freezing, accr_ls * (I_i + Phi),
                         accr_ls * ((1 + alpha) * I_l - alpha * I_i + Phi))

        # cloud ice by rain: rain freezes into snow
        accr_ir = self.accr_coeff * pp.ice * q_rai ** 0.875
        sink_r = self.accr_coeff * q_rai * pp.ice ** 0.875
        S_qs += accr_ir + sink_r
        S_qr -= sink_r
        S_e -= accr_ir * (I_i + Phi) - sink_r * L_f

        # rain-snow accretion: below freezing rain->snow, above snow->rain
        accr_rs = self.accr_coeff * q_rai * q_sno
        S_qs += jnp.where(freezing, accr_rs, -accr_rs)
        S_qr -= jnp.where(freezing, accr_rs, -accr_rs)
        S_e += jnp.where(freezing, accr_rs * L_f, -accr_rs * L_f)

        # rain evaporation / snow sublimation(deposition) in subsat air
        q_sat = td.q_vap_saturation(ps, T, rho)
        subsat = 1.0 - pp.vap / q_sat
        evap = -self.evap_coeff * jnp.maximum(subsat, 0.0) * q_rai ** 0.65
        S_qr += evap
        S_e -= evap * (I_l + Phi)
        subl = -self.subl_coeff * subsat * q_sno ** 0.65
        S_qs += subl
        S_e -= subl * (I_i + Phi)

        # snow melt above freezing
        melt = jnp.where(freezing, 0.0,
                         self.melt_coeff * q_sno ** 0.65
                         * (T - ps.T_freeze))
        S_qs -= melt
        S_qr += melt
        S_e -= melt * L_f

        S_qt = -S_qr - S_qs
        return {
            "precipitation.rhoq_rai": rho * S_qr,
            "precipitation.rhoq_sno": rho * S_qs,
            "moisture.rhoq_tot": rho * S_qt,
            "rho": rho * S_qt,
            "rhoe": rho * S_e,
        }
