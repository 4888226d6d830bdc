"""Soil hydraulics parameterizations.

Scope of reference ``src/Land/Model/SoilWaterParameterizations.jl``:
vanGenuchten (:88), BrooksCorey (:144), hydraulic_conductivity (:490),
effective_saturation (:543), pressure_head (:568), matric_potential
(:595/:624) — vectorized closed forms.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class vanGenuchten:
    """(reference :88) α [1/m], n; m = 1 - 1/n."""
    alpha: float = 2.6
    n: float = 2.0

    @property
    def m(self):
        return 1.0 - 1.0 / self.n

    def matric_potential(self, S_l):
        S = jnp.clip(S_l, 1e-4, 1.0)
        return -((S ** (-1.0 / self.m) - 1.0) ** (1.0 / self.n)) / self.alpha

    def moisture_factor(self, S_l):
        """Mualem-van Genuchten relative conductivity."""
        S = jnp.clip(S_l, 0.0, 1.0)
        f = jnp.sqrt(S) * (1 - (1 - S ** (1.0 / self.m)) ** self.m) ** 2
        return jnp.where(S_l >= 1.0, 1.0, f)

    def inverse_matric_potential(self, psi):
        """S_l(ψ) (reference inverse_matric_potential, :648)."""
        return (1.0 + (self.alpha * jnp.abs(psi)) ** self.n) ** (-self.m)


@dataclass(frozen=True)
class BrooksCorey:
    """(reference :144) ψb [m], m."""
    psi_b: float = 0.1656
    m_exp: float = 0.5

    def matric_potential(self, S_l):
        S = jnp.clip(S_l, 1e-4, 1.0)
        return -self.psi_b * S ** (-self.m_exp)

    def moisture_factor(self, S_l):
        S = jnp.clip(S_l, 0.0, 1.0)
        f = S ** (2 * self.m_exp + 3)
        return jnp.where(S_l >= 1.0, 1.0, f)


@dataclass(frozen=True)
class SoilParams:
    """Bulk soil properties (reference soil_model.jl SoilParamFunctions +
    SoilHeatParameterizations.jl constants)."""
    porosity: float = 0.4
    Ksat: float = 1e-5          # m/s saturated conductivity
    S_s: float = 1e-3           # 1/m specific storage
    theta_r: float = 0.08       # residual water fraction
    # heat
    rho_c_soil: float = 2.0e6   # J/(K m^3) dry volumetric heat capacity
    kappa_soil: float = 1.5     # W/(m K) thermal conductivity (constant mode)
    # freeze/thaw + moisture-dependent thermal properties
    rho_liq: float = 1e3        # kg/m^3
    rho_ice: float = 917.0      # kg/m^3
    c_liq: float = 4181.0       # J/(kg K)
    c_ice: float = 2100.0       # J/(kg K)
    LH_f0: float = 3.34e5       # J/kg latent heat of fusion
    T_freeze: float = 273.15    # K
    kappa_dry: float = 0.25           # W/(m K)
    kappa_sat_unfrozen: float = 2.0   # W/(m K)
    kappa_sat_frozen: float = 3.0     # W/(m K)


def effective_saturation(porosity, vartheta_l, theta_r):
    """(reference :543)"""
    return (vartheta_l - theta_r) / (porosity - theta_r)


def pressure_head(hydraulics, porosity, S_s, theta_r, vartheta_l, theta_i):
    """Saturated/unsaturated pressure head (reference :568)."""
    eff_porosity = porosity - theta_i
    S_l = effective_saturation(porosity, vartheta_l, theta_r)
    psi_unsat = hydraulics.matric_potential(S_l)
    psi_sat = (vartheta_l - eff_porosity) / S_s
    return jnp.where(vartheta_l < eff_porosity, psi_unsat, psi_sat)


def hydraulic_conductivity(Ksat, hydraulics, S_l, impedance=1.0,
                           viscosity=1.0):
    """(reference :490) K = Ksat · impedance · viscosity · moisture."""
    return Ksat * impedance * viscosity * hydraulics.moisture_factor(S_l)


# --- heat parameterizations (reference SoilHeatParameterizations.jl) --------

def volumetric_heat_capacity(p: SoilParams, theta_l, theta_i):
    """ρc_s = ρc_ds + θ_l ρ_l c_l + θ_i ρ_i c_i (reference :64)."""
    return (p.rho_c_soil + theta_l * p.rho_liq * p.c_liq
            + theta_i * p.rho_ice * p.c_ice)


def temperature_from_rho_e_int(p: SoilParams, rho_e_int, theta_i, rho_c_s,
                               T_ref):
    """T = T_ref + (ρe_int + θ_i ρ_i L_f)/ρc_s (reference :41)."""
    return T_ref + (rho_e_int + theta_i * p.rho_ice * p.LH_f0) / rho_c_s


def volumetric_internal_energy(p: SoilParams, T, theta_i, rho_c_s, T_ref):
    """Inverse of :func:`temperature_from_rho_e_int` (reference :90)."""
    return rho_c_s * (T - T_ref) - theta_i * p.rho_ice * p.LH_f0


def relative_saturation(theta_l, theta_i, porosity):
    """(θ_l + θ_i)/ν (reference :138)."""
    return (theta_l + theta_i) / porosity


def thermal_conductivity(p: SoilParams, theta_l, theta_i):
    """κ = κ_dry + K_e (κ_sat − κ_dry) with the relative saturation as
    the (simplified) Kersten number and the frozen/unfrozen κ_sat blend
    (reference :113/:184; the quartz/organic Kersten fit is collapsed to
    K_e = S_r)."""
    S_r = jnp.clip(relative_saturation(theta_l, theta_i, p.porosity),
                   0.0, 1.0)
    frac_i = theta_i / jnp.maximum(theta_l + theta_i, 1e-10)
    kappa_sat = (p.kappa_sat_unfrozen ** (1.0 - frac_i)
                 * p.kappa_sat_frozen ** frac_i)
    return p.kappa_dry + S_r * (kappa_sat - p.kappa_dry)
