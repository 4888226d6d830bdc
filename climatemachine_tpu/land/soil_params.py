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
    """Bulk soil properties (reference soil_model.jl SoilParamFunctions)."""
    porosity: float = 0.4
    Ksat: float = 1e-5          # m/s saturated conductivity
    S_s: float = 1e-3           # 1/m specific storage
    theta_r: float = 0.08       # residual water fraction
    # heat
    rho_c_soil: float = 2.0e6   # J/(K m^3) dry volumetric heat capacity
    kappa_soil: float = 1.5     # W/(m K) thermal conductivity


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
