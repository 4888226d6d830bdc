"""Analytic virtual-temperature / pressure profiles for hydrostatic
reference states.

Re-provision of Thermodynamics.jl's ``TemperatureProfiles`` submodule (a
de-facto component of the reference; re-exported at
``src/Atmos/TemperatureProfiles/TemperatureProfiles.jl`` and consumed by
``src/Atmos/Model/ref_state.jl:77-80``).  Each profile maps altitude z to
``(T_virt, p)`` in closed form (the pair satisfies hydrostatic balance
dp/dz = -g p / (R_d T_virt) analytically), vectorized over z arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

from climatemachine_tpu.physics.parameters import PlanetParameterSet


class TemperatureProfile:
    def __call__(self, ps: PlanetParameterSet, z) -> Tuple:
        raise NotImplementedError


@dataclass(frozen=True)
class DecayingTemperatureProfile(TemperatureProfile):
    """T_virt decays from T_virt_surf to T_min_ref on scale height H_t."""
    T_virt_surf: float = 290.0
    T_min_ref: float = 220.0
    H_t: Optional[float] = None   # default: R_d T_virt_surf / g

    def __call__(self, ps: PlanetParameterSet, z):
        R_d, grav, p_sfc = ps.R_d, ps.grav, ps.MSLP
        H_sfc = R_d * self.T_virt_surf / grav
        H_t = self.H_t if self.H_t is not None else H_sfc
        zp = z / H_t
        tanh_zp = jnp.tanh(zp)
        dTv = self.T_virt_surf - self.T_min_ref
        Tv = self.T_virt_surf - dTv * tanh_zp
        dTvp = dTv / self.T_virt_surf
        lp = -H_t * (zp + dTvp * (jnp.log(1 - dTvp * tanh_zp)
                                  - jnp.log(1 + tanh_zp) + zp))
        lp = lp / (H_sfc * (1 - dTvp ** 2))
        return Tv, p_sfc * jnp.exp(lp)


@dataclass(frozen=True)
class IsothermalProfile(TemperatureProfile):
    T_virt: float = 290.0

    def __call__(self, ps: PlanetParameterSet, z):
        T = jnp.full_like(jnp.asarray(z, dtype=jnp.result_type(z, float)),
                          self.T_virt)
        p = ps.MSLP * jnp.exp(-z * ps.grav / (ps.R_d * self.T_virt))
        return T, p


@dataclass(frozen=True)
class DryAdiabaticProfile(TemperatureProfile):
    """Dry-adiabatic lapse up to T_min_ref, isothermal above."""
    T_surface: float = 290.0
    T_min_ref: float = 220.0

    def __call__(self, ps: PlanetParameterSet, z):
        R_d, cp_d, grav, p_sfc = ps.R_d, ps.cp_d, ps.grav, ps.MSLP
        lapse = grav / cp_d
        T = jnp.maximum(self.T_surface - lapse * z, self.T_min_ref)
        # altitude of the isothermal transition
        z_t = (self.T_surface - self.T_min_ref) / lapse
        p_ad = p_sfc * jnp.maximum(1 - lapse * jnp.minimum(z, z_t)
                                   / self.T_surface, 1e-12) ** (cp_d / R_d)
        p_t = p_sfc * (self.T_min_ref / self.T_surface) ** (cp_d / R_d)
        p_iso = p_t * jnp.exp(-(z - z_t) * grav / (R_d * self.T_min_ref))
        return T, jnp.where(z <= z_t, p_ad, p_iso)
