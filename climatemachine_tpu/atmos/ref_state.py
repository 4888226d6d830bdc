"""Hydrostatic reference states for the atmosphere model.

Scope of reference ``src/Atmos/Model/ref_state.jl`` (HydrostaticState :36,
NoReferenceState :26).  The reference integrates p(z) by ODE during aux
init; here the profiles are analytic (see physics.temperature_profiles) so
the reference state is evaluated in closed form at every node — exact
hydrostatic balance pointwise, trivially jittable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import PlanetParameterSet
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile, TemperatureProfile)
from climatemachine_tpu.utils.variables import VarSpec


class ReferenceState:
    def vars_aux(self) -> VarSpec:
        return VarSpec()

    @property
    def subtract_off(self) -> bool:
        return False


class NoReferenceState(ReferenceState):
    pass


@dataclass(frozen=True)
class HydrostaticState(ReferenceState):
    """Dry hydrostatic state from a virtual-temperature profile
    (reference ref_state.jl:36; subtract_off semantics at
    tendencies_momentum.jl:24-28,:64-69)."""

    profile: TemperatureProfile = field(default_factory=DecayingTemperatureProfile)
    relative_humidity: float = 0.0
    _subtract_off: bool = True

    def vars_aux(self) -> VarSpec:
        return VarSpec(rho=1, p=1, T=1, rhoe=1)

    @property
    def subtract_off(self) -> bool:
        return self._subtract_off

    def fields(self, ps: PlanetParameterSet, z, Phi):
        """Evaluate (rho, p, T, rhoe) at altitude z (geopotential Phi)."""
        T_virt, p = self.profile(ps, z)
        rho = p / (ps.R_d * T_virt)
        # dry: T = T_virt
        e_int = td.internal_energy(ps, T_virt)
        rhoe = rho * (e_int + Phi)
        return {"rho": rho, "p": p, "T": T_virt, "rhoe": rhoe}
