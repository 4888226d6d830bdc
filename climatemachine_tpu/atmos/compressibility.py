"""Compressibility models: fully compressible vs 1-D anelastic.

Scope of reference ``src/Atmos/Model/AtmosModel.jl`` (Compressible :302,
Anelastic1D :322, density/pressure dispatch :571-589, soundspeed :806),
``atmos_tendencies.jl`` (Anelastic1D: Mass and Momentum first-order flux
sets empty :16,:28) and ``projections.jl`` (vertical momentum flux/source
rows zeroed :8-22).

Anelastic1D semantics (reference AtmosModel.jl:305-320):
- the state density is constant in time and equal to the reference
  density (mass flux removed ⇒ ∂ρ/∂t = 0; init forces ρ = ρ_ref),
- the thermodynamic state is built from the *reference pressure* and the
  evolving internal energy (PhaseDry_pe / PhaseEquil_peq),
- vertical momentum tendencies are removed entirely (pressure gradient /
  buoyancy assumed in balance),
- acoustic modes are absent: soundspeed enters wavespeed as 0.
"""

from __future__ import annotations


class Compressible:
    """Fully compressible (default; reference AtmosModel.jl:302)."""
    is_anelastic = False


class Anelastic1D:
    """1-D anelastic constraint (reference AtmosModel.jl:322): constant reference
    density, reference-pressure thermodynamics, no vertical momentum
    tendencies, no acoustics."""
    is_anelastic = True
