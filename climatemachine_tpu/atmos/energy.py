"""Energy-variable component: total energy vs liquid-ice potential
temperature.

Scope of reference ``src/Atmos/Model/energy.jl`` (TotalEnergyModel /
θModel :4-5, vars :8-15, gradient hooks :20-60) and
``tendencies_energy.jl`` (θModel energy flux = advection of ρθ, no
pressure work; diffusion = −ρ D_t ∇θ without viscous heating).

The prognostic slot keeps the name ``rhoe``; under :class:`ThetaModel`
its content is ρθ_liq_ice (dry: ρθ).  Dry thermodynamics close in closed
form: π = (R_d ρθ / p₀)^(R_d/cv_d), p = p₀ π^(cp_d/R_d), T = θ π.
"""

from __future__ import annotations

import jax.numpy as jnp


class TotalEnergyModel:
    """ρe prognostic (default; reference energy.jl:4)."""
    is_theta = False


class ThetaModel:
    """ρθ_liq_ice prognostic (reference energy.jl:5).  Dry-only in this
    build (the reference's θModel is likewise exercised dry in LES
    configs); pair with DryModel moisture."""
    is_theta = True

    @staticmethod
    def thermo_dry(ps, rho, rhotheta):
        """(T, p) from (ρ, ρθ): p = p0 (R_d ρθ/p0)^(cp/cv)."""
        theta = rhotheta / rho
        pi_exner = (ps.R_d * rhotheta / ps.MSLP) ** (ps.R_d / ps.cv_d)
        T = theta * pi_exner
        p = rho * ps.R_d * T
        return T, p
