"""Land source terms and surface boundary-flux helpers.

Scope of reference ``src/Land/Model/source.jl`` (PhaseChange :18-120),
``Runoff.jl`` (NoRunoff :67, CoarseGridRunoff :75,
compute_surface_grad_bc :96) and ``RadiativeEnergyFlux.jl``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from climatemachine_tpu.land import soil_params as sp


@dataclass
class PhaseChange:
    """Freeze/thaw source for ϑ_l and θ_i (reference source.jl:18).

    freeze_thaw = (1/τ_ft)(ρ_l (θ_l − θ*) H(T_f−T) H(θ_l−θ*)
                           − ρ_i θ_i H(T−T_f))
    with θ* the Clapeyron-consistent liquid fraction below freezing and
    τ_ft = max(τ_LTE, τ_pt) the local thermal-equilibration timescale
    built from Δz, ρc_s, κ and |κ∇T|.  ρe_int needs NO source — the
    latent heat is carried by the θ_i term in T(ρe_int, θ_i).
    """
    dz: float

    def contributions(self, model, q, gf, aux, t):
        p = model.soil.params
        w = model.soil.water
        th_l = model.prog(q, "vartheta_l")
        th_i = model.prog(q, "theta_i")
        T = model.temperature(q)
        nu, th_r = p.porosity, p.theta_r

        hydraulics = w.hydraulics
        theta_m = jnp.minimum(p.rho_ice * th_i / p.rho_liq + th_l, nu)
        S_m = sp.effective_saturation(nu, theta_m, th_r)
        psi0 = hydraulics.matric_potential(S_m)
        g = 9.81
        psiT = p.LH_f0 / g / p.T_freeze * (T - p.T_freeze)
        S_star = hydraulics.inverse_matric_potential(
            jnp.minimum(psi0 + psiT, 0.0))
        theta_star = jnp.where(T < p.T_freeze,
                               th_r + (nu - th_r) * S_star, th_l)

        rho_c_s = model.heat_capacity(q)
        kappa = model.thermal_conductivity(q)
        tau_LTE = rho_c_s * self.dz ** 2 / kappa
        if gf is not None and model.gf_spec.num:
            kgT = model.gf_spec.get(gf, "kappa_grad_T")
            dT = jnp.linalg.norm(kgT, axis=-1) / kappa * self.dz
        else:
            dT = jnp.ones_like(T)
        rho_w = 0.5 * (p.rho_liq + p.rho_ice)
        tau_pt = tau_LTE * (rho_w * p.LH_f0 * (nu - th_r)) / \
            (rho_c_s * jnp.maximum(dT, 1e-6))
        tau_ft = jnp.maximum(tau_LTE, tau_pt)

        freezing = (T < p.T_freeze) & (th_l > theta_star)
        thawing = T > p.T_freeze
        ft = (p.rho_liq * (th_l - theta_star) * freezing
              - p.rho_ice * th_i * thawing) / tau_ft
        return {"vartheta_l": -ft / p.rho_liq,
                "theta_i": ft / p.rho_ice}


# --- surface water boundary fluxes (Runoff.jl) ------------------------------

class NoRunoff:
    """All incident water infiltrates (reference Runoff.jl:67)."""

    def infiltration(self, model, precip, q_minus, aux_minus):
        return precip


@dataclass
class CoarseGridRunoff:
    """Horton-type infiltration-excess runoff (reference Runoff.jl:75):
    infiltration is capped at the capacity i_c = K(ν)(Δψ + Δz)/Δz of the
    saturated surface layer; the excess runs off (is discarded, or fed
    to an OverlandFlowModel)."""
    dz: float

    def infiltration(self, model, precip, q_minus, aux_minus):
        p = model.soil.params
        w = model.soil.water
        vt = model.prog(q_minus, "vartheta_l")
        th_i = model.prog(q_minus, "theta_i")
        psi_sfc = sp.pressure_head(w.hydraulics, p.porosity, p.S_s,
                                   p.theta_r, vt, th_i)
        K = sp.hydraulic_conductivity(
            p.Ksat, w.hydraulics,
            jnp.ones_like(vt))          # saturated layer at the surface
        i_c = K * (0.0 - psi_sfc + self.dz) / self.dz
        return jnp.minimum(precip, i_c)


@dataclass
class SurfaceRunoffBC:
    """Neumann water-BC value: infiltration of precipitation P(t) [m/s,
    positive downward] limited by the runoff model (use as
    ``LandBC(water=Neumann(SurfaceRunoffBC(...)))``)."""
    precip: Callable
    runoff: object = None

    def __post_init__(self):
        if self.runoff is None:
            self.runoff = NoRunoff()

    def __call__(self, q_minus, aux_minus, t):
        P = self.precip(t)
        if not hasattr(P, "shape"):
            P = jnp.full(q_minus.shape[:-1], P, dtype=q_minus.dtype)
        return self.runoff.infiltration(self._model, P, q_minus, aux_minus)

    def bind(self, model):
        self._model = model
        return self


@dataclass
class RadiativeEnergyFlux:
    """Neumann heat-BC value: net inward radiative flux
    (1−α)SW(t) + ε(LW(t) − σ T_sfc⁴) (reference
    RadiativeEnergyFlux.jl)."""
    sw_down: Callable = lambda t: 0.0
    lw_down: Callable = lambda t: 0.0
    albedo: float = 0.2
    emissivity: float = 0.98
    sigma: float = 5.670374419e-8

    def bind(self, model):
        self._model = model
        return self

    def __call__(self, q_minus, aux_minus, t):
        T = self._model.temperature(q_minus)
        return ((1.0 - self.albedo) * self.sw_down(t)
                + self.emissivity * (self.lw_down(t)
                                     - self.sigma * T ** 4))
