"""Horizontal biharmonic hyperdiffusion.

Scope of reference ``src/Common/TurbulenceClosures/TurbulenceClosures.jl``
(DryBiharmonic :857, EquilMoistBiharmonic :775) and the hyperdiffusive
fluxes (``tendencies_momentum.jl`` HyperdiffViscousFlux :50,
``tendencies_energy.jl`` :39-47, ``tendencies_moisture.jl`` :52).

ν₄ = (Δ_h/2)⁴ / 2τ with Δ_h the horizontal grid lengthscale
(Geometry.jl:134-151); the chain ∇→Δ→∇Δ runs through the DG LDG helpers
(dg/spatial.py hyperdiffusive_state).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from climatemachine_tpu.utils.variables import VarSpec


@dataclass
class DryBiharmonic:
    """(reference :857) τ_timescale: hyperdiffusion timescale [s].
    Horizontal-only: ν₄ uses the horizontal lengthscale, so the LDG chain
    must not act vertically (reference diffdir=HorizontalDirection)."""
    tau_timescale: float
    direction: str = field(default="horizontal", kw_only=True)

    def vars_aux(self) -> VarSpec:
        return VarSpec(delta=1)

    def vars_gradient_laplacian(self) -> VarSpec:
        return VarSpec(u_h=3, h_tot=1)

    def vars_hyperdiffusive(self) -> VarSpec:
        return VarSpec(nu3_u_h=(3, 3), nu3_h_tot=3)

    # Δ_h: mean of the two horizontal per-direction node spacings
    # (reference lengthscale_horizontal, Geometry.jl:134-151)
    def init_aux(self, model, geom, aux):
        xi_x = geom["xi_x"]                       # [..., dim, ncoord]
        Jm = jnp.linalg.inv(xi_x)                 # [..., ncoord, dim] = ∂x/∂ξ
        Nq = geom["Nq"]
        d1 = jnp.linalg.norm(Jm[..., :, 0], axis=-1) * 2 / max(Nq[0] - 1, 1)
        d2 = jnp.linalg.norm(Jm[..., :, 1], axis=-1) * 2 / max(Nq[1] - 1, 1)
        return model.aux_spec.set(aux, "hyperdiffusion.delta",
                                  0.5 * (d1 + d2))

    def gradient_laplacian_argument(self, model, q, aux, t):
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        rhoe = model.prog(q, "rhoe")
        u = rhou / rho[..., None]
        k = model.aux_get(aux, "orientation.grad_Phi") / model.param_set.grav
        u_h = u - jnp.sum(u * k, axis=-1, keepdims=True) * k
        T, p, _ = model.recover_thermo(q, aux)
        h_tot = (rhoe + p) / rho
        spec = model.gradlap_spec
        out = jnp.zeros(q.shape[:-1] + (spec.num,), dtype=q.dtype)
        out = spec.set(out, "u_h", u_h)
        return spec.set(out, "h_tot", h_tot)

    def transform(self, model, grad_lap, q, aux, t):
        """grad_lap [..., 3, ngl] -> hyper state (reference
        transform_post_gradient_laplacian!, :893-911)."""
        delta = model.aux_get(aux, "hyperdiffusion.delta")
        nu4 = (delta / 2) ** 4 / (2 * self.tau_timescale)
        gspec, hspec = model.gradlap_spec, model.hyper_spec
        out = jnp.zeros(q.shape[:-1] + (hspec.num,), dtype=q.dtype)
        gu = grad_lap[..., :, gspec.index("u_h")]           # [..., 3, 3]
        out = hspec.set(out, "nu3_u_h", nu4[..., None, None] * gu)
        gh = grad_lap[..., :, gspec.index("h_tot").start]   # [..., 3]
        return hspec.set(out, "nu3_h_tot", nu4[..., None] * gh)

    def flux(self, model, q, hyper, aux, F):
        """F[ρu] += ρ ν∇³u_h; F[ρe] += ν∇³u_h·ρu + ρ ν∇³h_tot."""
        s, hspec = model.prog_spec, model.hyper_spec
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        nu3u = hspec.get(hyper, "nu3_u_h")                  # [..., 3, 3]
        nu3h = hspec.get(hyper, "nu3_h_tot")                # [..., 3]
        F = s.set(F, "rhou", s.get(F, "rhou") + rho[..., None, None] * nu3u)
        Fe = (jnp.einsum("...ij,...j->...i", nu3u, rhou)
              + rho[..., None] * nu3h)
        return s.set(F, "rhoe", s.get(F, "rhoe") + Fe)


@dataclass
class EquilMoistBiharmonic(DryBiharmonic):
    """(reference :775) adds q_tot hyperdiffusion."""
    tau_timescale_q_tot: float = None

    def __post_init__(self):
        if self.tau_timescale_q_tot is None:
            self.tau_timescale_q_tot = self.tau_timescale

    def vars_gradient_laplacian(self) -> VarSpec:
        return VarSpec(u_h=3, h_tot=1, q_tot=1)

    def vars_hyperdiffusive(self) -> VarSpec:
        return VarSpec(nu3_u_h=(3, 3), nu3_h_tot=3, nu3_q_tot=3)

    def gradient_laplacian_argument(self, model, q, aux, t):
        out = super().gradient_laplacian_argument(model, q, aux, t)
        rho = model.prog(q, "rho")
        q_tot = model.prog(q, "moisture.rhoq_tot") / rho
        return model.gradlap_spec.set(out, "q_tot", q_tot)

    def transform(self, model, grad_lap, q, aux, t):
        out = super().transform(model, grad_lap, q, aux, t)
        delta = model.aux_get(aux, "hyperdiffusion.delta")
        nu4q = (delta / 2) ** 4 / (2 * self.tau_timescale_q_tot)
        gq = grad_lap[..., :, model.gradlap_spec.index("q_tot").start]
        return model.hyper_spec.set(out, "nu3_q_tot", nu4q[..., None] * gq)

    def flux(self, model, q, hyper, aux, F):
        F = super().flux(model, q, hyper, aux, F)
        s, hspec = model.prog_spec, model.hyper_spec
        rho = model.prog(q, "rho")
        nu3q = hspec.get(hyper, "nu3_q_tot")
        return s.set(F, "moisture.rhoq_tot",
                     s.get(F, "moisture.rhoq_tot") + rho[..., None] * nu3q)
