"""Atmosphere source terms (momentum/energy forcings).

Scope of reference ``src/Atmos/Model/tendencies_momentum.jl`` (Gravity :60,
Coriolis :74, GeostrophicForcing :88, RayleighSponge :103) — the tendency
DSL's ``Source`` singletons become plain callables composed at model-config
time (no runtime dispatch; see SURVEY §7 "Dispatch-heavy physics DSL").

Each source has ``contributions(model, q, gf, aux, t) -> {name: array}``
mapping prognostic-variable names to additive tendencies; the model packs
and sums them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp


class Source:
    def contributions(self, model, q, gf, aux, t):
        raise NotImplementedError


class Gravity(Source):
    """-(ρ - ρ_ref) ∇Φ (reference tendencies_momentum.jl:60-69; the ρ_ref
    offset applies iff the reference state subtracts off)."""

    def contributions(self, model, q, gf, aux, t):
        rho = model.prog(q, "rho")
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        if model.ref_state.subtract_off:
            rho = rho - model.aux_get(aux, "ref_state.rho")
        return {"rhou": -rho[..., None] * grad_Phi}


    def contributions_vm(self, model, ctx, t):
        """Var-major form (dg/fast_rhs.py): arrays [E, Np] / [E, 3, Np]."""
        rho = ctx.rho
        if model.ref_state.subtract_off:
            rho = rho - ctx.aux("ref_state.rho")
        return {"rhou": -rho[:, None, :] * ctx.grad_Phi}


class Coriolis(Source):
    """-2Ω ẑ × ρu in the planetary frame (reference :74-85; assumes
    SphericalOrientation, Ω along the x3 axis)."""

    def contributions(self, model, q, gf, aux, t):
        rhou = model.prog(q, "rhou")
        Om = model.param_set.Omega
        # -2Ω ẑ × ρu with ẑ = (0,0,1)
        out = jnp.stack([2 * Om * rhou[..., 1],
                         -2 * Om * rhou[..., 0],
                         jnp.zeros_like(rhou[..., 0])], axis=-1)
        return {"rhou": out}

    def contributions_vm(self, model, ctx, t):
        Om = model.param_set.Omega
        ru = ctx.rhou
        return {"rhou": jnp.stack([2 * Om * ru[:, 1], -2 * Om * ru[:, 0],
                                   jnp.zeros_like(ru[:, 0])], axis=1)}


@dataclass(frozen=True)
class GeostrophicForcing(Source):
    """-f ẑ × (ρu - ρ u_geo) (reference :88-101)."""
    f_coriolis: float
    u_geostrophic: float
    v_geostrophic: float

    def contributions(self, model, q, gf, aux, t):
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        k = grad_Phi / model.param_set.grav
        u_geo = jnp.stack([jnp.full_like(rho, self.u_geostrophic),
                           jnp.full_like(rho, self.v_geostrophic),
                           jnp.zeros_like(rho)], axis=-1)
        m = rhou - rho[..., None] * u_geo
        f = self.f_coriolis
        fk = f * k
        return {"rhou": -jnp.cross(fk, m)}


@dataclass(frozen=True)
class Subsidence(Source):
    """Large-scale subsidence: advect energy/moisture down with a
    prescribed w_sub(z) (reference multiphysics_types.jl:14: source uses
    the stored diffusive gradients ∇h_tot/∇q_tot)."""
    D: float    # divergence rate [1/s]: w_sub = -D z

    def contributions(self, model, q, gf, aux, t):
        if gf is None:
            return {}
        ps = model.param_set
        rho = model.prog(q, "rho")
        z = model.aux_get(aux, "orientation.Phi") / ps.grav
        k = model.aux_get(aux, "orientation.grad_Phi") / ps.grav
        w_sub = -self.D * z
        out = {}
        d_h = model.gf_spec.get(gf, "d_h_tot")
        out["rhoe"] = -rho * w_sub * jnp.sum(d_h * k, axis=-1)
        try:
            d_q = model.gf_spec.get(gf, "moisture.d_q_tot")
            out["moisture.rhoq_tot"] = \
                -rho * w_sub * jnp.sum(d_q * k, axis=-1)
        except KeyError:
            pass
        return out


@dataclass(frozen=True)
class RayleighSponge(Source):
    """Relax momentum to ρ u_relax above z_sponge (reference :103-160:
    β = α_max sin^γ(π/2 · (z-z_s)/(z_max-z_s)), S_ρu = -β (ρu - ρ u_relax))."""
    z_max: float
    z_sponge: float
    alpha_max: float
    u_relaxation: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    gamma: float = 2.0

    def contributions(self, model, q, gf, aux, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        z = model.aux_get(aux, "orientation.Phi") / ps.grav
        r = (z - self.z_sponge) / (self.z_max - self.z_sponge)
        r = jnp.clip(r, 0.0, 1.0)
        beta = self.alpha_max * jnp.sin(jnp.pi / 2 * r) ** self.gamma
        u_rel = jnp.asarray(self.u_relaxation, dtype=q.dtype)
        return {"rhou": -beta[..., None] * (rhou - rho[..., None] * u_rel)}

    def contributions_vm(self, model, ctx, t):
        ps = model.param_set
        z = ctx.Phi / ps.grav
        r = jnp.clip((z - self.z_sponge) / (self.z_max - self.z_sponge),
                     0.0, 1.0)
        beta = self.alpha_max * jnp.sin(jnp.pi / 2 * r) ** self.gamma
        u_rel = jnp.asarray(self.u_relaxation, dtype=ctx.rho.dtype)
        m = ctx.rhou - ctx.rho[:, None, :] * u_rel[None, :, None]
        return {"rhou": -beta[:, None, :] * m}
