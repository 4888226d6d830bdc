"""Subgrid-scale turbulence closures (the viscous pipeline).

Scope of reference ``src/Common/TurbulenceClosures/TurbulenceClosures.jl``:
ConstantDynamicViscosity (:316), ConstantKinematicViscosity (:339),
SmagorinskyLilly (:430), Vreman (:526); ``turbulence_tensors`` returning
(ν, D_t, τ); plus the energy diffusive-enthalpy flux
(``tendencies_energy.jl`` ViscousFlux :27, DiffEnthalpyFlux :50).

TPU-first: each closure owns the whole second-order pipeline —
gradient-argument variables (u, h_tot, θ_v), gradient-flux storage
(S or ∇u, N², ∇h_tot), and the viscous fluxes — as batched tensor ops.
The anisotropic-ν vertical buoyancy correction is elementwise algebra
(VPU); the strain tensor comes from the DG gradient pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from climatemachine_tpu.utils.variables import VarSpec


def _sym(grad_u):
    """Symmetrize ∇u [..., 3(coord), 3(comp)] -> S [..., 3, 3]."""
    return 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))


def strain_rate_magnitude(S):
    """|S| = sqrt(2 S_ij S_ij) (reference strain_rate_magnitude)."""
    return jnp.sqrt(2.0 * jnp.sum(S * S, axis=(-2, -1)))


def _pack_sym(S):
    """[..., 3, 3] symmetric -> 6 components (11,22,33,12,13,23)."""
    return jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2],
                      S[..., 0, 1], S[..., 0, 2], S[..., 1, 2]], axis=-1)


def _unpack_sym(s6):
    r0 = jnp.stack([s6[..., 0], s6[..., 3], s6[..., 4]], axis=-1)
    r1 = jnp.stack([s6[..., 3], s6[..., 1], s6[..., 5]], axis=-1)
    r2 = jnp.stack([s6[..., 4], s6[..., 5], s6[..., 2]], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


class TurbulenceClosure:
    """Base closure: gradient vars u, h_tot (+ θ_v for buoyancy-aware)."""

    needs_theta_v = False
    needs_delta = False

    # --- schemas -----------------------------------------------------------
    def vars_aux(self) -> VarSpec:
        return VarSpec(delta=1) if self.needs_delta else VarSpec()

    def vars_gradient(self) -> VarSpec:
        f = dict(u=3, h_tot=1)
        if self.needs_theta_v:
            f["theta_v"] = 1
        return VarSpec(**f)

    def vars_gradient_flux(self) -> VarSpec:
        f = dict(S=6, d_h_tot=3)
        if self.needs_theta_v:
            f["N2"] = 1
        return VarSpec(**f)

    # --- aux init ----------------------------------------------------------
    def init_aux(self, model, geom, aux):
        if self.needs_delta:
            # lengthscale = 2 J^(1/3) / max polyorder (reference
            # Geometry.jl:121 lengthscale via det(invJ) = 1/J)
            maxpoly = max(nq - 1 for nq in geom["Nq"])
            delta = 2.0 * geom["J"] ** (1.0 / 3.0) / max(maxpoly, 1)
            aux = model.aux_spec.set(aux, "turbulence.delta", delta)
        return aux

    # --- pipeline ----------------------------------------------------------
    def gradient_argument(self, model, q, aux, t):
        rho = model.prog(q, "rho")
        rhoe = model.prog(q, "rhoe")
        T, p, u = model.recover_thermo(q, aux)
        spec = model.grad_spec
        out = jnp.zeros(q.shape[:-1] + (spec.num,), dtype=q.dtype)
        out = spec.set(out, "u", u)
        if model.physics.energy.is_theta:
            # theta-energy: diffuse theta itself (reference energy.jl
            # compute_gradient_argument! thetaModel branch)
            h_tot = rhoe / rho
        else:
            h_tot = (rhoe + p) / rho
        out = spec.set(out, "h_tot", h_tot)
        if self.needs_theta_v:
            out = spec.set(out, "theta_v", self._theta_v(model, q, aux))
        return out

    @staticmethod
    def _theta_v(model, q, aux):
        """θ_v from the moisture model's aux cache (reference reads
        aux.moisture.θ_v, TurbulenceClosures.jl:452-456)."""
        try:
            return model.aux_get(aux, "moisture.theta_v")
        except KeyError:
            ps = model.param_set
            T, p, _ = model.recover_thermo(q, aux)
            return T * (ps.MSLP / p) ** ps.kappa_d

    def gradient_flux(self, model, grad_g, q, aux, t):
        """grad_g: [..., 3(coord), ng] -> packed gradient-flux state."""
        gspec, fspec = model.grad_spec, model.gf_spec
        sl_u = gspec.index("u")
        grad_u = grad_g[..., :, sl_u]                 # [..., 3, 3]
        S = _sym(grad_u)
        out = jnp.zeros(q.shape[:-1] + (fspec.num,), dtype=q.dtype)
        out = fspec.set(out, "S", _pack_sym(S))
        sl_h = gspec.index("h_tot")
        out = fspec.set(out, "d_h_tot", grad_g[..., :, sl_h.start])
        if self.needs_theta_v:
            sl_t = gspec.index("theta_v")
            grad_tv = grad_g[..., :, sl_t.start]
            grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
            theta_v = self._theta_v(model, q, aux)
            N2 = jnp.sum(grad_tv * grad_Phi, axis=-1) / theta_v
            out = fspec.set(out, "N2", N2)
        return out

    def viscosity(self, model, q, gf, aux, t):
        """(ν_diag [..., 3], D_t [..., 3]); closure-specific."""
        raise NotImplementedError

    def flux(self, model, q, gf, aux, t):
        """Viscous fluxes: F[ρu] = ρ τ, F[ρe] = τ·ρu − ρ D_t ∇h_tot
        (reference ViscousStress, ViscousFlux + DiffEnthalpyFlux)."""
        fspec = model.gf_spec
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        S = _unpack_sym(fspec.get(gf, "S"))
        nu, D_t = self.viscosity(model, q, gf, aux, t)
        sponge = getattr(model.physics, "viscoussponge", None)
        if sponge is not None:
            nu, D_t = sponge.modify(model, aux, nu, D_t)
        tau = -2.0 * nu[..., :, None] * S             # diag(ν) @ S
        d_h_tot = fspec.get(gf, "d_h_tot")

        n = model.prog_spec.num
        F = jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)
        F = model.prog_spec.set(F, "rhou", rho[..., None, None] * tau)
        if model.physics.energy.is_theta:
            # theta diffusion only, no viscous heating (reference
            # tendencies_energy.jl theta Diffusion)
            Fe = -rho[..., None] * D_t * d_h_tot
        else:
            Fe = (jnp.einsum("...ij,...j->...i", tau, rhou)
                  - (rho * 1.0)[..., None] * D_t * d_h_tot)
        F = model.prog_spec.set(F, "rhoe", Fe)
        return F


@dataclass
class UpperAtmosSponge:
    """Viscosity amplification in an upper sponge layer (reference
    TurbulenceClosures.jl:946 UpperAtmosSponge:
    β = α_max sin^γ(π/2 (z-z_s)/(z_max-z_s)); ν,D_t,τ *= 1+β)."""
    z_max: float
    z_sponge: float
    alpha_max: float = 1.0
    gamma: float = 2.0

    def modify(self, model, aux, nu, D_t):
        ps = model.param_set
        z = model.aux_get(aux, "orientation.Phi") / ps.grav
        r = jnp.clip((z - self.z_sponge) / (self.z_max - self.z_sponge),
                     0.0, 1.0)
        beta = self.alpha_max * jnp.sin(jnp.pi / 2 * r) ** self.gamma
        amp = (1.0 + beta)[..., None]
        return nu * amp, D_t * amp


@dataclass
class ConstantKinematicViscosity(TurbulenceClosure):
    """ν = const (reference :339)."""
    nu: float = 0.0

    def viscosity(self, model, q, gf, aux, t):
        rho = model.prog(q, "rho")
        nu = jnp.full(rho.shape + (3,), self.nu, dtype=rho.dtype)
        return nu, nu * model.param_set.inv_Pr_turb


@dataclass
class ConstantDynamicViscosity(TurbulenceClosure):
    """μ = ρν = const (reference :316)."""
    rho_nu: float = 0.0

    def viscosity(self, model, q, gf, aux, t):
        rho = model.prog(q, "rho")
        nu = (self.rho_nu / rho)[..., None] * jnp.ones((3,), dtype=rho.dtype)
        return nu, nu * model.param_set.inv_Pr_turb


@dataclass
class SmagorinskyLilly(TurbulenceClosure):
    """Smagorinsky-Lilly with buoyancy-adjusted vertical viscosity
    (reference :430-501)."""
    C_smag: float = 0.21
    needs_theta_v = True
    needs_delta = True

    def viscosity(self, model, q, gf, aux, t):
        ps = model.param_set
        fspec = model.gf_spec
        S = _unpack_sym(fspec.get(gf, "S"))
        normS = strain_rate_magnitude(S)
        N2 = fspec.get(gf, "N2")
        delta = model.aux_get(aux, "turbulence.delta")
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        k = grad_Phi / ps.grav

        Ri = N2 / (normS ** 2 + 1e-30)
        f_b2 = jnp.sqrt(jnp.clip(1.0 - Ri * ps.inv_Pr_turb, 0.0, 1.0))
        nu0 = normS * (self.C_smag * delta) ** 2 + 1e-5
        # anisotropic: vertical component scaled by f_b²
        nu_v = k * (nu0[..., None] * k).sum(-1, keepdims=True)
        nu_diag = nu0[..., None] - nu_v + nu_v * f_b2[..., None]
        return nu_diag, nu_diag * ps.inv_Pr_turb


@dataclass
class Vreman(TurbulenceClosure):
    """Vreman (2004) eddy viscosity from ∇u invariants (reference :526)."""
    C_smag: float = 0.21
    needs_theta_v = True
    needs_delta = True

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec(grad_u=9, d_h_tot=3, N2=1)

    def gradient_flux(self, model, grad_g, q, aux, t):
        gspec, fspec = model.grad_spec, model.gf_spec
        sl_u = gspec.index("u")
        grad_u = grad_g[..., :, sl_u]                   # [..., 3, 3]
        out = jnp.zeros(q.shape[:-1] + (fspec.num,), dtype=q.dtype)
        out = fspec.set(out, "grad_u",
                        grad_u.reshape(grad_u.shape[:-2] + (9,)))
        sl_h = gspec.index("h_tot")
        out = fspec.set(out, "d_h_tot", grad_g[..., :, sl_h.start])
        sl_t = gspec.index("theta_v")
        grad_tv = grad_g[..., :, sl_t.start]
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        theta_v = self._theta_v(model, q, aux)
        N2 = jnp.sum(grad_tv * grad_Phi, axis=-1) / theta_v
        out = fspec.set(out, "N2", N2)
        return out

    def viscosity(self, model, q, gf, aux, t):
        ps = model.param_set
        fspec = model.gf_spec
        a = fspec.get(gf, "grad_u")
        alpha = a.reshape(a.shape[:-1] + (3, 3))        # α_ij = ∂u_j/∂x_i
        delta = model.aux_get(aux, "turbulence.delta")
        aij2 = jnp.sum(alpha * alpha, axis=(-2, -1))
        beta = delta[..., None, None] ** 2 * jnp.einsum(
            "...mi,...mj->...ij", alpha, alpha)
        Bb = (beta[..., 0, 0] * beta[..., 1, 1]
              + beta[..., 1, 1] * beta[..., 2, 2]
              + beta[..., 0, 0] * beta[..., 2, 2]
              - beta[..., 0, 1] ** 2 - beta[..., 0, 2] ** 2
              - beta[..., 1, 2] ** 2)
        c_v = 2.5 * self.C_smag ** 2
        nu0 = c_v * jnp.sqrt(jnp.maximum(Bb, 0.0)
                             / jnp.maximum(aij2, 1e-30)) + 1e-5
        nu = nu0[..., None] * jnp.ones((3,), dtype=nu0.dtype)
        return nu, nu * ps.inv_Pr_turb

    def flux(self, model, q, gf, aux, t):
        fspec = model.gf_spec
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        a = fspec.get(gf, "grad_u")
        S = _sym(a.reshape(a.shape[:-1] + (3, 3)))
        nu, D_t = self.viscosity(model, q, gf, aux, t)
        tau = -2.0 * nu[..., :, None] * S
        d_h_tot = fspec.get(gf, "d_h_tot")
        n = model.prog_spec.num
        F = jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)
        F = model.prog_spec.set(F, "rhou", rho[..., None, None] * tau)
        Fe = (jnp.einsum("...ij,...j->...i", tau, rhou)
              - rho[..., None] * D_t * d_h_tot)
        F = model.prog_spec.set(F, "rhoe", Fe)
        return F


@dataclass
class AnisoMinDiss(TurbulenceClosure):
    """Anisotropic minimum-dissipation closure (reference
    TurbulenceClosures.jl:618 AnisoMinDiss; Rozema et al. 2015 /
    Vreugdenhil & Taylor 2018): ν = (C_P δ)² max(0, −(∇uᵀ∇u):S/(∇u:∇u)),
    vertical component scaled by the buoyancy factor f_b².  With the
    isotropic per-node lengthscale δ the reference's δ-rescaled ∇û
    reduces to ∇u."""
    C_poincare: float = 1.0 / (jnp.pi ** 2)
    needs_theta_v = True
    needs_delta = True

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec(grad_u=9, S=6, d_h_tot=3, N2=1)

    def gradient_flux(self, model, grad_g, q, aux, t):
        gspec, fspec = model.grad_spec, model.gf_spec
        sl_u = gspec.index("u")
        grad_u = grad_g[..., :, sl_u]                   # [..., 3(x), 3(u)]
        out = jnp.zeros(q.shape[:-1] + (fspec.num,), dtype=q.dtype)
        out = fspec.set(out, "grad_u",
                        grad_u.reshape(grad_u.shape[:-2] + (9,)))
        out = fspec.set(out, "S", _pack_sym(_sym(grad_u)))
        sl_h = gspec.index("h_tot")
        out = fspec.set(out, "d_h_tot", grad_g[..., :, sl_h.start])
        sl_t = gspec.index("theta_v")
        grad_tv = grad_g[..., :, sl_t.start]
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        theta_v = self._theta_v(model, q, aux)
        out = fspec.set(out, "N2",
                        jnp.sum(grad_tv * grad_Phi, axis=-1) / theta_v)
        return out

    def viscosity(self, model, q, gf, aux, t):
        ps = model.param_set
        fspec = model.gf_spec
        a = fspec.get(gf, "grad_u")
        alpha = a.reshape(a.shape[:-1] + (3, 3))        # a[..,c,j]=du_j/dx_c
        S = _unpack_sym(fspec.get(gf, "S"))
        normS = strain_rate_magnitude(S)
        N2 = fspec.get(gf, "N2")
        delta = model.aux_get(aux, "turbulence.delta")

        Ri = N2 / (normS ** 2 + 1e-30)
        f_b2 = jnp.sqrt(jnp.clip(1.0 - Ri * ps.inv_Pr_turb, 0.0, 1.0))

        num = -jnp.einsum("...im,...jm,...ij->...", alpha, alpha, S)
        den = jnp.sum(alpha * alpha, axis=(-2, -1)) + 1e-30
        nu0 = (self.C_poincare * delta) ** 2 * jnp.maximum(1e-5, num / den)

        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        k = grad_Phi / ps.grav
        nu_v = k * (nu0[..., None] * k).sum(-1, keepdims=True)
        nu_diag = nu0[..., None] - nu_v + nu_v * f_b2[..., None]
        return nu_diag, nu_diag * ps.inv_Pr_turb


@dataclass
class Deardorff(TurbulenceClosure):
    """TKE-based closure (reference TurbulenceClosures.jl:700 Deardorff;
    Deardorff 1980): ν = 0.1 l √e, D_t = (1 + 2l/Δ) ν with the prognostic
    SGS TKE e from the paired :class:`SGStkeModel`
    (atmos/sgstke.py) and the stability length l = min(0.76 √e/N_θ, Δ)."""
    needs_theta_v = False
    needs_delta = True

    def viscosity(self, model, q, gf, aux, t):
        sg = model.physics.sgstke
        assert sg is not None, "Deardorff needs AtmosPhysics.sgstke"
        l, delta, e = sg.stability_length(model, q, gf, aux)
        nu0 = 0.1 * l * jnp.sqrt(e)
        D_t0 = (1.0 + 2.0 * l / delta) * nu0
        ones = jnp.ones((3,), dtype=nu0.dtype)
        return nu0[..., None] * ones, D_t0[..., None] * ones
