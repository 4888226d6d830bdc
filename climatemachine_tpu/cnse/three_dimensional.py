"""3-D compressible Navier-Stokes test fluid (rho, rho u(3), rho theta).

Scope of reference test/Numerics/DGMethods/
compressible_navier_stokes_equations/three_dimensional/
ThreeDimensionalCompressibleNavierStokesEquations.jl:

  F(rho)       = rho u; advective rho u (x) rho u / rho, rho u theta (:358-385)
  pressure     p = (c_s rho)^2 / (2 rho_o) enters through the DG
               GRADIENT machinery (:266, :310) and is applied as a
               SOURCE  -grad p  (:424) — not as a first-order flux
  buoyancy     source.rhou -= (-alpha g rhotheta) k_hat (:469-489)
  coriolis     source.rhou -= 2 Omega z_hat x rhou (:455-466)
  viscous      mu grad(rho), nu grad(rhou), kappa grad(rhotheta) (:322-341)
  wavespeed    c_s (:493)
  Roe flux     entropy-wave form with c = c_s sqrt(rho/rho_o) (:498-594)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.cnse.two_dimensional import ConstantViscosity
from climatemachine_tpu.dg.numerical_fluxes import NumericalFluxFirstOrder
from climatemachine_tpu.utils.variables import VarSpec


@dataclass
class Buoyancy:
    alpha: float = 0.0
    g: float = 0.0


@dataclass
class Coriolis3D:
    omega: float = 0.0


class CNSE3DModel(BalanceLaw):
    """(reference CNSE3D :40; state rho, rhou(3), rhotheta)"""

    def __init__(self, problem, c_s: float, rho_o: float = 1.0,
                 turbulence: ConstantViscosity | None = None,
                 advection: str | None = "nonlinear",
                 coriolis: Coriolis3D | None = None,
                 buoyancy: Buoyancy | None = None):
        self.problem = problem
        self.c_s = float(c_s)
        self.rho_o = float(rho_o)
        self.turbulence = turbulence or ConstantViscosity()
        self.advection = advection
        self.coriolis = coriolis
        self.buoyancy = buoyancy

        self.ncoord = 3
        self.prog_spec = VarSpec(rho=1, rhou=3, rhotheta=1)
        self.aux_spec = VarSpec(coord=3)
        tb = self.turbulence
        self.visc = (tb.mu != 0.0 or tb.nu != 0.0 or tb.kappa != 0.0)
        # p always rides the gradient chain (:266); viscous vars
        # diffuse the CONSERVED fields (:277-287: u = rhou, theta = rhotheta)
        if self.visc:
            self.grad_spec = VarSpec(p=1, rho=1, u=3, theta=1)
            self.gf_spec = VarSpec(grad_p=3, mu_grad_rho=3,
                                   nu_grad_u=(3, 3), kappa_grad_theta=3)
        else:
            self.grad_spec = VarSpec(p=1)
            self.gf_spec = VarSpec(grad_p=3)

    def vars_state(self, state_type) -> VarSpec:
        if isinstance(state_type, st.Prognostic):
            return self.prog_spec
        if isinstance(state_type, st.Auxiliary):
            return self.aux_spec
        if isinstance(state_type, st.Gradient):
            return self.grad_spec
        if isinstance(state_type, st.GradientFlux):
            return self.gf_spec
        return VarSpec()

    def prog(self, q, name):
        return self.prog_spec.get(q, name)

    def nodal_init_state_auxiliary(self, geom, aux):
        return self.aux_spec.set(aux, "coord", geom["coords"])

    def init_state_prognostic(self, coords, aux, t):
        return self.problem.init_state(self, coords, aux, t)

    def _pressure(self, rho):
        return (self.c_s * rho) ** 2 / (2.0 * self.rho_o)

    # --- first order (NO pressure term: :359 commented out) -----------
    def flux_first_order(self, q, aux, t):
        s = self.prog_spec
        rhou = self.prog(q, "rhou")
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        F = s.set(F, "rho", rhou)
        if self.advection == "nonlinear":
            rho = self.prog(q, "rho")
            rhotheta = self.prog(q, "rhotheta")
            F = s.set(F, "rhou", rhou[..., :, None] * rhou[..., None, :]
                      / rho[..., None, None])
            F = s.set(F, "rhotheta", rhou * (rhotheta / rho)[..., None])
        return F

    def wavespeed(self, nrm, q, aux, t):
        return jnp.full(q.shape[:-1], self.c_s, dtype=q.dtype)

    # --- gradient chain (pressure + viscous) --------------------------
    def compute_gradient_argument(self, q, aux, t):
        gs = self.grad_spec
        out = jnp.zeros(q.shape[:-1] + (gs.num,), dtype=q.dtype)
        out = gs.set(out, "p", self._pressure(self.prog(q, "rho")))
        if self.visc:
            out = gs.set(out, "rho", self.prog(q, "rho"))
            out = gs.set(out, "u", self.prog(q, "rhou"))
            out = gs.set(out, "theta", self.prog(q, "rhotheta"))
        return out

    def compute_gradient_flux(self, grad_g, q, aux, t):
        gs, fs = self.grad_spec, self.gf_spec
        out = jnp.zeros(q.shape[:-1] + (fs.num,), dtype=q.dtype)
        out = fs.set(out, "grad_p",
                     grad_g[..., :, gs.index("p").start])
        if self.visc:
            tb = self.turbulence
            out = fs.set(out, "mu_grad_rho",
                         -tb.mu * grad_g[..., :, gs.index("rho").start])
            out = fs.set(out, "nu_grad_u",
                         -tb.nu * grad_g[..., :, gs.index("u")])
            out = fs.set(out, "kappa_grad_theta",
                         -tb.kappa * grad_g[..., :, gs.index("theta").start])
        return out

    def flux_second_order(self, q, gf, hyper, aux, t):
        s = self.prog_spec
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        if self.visc:
            F = s.set(F, "rho", self.gf_spec.get(gf, "mu_grad_rho"))
            F = s.set(F, "rhou", self.gf_spec.get(gf, "nu_grad_u"))
            F = s.set(F, "rhotheta",
                      self.gf_spec.get(gf, "kappa_grad_theta"))
        return F

    # --- sources ------------------------------------------------------
    def source(self, q, gf, aux, t):
        s = self.prog_spec
        out = jnp.zeros_like(q)
        # -grad p (:424)
        su = -self.gf_spec.get(gf, "grad_p")
        if self.coriolis is not None:
            rhou = self.prog(q, "rhou")
            f = 2.0 * self.coriolis.omega
            su = su + jnp.stack(
                [f * rhou[..., 1], -f * rhou[..., 0],
                 jnp.zeros_like(rhou[..., 0])], axis=-1)
        if self.buoyancy is not None:
            # B = -alpha g rhotheta; source.rhou -= B k_hat (:483-489)
            B = -self.buoyancy.alpha * self.buoyancy.g \
                * self.prog(q, "rhotheta")
            khat = jnp.zeros_like(su)
            khat = khat.at[..., 2].set(1.0)
            su = su - B[..., None] * khat
        return s.set(out, "rhou", su)

    # --- walls (default FluidBC: Impenetrable(FreeSlip) + Insulating,
    # reference FluidBC.jl:96-114) -------------------------------------
    def boundary_conditions(self):
        return getattr(self.problem, "boundary_conditions", ("wall",))

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        n3 = nrm[..., :3]
        rhouM = self.prog(q_minus, "rhou")
        rhn = jnp.einsum("...c,...c->...", n3, rhouM)
        rhouP = rhouM - 2.0 * rhn[..., None] * n3
        return self.prog_spec.set(q_minus, "rhou", rhouP), aux_minus

    def boundary_state_gradient_flux(self, tag, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        if not self.visc:
            return gf_minus
        out = self.gf_spec.set(
            gf_minus, "nu_grad_u",
            -self.gf_spec.get(gf_minus, "nu_grad_u"))
        out = self.gf_spec.set(
            out, "mu_grad_rho", -self.gf_spec.get(out, "mu_grad_rho"))
        return self.gf_spec.set(
            out, "kappa_grad_theta",
            -self.gf_spec.get(out, "kappa_grad_theta"))


class CNSE3DRoeNumericalFlux(NumericalFluxFirstOrder):
    """Model-specific 3-D Roe flux (reference :498-594): central flux
    minus the wave-decomposed dissipation with c = c_s sqrt(rho/rho_o),
    fully batched/elementwise (no per-node eigen solves)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        FM = bl.flux_first_order(qM, auxM, t)
        FP = bl.flux_first_order(qP, auxP, t)
        central = 0.5 * jnp.einsum("...ci,...c->...i", FM + FP, nrm)
        # pressure rides the gradient machinery, NOT flux_first_order —
        # but the Roe dissipation still sees the acoustic waves through
        # Delta p (:540-554); the reference's central term likewise has
        # no p (consistent: same splitting on both sides)

        s = bl.prog_spec
        n3 = nrm[..., :3]
        rhoM, rhoP = bl.prog(qM, "rho"), bl.prog(qP, "rho")
        rhouM, rhouP = bl.prog(qM, "rhou"), bl.prog(qP, "rhou")
        rhtM, rhtP = bl.prog(qM, "rhotheta"), bl.prog(qP, "rhotheta")

        sqM, sqP = jnp.sqrt(rhoM), jnp.sqrt(rhoP)

        def roe(vM, vP):
            if vM.ndim > sqM.ndim:
                return ((sqM[..., None] * vM + sqP[..., None] * vP)
                        / (sqM + sqP)[..., None])
            return (sqM * vM + sqP * vP) / (sqM + sqP)

        uM = rhouM / rhoM[..., None]
        uP = rhouP / rhoP[..., None]
        cs, rho_o = bl.c_s, bl.rho_o
        pM = bl._pressure(rhoM)
        pP = bl._pressure(rhoP)
        cM = cs * jnp.sqrt(rhoM / rho_o)
        cP = cs * jnp.sqrt(rhoP / rho_o)

        rho = jnp.sqrt(rhoM * rhoP)
        u = roe(uM, uP)
        th = roe(rhtM / rhoM, rhtP / rhoP)
        c = roe(cM, cP)
        un = jnp.einsum("...c,...c->...", u, n3)

        d_rho = rhoP - rhoM
        d_p = pP - pM
        d_u = uP - uM
        d_rht = rhtP - rhtM
        d_un = jnp.einsum("...c,...c->...", d_u, n3)

        ci2 = 1.0 / c ** 2
        w1 = jnp.abs(un - c) * (d_p - rho * c * d_un) * 0.5 * ci2
        w2 = jnp.abs(un + c) * (d_p + rho * c * d_un) * 0.5 * ci2
        w3 = jnp.abs(un) * (d_rho - d_p * ci2)
        w4 = jnp.abs(un) * rho
        w5 = jnp.abs(un) * (d_rht - th * d_p * ci2)

        p_rho = 0.5 * (w1 + w2 + w3)
        p_rhou = 0.5 * (w1[..., None] * (u - c[..., None] * n3)
                        + w2[..., None] * (u + c[..., None] * n3)
                        + w3[..., None] * u
                        + w4[..., None] * (d_u - d_un[..., None] * n3))
        p_rht = 0.5 * ((w1 + w2) * th + w5)

        out = central
        out = s.set(out, "rho", s.get(out, "rho") - p_rho)
        out = s.set(out, "rhou", s.get(out, "rhou") - p_rhou)
        return s.set(out, "rhotheta", s.get(out, "rhotheta") - p_rht)


class BuoyancyColumn:
    """(reference test_buoyancy.jl:80-95) motionless stratified column:
    theta_0 = -theta_o (1 - z/H), rho_0 balancing alpha-g compression."""

    def __init__(self, rho_o=1.0, c_s=None, alpha=1e-4, g=10.0,
                 theta_o=10.0, H=None):
        import math
        self.rho_o, self.alpha, self.g = rho_o, alpha, g
        self.c_s = math.sqrt(10.0) if c_s is None else c_s
        self.theta_o = theta_o
        self.H = 4.0 * math.pi if H is None else H
        self.boundary_conditions = ("wall",)

    def init_state(self, model, coords, aux, t):
        z = coords[..., 2]
        th0 = -self.theta_o * (1.0 - z / self.H)
        rho = self.rho_o * (1.0 - (self.alpha * self.g / self.c_s ** 2)
                            / 2.0 * th0 ** 2)
        s = model.prog_spec
        q = jnp.zeros(z.shape + (s.num,), dtype=coords.dtype)
        q = s.set(q, "rho", rho)
        return s.set(q, "rhotheta", rho * th0)
