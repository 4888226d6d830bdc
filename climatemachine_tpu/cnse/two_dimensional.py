"""2-D compressible Navier-Stokes test fluid (rho, rho u, rho theta).

Scope of reference test/Numerics/DGMethods/
compressible_navier_stokes_equations/two_dimensional/
TwoDimensionalCompressibleNavierStokesEquations.jl:

  F(rho)      = rho u                                   (:262)
  F(rho u)    = g rho^2/2 I_h + rho u (x) rho u / rho   (:263, :283)
  F(rho theta)= rho u rho theta / rho                   (:284)
  wavespeed   = c (constant, :385)
  sources     = -f x rho u | kinematic stress | -lam rho u (:323-381)
  viscous     = nu grad(u), kappa grad(theta)           (:193-236, :303)

plus the model-specific Roe numerical flux (:389-504) and the
Impenetrable(FreeSlip)/Insulating wall ghosts (bc_momentum.jl:8-28,
bc_tracer.jl:7-22).

All faces/nodes are batched: states carry a trailing variable axis and
fluxes a [..., 2, nvar] axis exactly like the shallow-water model, so
every contraction lowers to MXU-friendly einsums.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.dg.numerical_fluxes import NumericalFluxFirstOrder
from climatemachine_tpu.utils.variables import VarSpec


@dataclass
class ConstantViscosity:
    """(reference shared_source dissipation ConstantViscosity)"""
    mu: float = 0.0
    nu: float = 0.0
    kappa: float = 0.0


@dataclass
class FPlaneCoriolis:
    f0: float = 0.0
    beta: float = 0.0


@dataclass
class KinematicStress:
    """source.rhou += problem.kinematic_stress(coords)"""
    pass


class CNSE2DModel(BalanceLaw):
    """(reference CNSE2D :121; state rho, rhou(2), rhotheta)"""

    def __init__(self, problem, g: float = 10.0, c: float = 2.0,
                 turbulence: ConstantViscosity | None = None,
                 advection: str | None = "nonlinear",
                 coriolis: FPlaneCoriolis | None = None,
                 forcing=None):
        self.problem = problem
        self.g = float(g)
        self.c = float(c)
        self.turbulence = turbulence or ConstantViscosity()
        self.advection = advection
        self.coriolis = coriolis
        self.forcing = forcing

        self.ncoord = 2
        self.prog_spec = VarSpec(rho=1, rhou=2, rhotheta=1)
        self.aux_spec = VarSpec(coord=2)
        visc = (self.turbulence.nu != 0.0 or self.turbulence.kappa != 0.0)
        self.grad_spec = VarSpec(u=2, theta=1) if visc else VarSpec()
        self.gf_spec = (VarSpec(nu_grad_u=(2, 2), kappa_grad_theta=2)
                        if visc else VarSpec())

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
        return self.aux_spec.set(aux, "coord", geom["coords"][..., :2])

    def init_state_prognostic(self, coords, aux, t):
        return self.problem.init_state(self, coords, aux, t)

    # --- first order --------------------------------------------------
    def flux_first_order(self, q, aux, t):
        s = self.prog_spec
        rho = self.prog(q, "rho")
        rhou = self.prog(q, "rhou")
        F = jnp.zeros(q.shape[:-1] + (2, s.num), dtype=q.dtype)
        F = s.set(F, "rho", rhou)
        eye = jnp.eye(2, dtype=q.dtype)
        Fu = 0.5 * self.g * (rho ** 2)[..., None, None] * eye
        if self.advection == "nonlinear":
            rhotheta = self.prog(q, "rhotheta")
            Fu = Fu + (rhou[..., :, None] * rhou[..., None, :]
                       / rho[..., None, None])
            F = s.set(F, "rhotheta",
                      rhou * (rhotheta / rho)[..., None])
        return s.set(F, "rhou", Fu)

    def wavespeed(self, nrm, q, aux, t):
        return jnp.full(q.shape[:-1], self.c, dtype=q.dtype)

    # --- viscous chain ------------------------------------------------
    def compute_gradient_argument(self, q, aux, t):
        out = jnp.zeros(q.shape[:-1] + (self.grad_spec.num,), dtype=q.dtype)
        rho = self.prog(q, "rho")
        out = self.grad_spec.set(out, "u",
                                 self.prog(q, "rhou") / rho[..., None])
        return self.grad_spec.set(out, "theta",
                                  self.prog(q, "rhotheta") / rho)

    def compute_gradient_flux(self, grad_g, q, aux, t):
        gs, fs = self.grad_spec, self.gf_spec
        grad_u = grad_g[..., :2, gs.index("u")]
        grad_th = grad_g[..., :2, gs.index("theta").start]
        out = jnp.zeros(q.shape[:-1] + (fs.num,), dtype=q.dtype)
        out = fs.set(out, "nu_grad_u", -self.turbulence.nu * grad_u)
        return fs.set(out, "kappa_grad_theta",
                      -self.turbulence.kappa * grad_th)

    def flux_second_order(self, q, gf, hyper, aux, t):
        s = self.prog_spec
        F = jnp.zeros(q.shape[:-1] + (2, s.num), dtype=q.dtype)
        F = s.set(F, "rhou", self.gf_spec.get(gf, "nu_grad_u"))
        return s.set(F, "rhotheta",
                     self.gf_spec.get(gf, "kappa_grad_theta"))

    # --- sources ------------------------------------------------------
    def source(self, q, gf, aux, t):
        s = self.prog_spec
        out = jnp.zeros_like(q)
        su = jnp.zeros(q.shape[:-1] + (2,), dtype=q.dtype)
        if self.coriolis is not None:
            coord = self.aux_spec.get(aux, "coord")
            f = self.coriolis.f0 + self.coriolis.beta * coord[..., 1]
            rhou = self.prog(q, "rhou")
            # -f x rhou  (z-component of f only; :341-358)
            su = su + jnp.stack([f * rhou[..., 1], -f * rhou[..., 0]],
                                axis=-1)
        if self.forcing is not None:
            coord = self.aux_spec.get(aux, "coord")
            su = su + self.problem.kinematic_stress(coord)
        return s.set(out, "rhou", su)

    # --- walls --------------------------------------------------------
    def boundary_conditions(self):
        return getattr(self.problem, "boundary_conditions", ("wall",))

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        """Impenetrable(FreeSlip) momentum reflection + Insulating
        rho theta transmission (bc_momentum.jl:8-28, bc_tracer.jl:7-22):
        rho+ = rho-, rhou+ = rhou- - 2 (n . rhou-) n, rhotheta+ = rhotheta-."""
        n2 = nrm[..., :2]
        rhouM = self.prog(q_minus, "rhou")
        rhn = jnp.einsum("...c,...c->...", n2, rhouM)
        rhouP = rhouM - 2.0 * rhn[..., None] * n2
        return self.prog_spec.set(q_minus, "rhou", rhouP), aux_minus

    def boundary_state_gradient_flux(self, tag, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        # FreeSlip: reflect nu grad u so the wall viscous flux vanishes;
        # Insulating: reflect kappa grad theta (bc_*.jl SecondOrder)
        if not self.gf_spec.num:
            return gf_minus
        out = self.gf_spec.set(
            gf_minus, "nu_grad_u",
            -self.gf_spec.get(gf_minus, "nu_grad_u"))
        return self.gf_spec.set(
            out, "kappa_grad_theta",
            -self.gf_spec.get(out, "kappa_grad_theta"))


class CNSERoeNumericalFlux(NumericalFluxFirstOrder):
    """Model-specific Roe flux (reference CNSE2D
    numerical_flux_first_order! ::RoeNumericalFlux :389-504): central
    flux minus 1/2 R |Lambda| R^-1 (q+ - q-) with the shallow-water-like
    eigensystem c = sqrt(g rho_roe), assembled as batched closed-form
    expressions (no per-node 4x4 eigen solves — the R |L| R^-1 product
    is expanded algebraically so everything stays elementwise on the
    VPU)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        FM = bl.flux_first_order(qM, auxM, t)
        FP = bl.flux_first_order(qP, auxP, t)
        central = 0.5 * jnp.einsum("...ci,...c->...i", FM + FP, nrm)

        g = bl.g
        nx, ny = nrm[..., 0], nrm[..., 1]
        s = bl.prog_spec
        rhoM = bl.prog(qM, "rho")
        rhoP = bl.prog(qP, "rho")
        rhouM = bl.prog(qM, "rhou")
        rhouP = bl.prog(qP, "rhou")
        rhtM = bl.prog(qM, "rhotheta")
        rhtP = bl.prog(qP, "rhotheta")

        sqM, sqP = jnp.sqrt(rhoM), jnp.sqrt(rhoP)

        def roe(vM, vP):
            return (sqM * vM + sqP * vP) / (sqM + sqP)

        u = roe(rhouM[..., 0] / rhoM, rhouP[..., 0] / rhoP)
        v = roe(rhouM[..., 1] / rhoM, rhouP[..., 1] / rhoP)
        th = roe(rhtM / rhoM, rhtP / rhoP)

        un = nx * u + ny * v
        ut = nx * v - ny * u

        d_rho = rhoP - rhoM
        d_rhou = rhouP[..., 0] - rhouM[..., 0]
        d_rhov = rhouP[..., 1] - rhouM[..., 1]
        d_rht = rhtP - rhtM

        c = jnp.sqrt(g * 0.5 * (rhoM + rhoP))
        l1 = jnp.abs(un)              # shear/tracer waves
        l2 = jnp.abs(un + c)
        l3 = jnp.abs(un - c)

        # R^-1 dq (reference :477-489, rows: shear, +acoustic,
        # -acoustic, tracer)
        w1 = -ut * d_rho - ny * d_rhou + nx * d_rhov
        w2 = ((c - un) * d_rho + nx * d_rhou + ny * d_rhov) / (2.0 * c)
        w3 = ((c + un) * d_rho - nx * d_rhou - ny * d_rhov) / (2.0 * c)
        w4 = -th * d_rho + d_rht

        a1, a2, a3, a4 = l1 * w1, l2 * w2, l3 * w3, l1 * w4

        # R columns (reference :466-473)
        p_rho = a2 + a3
        p_rhou = -ny * a1 + (u + nx * c) * a2 + (u - nx * c) * a3
        p_rhov = nx * a1 + (v + ny * c) * a2 + (v - ny * c) * a3
        p_rht = th * (a2 + a3) + a4

        pen = jnp.stack([p_rho, p_rhou, p_rhov, p_rht], axis=-1)
        del s
        return central - 0.5 * pen


class BickleyJet:
    """(reference test_bickley_jet.jl:100-118) unstable jet + vortical
    perturbation + sinusoidal tracer on [-2pi, 2pi]^2."""

    def __init__(self, eps=0.1, l=0.5, k=0.5, rho0=1.0):
        self.eps, self.l, self.k, self.rho0 = eps, l, k, rho0
        self.boundary_conditions = ("wall",)

    def init_state(self, model, coords, aux, t):
        p = self
        x = coords[..., 0]
        y = coords[..., 1]
        U0 = 1.0 / jnp.cosh(y) ** 2
        Psi0 = (jnp.exp(-(y + p.l / 10.0) ** 2 / (2.0 * p.l ** 2))
                * jnp.cos(p.k * x) * jnp.cos(p.k * y))
        u0 = Psi0 * (p.k * jnp.tan(p.k * y) + y / p.l ** 2)
        v0 = -Psi0 * p.k * jnp.tan(p.k * x)
        th0 = jnp.sin(p.k * y)
        rho = jnp.full_like(x, p.rho0)
        s = model.prog_spec
        q = jnp.zeros(x.shape + (s.num,), dtype=coords.dtype)
        q = s.set(q, "rho", rho)
        q = s.set(q, "rhou", rho[..., None] * jnp.stack(
            [p.eps * u0 + U0, p.eps * v0], axis=-1))
        return s.set(q, "rhotheta", rho * th0)
