"""Linear advection-diffusion balance law for verification.

Mirrors the role of reference
``test/Numerics/DGMethods/advection_diffusion/advection_diffusion_model.jl``
(a pseudo-balance-law used to verify DG operators and time integrators
against exact solutions at the expected convergence orders).

    dq/dt + div(u q) = div(D grad q)

with constant velocity u and scalar diffusivity D.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.balance_laws import (
    Auxiliary, BalanceLaw, Gradient, GradientFlux, Prognostic)
from climatemachine_tpu.utils.variables import VarSpec


class AdvectionDiffusion(BalanceLaw):
    def __init__(self, u=(1.0, 0.0, 0.0), diffusivity=0.0, init_fn=None,
                 ncoord=3):
        self.u = tuple(float(c) for c in u)
        self.D = float(diffusivity)
        self.init_fn = init_fn
        self.ncoord = ncoord

    def vars_state(self, state_type):
        if isinstance(state_type, Prognostic):
            return VarSpec(rho=1)
        if isinstance(state_type, Auxiliary):
            return VarSpec(coord=self.ncoord)
        if isinstance(state_type, Gradient) and self.D > 0:
            return VarSpec(rho=1)
        if isinstance(state_type, GradientFlux) and self.D > 0:
            return VarSpec(sigma=self.ncoord)
        return VarSpec()

    def init_state_prognostic(self, coords, aux, t):
        q0 = self.init_fn(coords, t)
        return q0[..., None] if q0.ndim == coords.ndim - 1 else q0

    def flux_first_order(self, q, aux, t):
        u = jnp.asarray(self.u[: self.ncoord], dtype=q.dtype)
        return u[..., :, None] * q[..., None, :]

    def wavespeed(self, nrm, q, aux, t):
        u = jnp.asarray(self.u[: self.ncoord], dtype=q.dtype)
        return jnp.abs(jnp.einsum("...c,c->...", nrm, u)) * jnp.ones(
            q.shape[:-1], dtype=q.dtype)

    # diffusion
    def compute_gradient_argument(self, q, aux, t):
        return q

    def compute_gradient_flux(self, grad_g, q, aux, t):
        # sigma = D * grad(rho): [..., ncoord]
        return self.D * grad_g[..., :, 0]

    def flux_second_order(self, q, gf, hyper, aux, t):
        return -gf[..., :, None]
