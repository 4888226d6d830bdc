"""Interface (numerical) fluxes — Riemann solvers on face-node batches.

Scope of reference ``src/Numerics/DGMethods/NumericalFluxes.jl``
(RusanovNumericalFlux :219, CentralNumericalFluxFirstOrder :298,
RoeNumericalFlux :353, HLLC :373, CentralNumericalFluxGradient :65,
CentralNumericalFluxSecondOrder :668).

All functions are vectorized over face nodes: inputs are
``[..., n]`` state batches and ``[..., ncoord]`` unit normals; output is
the normal numerical flux ``F* . n`` with shape ``[..., n_prognostic]``.
Model-specific solvers (Roe/HLLC/LMARS) are provided by the model modules
(they need model thermodynamics); the generic ones live here.
"""

from __future__ import annotations

import jax.numpy as jnp


class NumericalFluxFirstOrder:
    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        raise NotImplementedError


class CentralNumericalFluxFirstOrder(NumericalFluxFirstOrder):
    """F* = 1/2 (F(q-) + F(q+)) . n"""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        FM = bl.flux_first_order(qM, auxM, t)
        FP = bl.flux_first_order(qP, auxP, t)
        return 0.5 * jnp.einsum("...ci,...c->...i", FM + FP, nrm)


class RusanovNumericalFlux(NumericalFluxFirstOrder):
    """Local Lax-Friedrichs: central flux minus 1/2 c_max (q+ - q-)
    (reference NumericalFluxes.jl:219)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        FM = bl.flux_first_order(qM, auxM, t)
        FP = bl.flux_first_order(qP, auxP, t)
        central = 0.5 * jnp.einsum("...ci,...c->...i", FM + FP, nrm)
        cM = bl.wavespeed(nrm, qM, auxM, t)
        cP = bl.wavespeed(nrm, qP, auxP, t)
        c = jnp.maximum(cM, cP)
        dq = qP - qM
        # model hook to adjust the dissipation term (reference
        # update_penalty!, e.g. ocean Δη = 0)
        if hasattr(bl, "numerical_flux_penalty"):
            dq = bl.numerical_flux_penalty(nrm, qM, auxM, qP, auxP, dq)
        return central - 0.5 * c[..., None] * dq


class NumericalFluxGradient:
    def __call__(self, bl, nrm, gM, gP):
        raise NotImplementedError


class CentralNumericalFluxGradient(NumericalFluxGradient):
    """g* = (g- + g+)/2 (reference NumericalFluxes.jl:65).

    Returns the *jump correction* n (x) (g* - g-) used by the strong-form
    gradient lift: [..., ncoord, n_gradient]."""

    def __call__(self, bl, nrm, gM, gP):
        return nrm[..., :, None] * (0.5 * (gP + gM) - gM)[..., None, :]


class NumericalFluxSecondOrder:
    def __call__(self, bl, nrm, qM, gfM, auxM, qP, gfP, auxP, t,
                 hyperM=None, hyperP=None):
        raise NotImplementedError


class CentralNumericalFluxSecondOrder(NumericalFluxSecondOrder):
    """F2* = 1/2 (F2(q-, gf-) + F2(q+, gf+)) . n (reference :668)."""

    def __call__(self, bl, nrm, qM, gfM, auxM, qP, gfP, auxP, t,
                 hyperM=None, hyperP=None):
        FM = bl.flux_second_order(qM, gfM, hyperM, auxM, t)
        FP = bl.flux_second_order(qP, gfP, hyperP, auxP, t)
        return 0.5 * jnp.einsum("...ci,...c->...i", FM + FP, nrm)


class CentralNumericalFluxDivergence:
    """For the hyperdiffusion chain: central flux of a vector field's
    divergence penalty (reference NumericalFluxes.jl:717-768)."""

    def __call__(self, bl, nrm, vM, vP):
        # vM, vP: [..., ncoord, n]; returns [..., n]
        return 0.5 * jnp.einsum("...ci,...c->...i", vM + vP, nrm)


class CentralNumericalFluxHigherOrder:
    """Central flux of the Laplacian gradient (hyperdiffusion)."""

    def __call__(self, bl, nrm, lM, lP):
        # scalar laplacian states [..., n] -> jump correction like gradient
        return nrm[..., :, None] * (0.5 * (lP + lM) - lM)[..., None, :]
