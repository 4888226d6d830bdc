"""Derived diagnostic fields needing DG derivatives.

Scope of reference ``src/Diagnostics/diagnostic_fields.jl`` (396 LoC:
``VectorGradients`` via a mini balance law + ``Vorticity``) — here the
existing central-flux LDG helpers on DGModel provide the same
face-corrected gradients directly, no auxiliary balance law required.
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.diagnostics.machine import PointwiseDiagnostic


def vector_gradients(dg, u):
    """Face-corrected DG gradient of a vector field: u [E, Np, 3] →
    G [E, Np, 3, 3] with G[..., j, k] = ∂u_k/∂x_j (reference
    VectorGradients, diagnostic_fields.jl)."""
    return dg.dg_gradient_of(u, direction="every")


def vorticity(dg, u):
    """Relative vorticity ∇×u [E, Np, 3] (reference Vorticity,
    diagnostic_fields.jl / vorticity_balancelaw.jl)."""
    G = vector_gradients(dg, u)
    wx = G[..., 1, 2] - G[..., 2, 1]
    wy = G[..., 2, 0] - G[..., 0, 2]
    wz = G[..., 0, 1] - G[..., 1, 0]
    return jnp.stack([wx, wy, wz], axis=-1)


def atmos_gcm_default_vars(model, dg):
    """GCM default group (reference atmos_gcm_default.jl): core state
    diagnostics + vert (radial) component of relative vorticity."""
    from climatemachine_tpu.diagnostics.machine import atmos_default_vars

    def vort(m, q, aux, g):
        rho = m.prog(q, "rho")
        u = m.prog(q, "rhou") / rho[..., None]
        w = vorticity(dg, u)
        khat = m._vertical_unit(aux)
        return jnp.sum(w * khat, axis=-1)

    return atmos_default_vars(model) + [
        PointwiseDiagnostic("vort", vort, "1/s")]
