"""Courant numbers and CFL-based time-step estimation.

Scope of reference ``src/Numerics/DGMethods/Courant.jl`` (advective/
diffusive/nondiffusive_courant), ``DGMethods.jl:79`` (calculate_dt) and
``DGModel_kernels.jl:3028`` (kernel_local_courant!).

TPU-native: local courant is a pointwise vectorized expression; the
global max is one jnp reduction (psum-max under sharding).
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.mesh.grid import Grid, min_node_distance


def nondiffusive_courant(model, q, aux, dt, delta_x, direction="every"):
    """(|u| + c_sound) dt / Δx per node (reference Atmos courant.jl)."""
    rho = model.prog(q, "rho")
    rhou = model.prog(q, "rhou")
    import climatemachine_tpu.physics.thermodynamics as td
    T, p, u = model.recover_thermo(q, aux)
    if direction == "vertical":
        k = model.aux_get(aux, "orientation.grad_Phi") / model.param_set.grav
        speed = jnp.abs(jnp.sum(u * k, axis=-1))
    elif direction == "horizontal":
        k = model.aux_get(aux, "orientation.grad_Phi") / model.param_set.grav
        un = jnp.sum(u * k, axis=-1, keepdims=True) * k
        speed = jnp.linalg.norm(u - un, axis=-1)
    else:
        speed = jnp.linalg.norm(u, axis=-1)
    c = td.soundspeed_air(model.param_set, T)
    return (speed + c) * dt / delta_x


def advective_courant(model, q, aux, dt, delta_x, direction="every"):
    rho = model.prog(q, "rho")
    u = model.prog(q, "rhou") / rho[..., None]
    return jnp.linalg.norm(u, axis=-1) * dt / delta_x


def diffusive_courant(model, q, aux, dt, delta_x, direction="every"):
    """ν dt / Δx² using the closure's viscosity if present."""
    turb = model.physics.turbulence
    if turb is None:
        return jnp.zeros(q.shape[:-1], dtype=q.dtype)
    nu, _ = turb.viscosity(model, q, None, aux, 0.0) \
        if not _needs_gf(turb) else (jnp.zeros(q.shape[:-1] + (3,),
                                               dtype=q.dtype),) * 2
    return jnp.max(nu, axis=-1) * dt / (delta_x ** 2)


def _needs_gf(turb):
    from climatemachine_tpu.common.turbulence import (SmagorinskyLilly,
                                                      Vreman)
    return isinstance(turb, (SmagorinskyLilly, Vreman))


def courant(local_courant, model, grid: Grid, q, aux, dt,
            direction: str = "every") -> float:
    """Global max courant (reference DGMethods.courant + MPI reduce)."""
    dx = min_node_distance(grid, direction)
    c = local_courant(model, q, aux, dt, dx, direction)
    return float(jnp.max(c))


def calculate_dt(grid: Grid, model, q, aux, courant_number: float,
                 direction: str = "every",
                 local_courant=nondiffusive_courant) -> float:
    """dt with target Courant number (reference DGMethods.jl:79)."""
    c1 = courant(local_courant, model, grid, q, aux, 1.0, direction)
    return courant_number / c1
