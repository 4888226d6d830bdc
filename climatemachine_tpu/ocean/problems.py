"""Ocean problem definitions (init/BC/forcing bundles).

Scope of reference ``src/Ocean/OceanProblems/``: SimpleBox
(simple_box_problem.jl:105, analytic barotropic/baroclinic spindown
states :147-280), OceanGyre (ocean_gyre.jl:12: wind stress τₒcos(πy/Lʸ),
surface temperature restoring λʳ(θ-θᴱ(1-y/Lʸ))), HomogeneousBox.

Boundary-tag convention (reference OceanBoxGCMConfiguration,
driver_configs.jl:470: boundary=((1,1),(1,1),(2,3))): lateral walls tag 1,
bottom tag 2, surface tag 3.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.ocean.core import (FreeSlip, Impenetrable,
                                           Insulating, KinematicStress,
                                           NoSlip, OceanBC, Penetrable,
                                           TemperatureFlux)


class Fixed:
    pass


class Rotating:
    pass


def _expm(M, t):
    import jax.scipy.linalg as jsl
    return jsl.expm(M * t)


@dataclass
class SimpleBox:
    """(reference simple_box_problem.jl:105) analytic spindown states."""
    Lx: float
    Ly: float
    H: float
    rotation: object = field(default_factory=Fixed)
    boundary_conditions: Tuple[OceanBC, ...] = (
        OceanBC(Impenetrable(FreeSlip()), Insulating()),
        OceanBC(Penetrable(FreeSlip()), Insulating()),
        OceanBC(Penetrable(FreeSlip()), Insulating()),
    )

    def coriolis_parameter(self, model, y):
        if isinstance(self.rotation, Fixed):
            return jnp.zeros_like(y)
        return jnp.full_like(y, model.f_o)

    def init_aux(self, model, coords, aux):
        return aux

    # analytic states (reference barotropic_state!/baroclinic_deviation)
    def hb_state(self, model, coords, t):
        kx = 2 * np.pi / self.Lx
        kz = 2 * np.pi / self.H
        x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
        gH = model.param_set.grav * self.H
        nu_x, nu_z = model.nu_h, model.nu_z
        if isinstance(self.rotation, Fixed):
            M = jnp.asarray([[-nu_x * kx ** 2, gH * kx], [-kx, 0.0]])
            A = _expm(M, t) @ jnp.ones((2,))
            U = A[0] * jnp.sin(kx * x)
            V = jnp.zeros_like(U)
            eta = A[1] * jnp.cos(kx * x)
            lam = nu_x * kx ** 2 + nu_z * kz ** 2
            u0 = jnp.exp(-lam * t) * jnp.cos(kz * z) * jnp.sin(kx * x)
            v0 = jnp.zeros_like(u0)
        else:
            f = model.f_o
            M = jnp.asarray([[-nu_x * kx ** 2, f, gH * kx],
                             [-f, -nu_x * kx ** 2, 0.0],
                             [-kx, 0.0, 0.0]])
            A = _expm(M, t) @ jnp.ones((3,))
            U = A[0] * jnp.sin(kx * x)
            V = A[1] * jnp.sin(kx * x)
            eta = A[2] * jnp.cos(kx * x)
            lam = nu_x * kx ** 2 + nu_z * kz ** 2
            Mb = jnp.asarray([[-lam, f], [-f, -lam]])
            Ab = _expm(Mb, t) @ jnp.ones((2,))
            u0 = Ab[0] * jnp.cos(kz * z) * jnp.sin(kx * x)
            v0 = Ab[1] * jnp.cos(kz * z) * jnp.sin(kx * x)
        return U, V, eta, u0, v0

    def init_state(self, model, coords, aux, t):
        U, V, eta, u0, v0 = self.hb_state(model, coords, t)
        u = u0 + U / self.H
        v = v0 + V / self.H
        q = jnp.zeros(coords.shape[:-1] + (model.prog_spec.num,),
                      dtype=coords.dtype)
        q = model.prog_spec.set(q, "u", jnp.stack([u, v], axis=-1))
        return model.prog_spec.set(q, "eta", eta)

    def sw_init_state(self, model, coords, aux, t):
        """Barotropic-only state for the shallow-water model."""
        kx = 2 * np.pi / self.Lx
        x = coords[..., 0]
        gH = model.param_set.grav * self.H
        nu = getattr(model.turbulence, "nu", 0.0)
        M = jnp.asarray([[-nu * kx ** 2, gH * kx], [-kx, 0.0]])
        A = _expm(M, t) @ jnp.ones((2,))
        U = A[0] * jnp.sin(kx * x)
        eta = A[1] * jnp.cos(kx * x)
        q = jnp.zeros(coords.shape[:-1] + (model.prog_spec.num,),
                      dtype=coords.dtype)
        q = model.prog_spec.set(q, "U", jnp.stack(
            [U, jnp.zeros_like(U)], axis=-1))
        return model.prog_spec.set(q, "eta", eta)

    def kinematic_stress(self, y):
        return jnp.zeros(y.shape + (2,), dtype=y.dtype)


@dataclass
class OceanGyre:
    """(reference ocean_gyre.jl:12) wind-driven, temperature-restored
    gyre."""
    Lx: float
    Ly: float
    H: float
    tau_o: float = 1e-1
    lam_r: float = 4.0 / 86400.0
    theta_E: float = 10.0
    boundary_conditions: Tuple[OceanBC, ...] = None

    def __post_init__(self):
        if self.boundary_conditions is None:
            self.boundary_conditions = (
                OceanBC(Impenetrable(NoSlip()), Insulating()),
                OceanBC(Impenetrable(NoSlip()), Insulating()),
                OceanBC(Penetrable(KinematicStress(self._stress)),
                        TemperatureFlux(self._temp_flux)),
            )

    def _stress(self, problem, y, t):
        tau = (self.tau_o / 1000.0) * jnp.cos(y * np.pi / self.Ly)
        return jnp.stack([tau, jnp.zeros_like(tau)], axis=-1)

    def _temp_flux(self, problem, y, theta, t):
        theta_r = self.theta_E * (1 - y / self.Ly)
        return self.lam_r * (theta - theta_r)

    def coriolis_parameter(self, model, y):
        return model.f_o + model.beta * y

    def init_aux(self, model, coords, aux):
        return aux

    def init_state(self, model, coords, aux, t):
        y, z = coords[..., 1], coords[..., 2]
        theta = (5 + 4 * jnp.cos(y * np.pi / self.Ly)) * (1 + z / self.H)
        q = jnp.zeros(coords.shape[:-1] + (model.prog_spec.num,),
                      dtype=coords.dtype)
        return model.prog_spec.set(q, "theta", theta)

    def kinematic_stress(self, y):
        tau = -self.tau_o * jnp.cos(np.pi * y / self.Ly)
        return jnp.stack([tau, jnp.zeros_like(tau)], axis=-1)


@dataclass
class HomogeneousBox(OceanGyre):
    """Wind-driven homogeneous box (reference homogeneous_box.jl): the
    gyre without temperature forcing."""

    def __post_init__(self):
        if self.boundary_conditions is None:
            self.boundary_conditions = (
                OceanBC(Impenetrable(NoSlip()), Insulating()),
                OceanBC(Impenetrable(NoSlip()), Insulating()),
                OceanBC(Penetrable(KinematicStress(self._stress)),
                        Insulating()),
            )

    def init_state(self, model, coords, aux, t):
        """u = 0, η = 0, θ = 20 (reference homogeneous_box.jl:48-54)."""
        q = jnp.zeros(coords.shape[:-1] + (model.prog_spec.num,),
                      dtype=coords.dtype)
        return model.prog_spec.set(q, "theta",
                                   jnp.full(coords.shape[:-1], 20.0,
                                            dtype=coords.dtype))


def ocean_box_grid(problem, nx, ny, nz, polyorder, dtype=None):
    """Stacked brick [0,Lx]x[0,Ly]x[-H,0] with ocean boundary tags
    (reference OceanBoxGCMConfiguration, driver_configs.jl:470)."""
    from climatemachine_tpu.mesh.grid import make_grid
    from climatemachine_tpu.mesh.topology import stacked_brick_topology
    ranges = [np.linspace(0.0, problem.Lx, nx + 1),
              np.linspace(0.0, problem.Ly, ny + 1),
              np.linspace(-problem.H, 0.0, nz + 1)]
    topo = stacked_brick_topology(
        ranges, periodicity=(False, False, False),
        boundary=np.array([[1, 1], [1, 1], [2, 3]]))
    return make_grid(topo, polyorder, dtype=dtype)
