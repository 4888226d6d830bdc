"""High-level "one-call" ocean model (Oceananigans-style convenience API).

Scope of reference ``src/Ocean/SuperModels.jl``
(HydrostaticBoussinesqSuperModel :34-:225),
``src/Common/CartesianDomains`` (RectangularDomain) and
``src/Ocean/OceanProblems`` InitialValueProblem/InitialConditions: wrap
domain construction, grid, HydrostaticBoussinesqModel, initial state and
timestepper behind keyword knobs, exposing named field views and a
``solve``/``step`` loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from climatemachine_tpu.ocean import core as oc
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel)


@dataclass(frozen=True)
class RectangularDomain:
    """(reference CartesianDomains/rectangular_domain.jl): element counts
    Ne, polynomial order Np, extents, periodicity."""
    Ne: Tuple[int, int, int]
    Np: int
    x: Tuple[float, float]
    y: Tuple[float, float]
    z: Tuple[float, float]
    periodicity: Tuple[bool, bool, bool] = (False, False, False)

    @property
    def L(self):
        return (self.x[1] - self.x[0], self.y[1] - self.y[0],
                self.z[1] - self.z[0])


_ZERO = lambda x, y, z: jnp.zeros_like(x)


@dataclass(frozen=True)
class InitialConditions:
    """(reference OceanProblems InitialConditions): pointwise (x,y,z)
    callables for each field; absent fields start at zero."""
    u: Callable = _ZERO
    v: Callable = _ZERO
    eta: Callable = _ZERO
    theta: Callable = _ZERO


@dataclass
class InitialValueProblem:
    """Adapter problem: InitialConditions + BCs (reference
    OceanProblems/InitialValueProblem)."""
    Lx: float
    Ly: float
    H: float
    initial_conditions: InitialConditions = field(
        default_factory=InitialConditions)
    boundary_conditions: Tuple[oc.OceanBC, ...] = (
        oc.OceanBC(oc.Impenetrable(oc.FreeSlip()), oc.Insulating()),
        oc.OceanBC(oc.Penetrable(oc.FreeSlip()), oc.Insulating()),
    )

    def coriolis_parameter(self, model, y):
        return model.f_o + model.beta * (y - self.Ly / 2)

    def init_aux(self, model, coords, aux):
        return aux

    def init_state(self, model, coords, aux, t):
        ic = self.initial_conditions
        x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
        q = jnp.zeros(coords.shape[:-1] + (model.prog_spec.num,),
                      dtype=coords.dtype)
        q = model.prog_spec.set(
            q, "u", jnp.stack([ic.u(x, y, z), ic.v(x, y, z)], axis=-1))
        q = model.prog_spec.set(q, "eta", ic.eta(x, y, z))
        return model.prog_spec.set(q, "theta", ic.theta(x, y, z))

    def kinematic_stress(self, y):
        return jnp.zeros(y.shape + (2,), dtype=y.dtype)


class HydrostaticBoussinesqSuperModel:
    """One-call hydrostatic Boussinesq ocean model (reference
    SuperModels.jl:34): grid + equations + state + timestepper from
    keyword groups; ``fields`` gives named views of the current state."""

    def __init__(self, domain: RectangularDomain, time_step: float,
                 initial_conditions: InitialConditions = None,
                 advection=("nonlinear", "nonlinear"),
                 turbulence_closure=dict(nu_h=0.0, nu_z=0.0,
                                         kappa_h=0.0, kappa_z=0.0),
                 coriolis=dict(f_0=0.0, beta=0.0),
                 rusanov_wave_speeds=dict(c_h=0.0, c_z=0.0),
                 buoyancy=dict(alpha_T=0.0),
                 boundary_conditions=None,
                 timestepper="LS3NRK33Heuns",
                 dtype=np.float64):
        from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
        from climatemachine_tpu.mesh.grid import make_grid
        from climatemachine_tpu.mesh.topology import stacked_brick_topology
        from climatemachine_tpu.ode import lsrk3n
        from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

        self.domain = domain
        Lx, Ly, Lz = domain.L
        problem = InitialValueProblem(
            Lx, Ly, -domain.z[0],
            initial_conditions or InitialConditions())
        if boundary_conditions is not None:
            problem.boundary_conditions = boundary_conditions

        ranges = [np.linspace(domain.x[0], domain.x[1], domain.Ne[0] + 1),
                  np.linspace(domain.y[0], domain.y[1], domain.Ne[1] + 1),
                  np.linspace(domain.z[0], domain.z[1], domain.Ne[2] + 1)]
        nbc = len(problem.boundary_conditions)
        topo = stacked_brick_topology(
            ranges, periodicity=domain.periodicity,
            boundary=np.array([[1, 1], [1, 1], [1, min(2, nbc)]]))
        self.grid = make_grid(topo, domain.Np, dtype=dtype)

        self.equations = HydrostaticBoussinesqModel(
            problem,
            momentum_advection=advection[0],
            tracer_advection=advection[1],
            c_h=rusanov_wave_speeds.get("c_h", 0.0),
            c_z=rusanov_wave_speeds.get("c_z", 0.0),
            alpha_T=buoyancy.get("alpha_T", 0.0),
            nu_h=turbulence_closure.get("nu_h", 0.0),
            nu_z=turbulence_closure.get("nu_z", 0.0),
            kappa_h=turbulence_closure.get("kappa_h", 0.0),
            kappa_z=turbulence_closure.get("kappa_z", 0.0),
            f_o=coriolis.get("f_0", 0.0),
            beta=coriolis.get("beta", 0.0))

        self.dg = DGModel(self.equations, self.grid)
        self.state, self.aux = init_ode_state(self.dg)
        rhs = lambda q, aux, t: self.dg(q, aux, t)
        pre = self.dg.pre_stage
        if timestepper == "LS3NRK33Heuns":
            self.solver = lsrk3n.LS3NRK33Heuns(rhs, time_step, pre_stage=pre)
        elif timestepper == "LS3NRK44Classic":
            self.solver = lsrk3n.LS3NRK44Classic(rhs, time_step,
                                                 pre_stage=pre)
        else:
            self.solver = LSRK54CarpenterKennedy(rhs, time_step,
                                                 pre_stage=pre)
        self._jit_step = jax.jit(self.solver.step)
        self.time = 0.0
        self.step_count = 0

    @property
    def fields(self):
        s = self.equations.prog_spec
        u = s.get(self.state, "u")
        return dict(u=u[..., 0], v=u[..., 1],
                    eta=s.get(self.state, "eta"),
                    theta=s.get(self.state, "theta"))

    def cartesian_field(self, name):
        """Structured Cartesian view of a prognostic field (reference
        SpectralElementField over the SuperModel's RectangularDomain,
        SuperModels.jl:204-211): ``.elements`` is [Nex,Ney,Nez,Nq,Nq,Nq],
        ``.assemble()`` a continuous [nx,ny,nz] array."""
        from climatemachine_tpu.common.cartesian_fields import \
            SpectralElementField
        f = self.fields[name]
        return SpectralElementField(self.grid, f, Ne=self.domain.Ne)

    @property
    def dt(self):
        return self.solver.dt

    def step(self, n: int = 1):
        for _ in range(n):
            self.state, self.aux = self._jit_step(self.state, self.aux,
                                                  self.time)
            self.time += self.solver.dt
            self.step_count += 1
        return self

    def solve(self, until: float):
        """Advance to simulation time ``until``."""
        while self.time < until - 1e-12:
            self.step()
        return self
