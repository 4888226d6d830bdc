"""SolverConfiguration: wire a DriverConfiguration into a runnable solver.

Scope of reference ``src/Driver/solver_configs.jl`` (:11 struct, :104 fn:
build SpaceDiscretization, restore from checkpoint, init_ode_state +
initial filter, CFL→dt via calculate_dt, solversetup).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp

from climatemachine_tpu.dg.courant import calculate_dt, nondiffusive_courant
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.driver.configs import DriverConfiguration
from climatemachine_tpu.driver.driver import SETTINGS
from climatemachine_tpu.driver.solver_types import (ExplicitSolverType,
                                                    IMEXSolverType)


@dataclass
class SolverConfiguration:
    name: str
    dg: DGModel
    q: object
    aux: object
    dt: float
    t0: float
    timeend: float
    solver: object
    driver_config: DriverConfiguration
    init_args: dict = field(default_factory=dict)
    cfl: float = 0.4
    cfl_direction: str = "every"
    ode_solver_type: object = None


def make_solver_configuration(
        t0: float, timeend: float, driver_config: DriverConfiguration,
        ode_solver_type=None, Courant_number: Optional[float] = None,
        init_on_device: bool = True, ode_dt: Optional[float] = None,
        CFL_direction: str = "every", restart_from: Optional[tuple] = None,
        modeldata: Optional[dict] = None) -> SolverConfiguration:
    """(reference solver_configs.jl:104)"""
    dc = driver_config
    dg = DGModel(dc.model, dc.grid,
                 numerical_flux_first_order=dc.numerical_flux_first_order,
                 numerical_flux_gradient=dc.numerical_flux_gradient,
                 numerical_flux_second_order=dc.numerical_flux_second_order)

    if restart_from is not None:
        from climatemachine_tpu.driver import checkpoint as cp
        directory, num = restart_from
        q_np, aux_np, t0, _ = cp.read_checkpoint(directory, dc.name, num)
        q = jnp.asarray(q_np)
        aux = jnp.asarray(aux_np)
    else:
        q, aux = init_ode_state(dg, t0)

    if ode_dt is not None:
        dt = float(ode_dt)
    else:
        cn = Courant_number if Courant_number is not None else 0.4
        dt = calculate_dt(dc.grid, dc.model, q, aux, cn,
                          direction=CFL_direction,
                          local_courant=nondiffusive_courant)
    # land exactly on timeend (reference adjusts the final step; a fixed
    # dt keeps one compiled step function)
    import math
    if timeend > t0:
        nsteps = max(int(math.ceil((timeend - t0) / dt - 1e-12)), 1)
        dt = (timeend - t0) / nsteps

    solver_type = ode_solver_type or ExplicitSolverType()
    solver = solver_type.make(dg, q, aux, dt)

    if SETTINGS.debug_init:
        # dump initial aux + prognostic state and report non-finite
        # fields (reference Driver.jl:315 debug_init + solver_configs.jl
        # :175-199; NaN prefill is N/A - states are built functionally)
        from climatemachine_tpu.driver.callbacks import \
            show_not_finite_fields
        from climatemachine_tpu.io.vtk import vtk_dump_state
        import os
        prefix = os.path.join(SETTINGS.output_dir, f"{dc.name}_init")
        os.makedirs(SETTINGS.output_dir, exist_ok=True)
        vtk_dump_state(prefix, dg, q, aux)
        show_not_finite_fields(dc.model.prog_spec, q, "init_prognostic")
        show_not_finite_fields(dc.model.aux_spec, aux, "init_auxiliary")

    return SolverConfiguration(name=dc.name, dg=dg, q=q, aux=aux, dt=dt,
                               t0=t0, timeend=timeend, solver=solver,
                               driver_config=dc,
                               init_args=modeldata or {},
                               cfl=(Courant_number
                                    if Courant_number is not None else 0.4),
                               cfl_direction=CFL_direction,
                               ode_solver_type=solver_type)
