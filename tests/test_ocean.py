"""Ocean model tests: column integrals, shallow-water spindown vs the
analytic solution (reference test/Ocean/ShallowWater + SplitExplicit
spindown refvals), hydrostatic Boussinesq gyre stability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.dg.columns import ColumnOps
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import (brick_topology,
                                              stacked_brick_topology)
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel)
from climatemachine_tpu.ocean.problems import (Fixed, OceanGyre, SimpleBox,
                                               ocean_box_grid)
from climatemachine_tpu.ocean.shallow_water import (ConstantViscosity,
                                                    ShallowWaterModel)
from climatemachine_tpu.ode.lsrk import (LSRK54CarpenterKennedy,
                                         LSRK144NiegemannDiehlBusch)


def test_column_integrals_analytic():
    """∫0^z (3z'^2) dz' = z^3 and the reverse integral on a stacked box."""
    r = [np.linspace(0, 1, 3)] * 2 + [np.linspace(0, 1, 5)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    cols = ColumnOps(grid)
    z = grid.coords[..., 2]
    f = (3 * z ** 2)[..., None]
    I = cols.indefinite_integral(f)[..., 0]
    assert float(jnp.max(jnp.abs(I - z ** 3))) < 1e-12
    R = cols.reverse_indefinite_integral(f)[..., 0]
    assert float(jnp.max(jnp.abs(R - (1 - z ** 3)))) < 1e-12
    top = cols.broadcast_top((z ** 2)[..., None])[..., 0]
    assert float(jnp.max(jnp.abs(top - 1.0))) < 1e-12


def test_shallow_water_spindown_matches_analytic():
    """Viscous standing-wave decay tracks the exact ODE solution
    (reference simple_box_problem.jl barotropic_state!)."""
    Lx = Ly = 1e6
    H = 1000.0
    problem = SimpleBox(Lx, Ly, H, rotation=Fixed())
    c = float(np.sqrt(9.81 * H))
    model = ShallowWaterModel(problem, turbulence=ConstantViscosity(1e4),
                              advection=None, c=c)
    # SimpleBox init for SW
    problem.init_state = problem.sw_init_state

    r = [np.linspace(0, Lx, 7), np.linspace(0, Ly, 3)]
    topo = brick_topology(r, periodicity=(False, False),
                          boundary=np.array([[1, 1], [1, 1]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    dt = 0.25 * min_node_distance(grid) / c
    nsteps = 200
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt

    q_exact = problem.sw_init_state(model, grid.coords, aux, t)
    for name in ["eta", "U"]:
        err = model.prog(q, name) - model.prog(q_exact, name)
        scale = float(jnp.max(jnp.abs(model.prog(q_exact, name)))) + 1e-30
        assert float(jnp.max(jnp.abs(err))) < 0.02 * scale, name


def test_hb_gyre_runs_stably():
    """OceanGyre: wind stress + restoring; runs stably, θ stays bounded,
    w is divergence-consistent."""
    problem = OceanGyre(Lx=4e6, Ly=4e6, H=1000.0)
    model = HydrostaticBoussinesqModel(problem, c_h=np.sqrt(9.81 * 1000.0))
    grid = ocean_box_grid(problem, 3, 3, 3, 3, dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux0 = init_ode_state(dg)
    assert bool(jnp.all(jnp.isfinite(q0)))

    # gravity wave speed limits dt
    c = float(np.sqrt(9.81 * 1000.0))
    dt = 0.2 * min_node_distance(grid, "horizontal") / c
    solver = LSRK144NiegemannDiehlBusch(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, aux, t = q0, aux0, 0.0
    for _ in range(20):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    theta = model.prog(q, "theta")
    assert float(jnp.min(theta)) > -1.0 and float(jnp.max(theta)) < 20.0
    # w at the bottom is ~0 (integral starts at bottom)
    w = model.aux_get(aux, "w")
    cols = ColumnOps(grid)
    wb = cols.to_stack(w[..., None])[:, 0, 0]
    assert float(jnp.max(jnp.abs(wb))) < 1e-10
