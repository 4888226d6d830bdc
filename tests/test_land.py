"""Land model tests: soil heat diffusion vs analytic decay, Richards
hydrostatic equilibrium (reference test/Land/Model)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.land import (LandModel, SoilHeatModel, SoilModel,
                                     SoilWaterModel, SoilParams,
                                     vanGenuchten)
from climatemachine_tpu.land.model import Dirichlet, LandBC, Neumann
from climatemachine_tpu.land import soil_params as sp
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import single_stack_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def _stack_grid(zmax=1.0, nz=5, poly=4):
    topo = single_stack_topology(1.0, 1.0, np.linspace(0, zmax, nz + 1))
    return make_grid(topo, poly, dtype=np.float64)


def test_soil_heat_diffusion_decay():
    """∂T/∂t = (κ/ρc) ∂²T/∂z² with insulated ends: sine mode decays at
    exp(-D k² t)."""
    params = SoilParams()
    soil = SoilModel(params=params, water=None,
                     heat=SoilHeatModel(
                         initial_T=lambda c, t:
                         288.0 + jnp.cos(np.pi * c[..., 2])))
    model = LandModel(soil, boundary_conditions=(LandBC(), LandBC()))
    grid = _stack_grid()
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    D = params.kappa_soil / params.rho_c_soil
    k = np.pi
    dt = 4.0
    nsteps = 200
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    T = model.temperature(q)
    z = grid.coords[..., 2]
    expected = 288.0 + np.exp(-D * k ** 2 * t) * jnp.cos(k * z)
    assert float(jnp.max(jnp.abs(T - expected))) < 2e-4


def test_richards_hydrostatic_equilibrium():
    """h = ψ + z = const is a steady state of the Richards equation."""
    params = SoilParams()
    hyd = vanGenuchten()

    def init_v(coords, t):
        z = coords[..., 2]
        psi = -z - 0.5                  # h = -0.5 everywhere
        S = hyd.inverse_matric_potential(psi)
        return params.theta_r + S * (params.porosity - params.theta_r)

    soil = SoilModel(params=params,
                     water=SoilWaterModel(hydraulics=hyd,
                                          initial_vartheta=init_v))
    model = LandModel(soil)
    grid = _stack_grid()
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    tend, _ = dg(q0, aux, 0.0)
    v = model.prog(q0, "vartheta_l")
    # h is exactly constant -> K∇h = 0 -> tendency ~ 0
    assert float(jnp.max(jnp.abs(tend))) < 1e-10

    # short integration stays at equilibrium
    dt = 20.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    drift = float(jnp.max(jnp.abs(model.prog(q, "vartheta_l") - v)))
    assert drift < 1e-10


def test_richards_infiltration_bounded():
    """Dirichlet wet top + drier column: water infiltrates downward and
    stays within physical bounds."""
    params = SoilParams()
    hyd = vanGenuchten()
    v0 = 0.2

    soil = SoilModel(params=params,
                     water=SoilWaterModel(
                         hydraulics=hyd,
                         initial_vartheta=lambda c, t:
                         jnp.full_like(c[..., 2], v0)))
    bcs = (LandBC(water=None),                      # bottom: free drainage off
           LandBC(water=Dirichlet(0.38)))           # top: near-saturated
    model = LandModel(soil, boundary_conditions=bcs)
    grid = _stack_grid(zmax=0.5, nz=4, poly=3)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 1.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(400):
        q, aux = step(q, aux, t)
        t += dt
    v = model.prog(q, "vartheta_l")
    assert bool(jnp.all(jnp.isfinite(v)))
    assert float(jnp.min(v)) > params.theta_r
    assert float(jnp.max(v)) < params.porosity + 1e-6
    # top of column wetter than initial
    z = grid.coords[..., 2]
    top_mask = z > 0.4
    assert float(jnp.max(jnp.where(top_mask, v, 0.0))) > v0 + 0.05


def test_multicolumn_land_configuration():
    """MultiColumnLandModel driver config (reference driver_configs.jl:659):
    multi-column soil heat diffusion matches the single-stack analytic
    decay in every column."""
    from climatemachine_tpu.driver.configs import (
        MultiColumnLandModelConfiguration, MultiColumnLandConfigType)
    params = SoilParams()
    soil = SoilModel(params=params, water=None,
                     heat=SoilHeatModel(
                         initial_T=lambda c, t:
                         288.0 + jnp.cos(np.pi * c[..., 2])))
    model = LandModel(soil,
                      boundary_conditions=tuple(LandBC() for _ in range(6)))
    cfg = MultiColumnLandModelConfiguration(
        "mcland", 4, (0.5, 0.5, 0.2), 1.0, 1.0, 1.0, model,
        dtype=np.float64)
    assert isinstance(cfg.config_type, MultiColumnLandConfigType)
    grid = cfg.grid
    assert grid.n_vert is not None          # stacked (columns on-device)

    dg = DGModel(model, grid,
                 numerical_flux_first_order=cfg.numerical_flux_first_order)
    q0, aux = init_ode_state(dg)
    D = params.kappa_soil / params.rho_c_soil
    dt, nsteps = 4.0, 100
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    z = np.asarray(grid.coords[..., 2])
    T = np.asarray(model.temperature(q))
    expect = 288.0 + np.exp(-D * np.pi ** 2 * t) * np.cos(np.pi * z)
    np.testing.assert_allclose(T, expect, atol=2e-3)
