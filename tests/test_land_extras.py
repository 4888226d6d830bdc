"""Land extensions: freeze/thaw, runoff BCs, radiative BCs, overland flow
(reference src/Land/Model/{source.jl, Runoff.jl, RadiativeEnergyFlux.jl,
SurfaceFlow.jl})."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.land import (LandModel, SoilHeatModel, SoilModel,
                                     SoilWaterModel, SoilParams,
                                     vanGenuchten)
from climatemachine_tpu.land.model import Dirichlet, LandBC, Neumann
from climatemachine_tpu.land import soil_params as sp
from climatemachine_tpu.land.sources import (CoarseGridRunoff, PhaseChange,
                                             RadiativeEnergyFlux,
                                             SurfaceRunoffBC)
from climatemachine_tpu.land.surface_flow import OverlandFlowModel
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import (brick_topology,
                                              single_stack_topology)
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def _stack_grid(zmax=1.0, nz=5, poly=4):
    topo = single_stack_topology(1.0, 1.0, np.linspace(0, zmax, nz + 1))
    return make_grid(topo, poly, dtype=np.float64)


def test_freeze_thaw_phase_change():
    """Sub-freezing wet soil: liquid freezes into ice; total water mass
    ρ_l ϑ_l + ρ_i θ_i is conserved by the transfer; temperature recovery
    includes the latent term."""
    params = SoilParams()
    hyd = vanGenuchten()

    # sub-freezing with a vertical gradient: the phase-change timescale
    # tau_pt ~ 1/|grad T| (reference :280) needs a thermal gradient
    def init_T(c, t):
        return 268.0 + 4.0 * c[..., 2]

    soil = SoilModel(
        params=params,
        water=SoilWaterModel(hydraulics=hyd,
                             initial_vartheta=lambda c, t:
                             jnp.full(c.shape[:-1], 0.33)),
        heat=SoilHeatModel(initial_T=init_T,
                           T_ref=273.16, coupled_properties=True))
    model = LandModel(soil, sources=(PhaseChange(dz=0.02),))
    grid = _stack_grid()
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    T0 = model.temperature(q0)
    assert float(jnp.max(jnp.abs(T0 - init_T(grid.coords, 0.0)))) < 1e-6

    dt = 20.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(400):
        q, aux = step(q, aux, t)
        t += dt
    th_l = model.prog(q, "vartheta_l")
    th_i = model.prog(q, "theta_i")
    assert float(jnp.max(th_i)) > 1e-3, "ice formed"
    assert float(jnp.min(th_l)) < 0.32, "liquid consumed somewhere"
    # column-integrated water mass ρ_l ϑ_l + ρ_i θ_i is conserved (the
    # transfer conserves it pointwise; Richards transport redistributes
    # liquid toward the freezing front but not through the no-flux walls)
    M = grid.M
    mass0 = float(jnp.sum(M * params.rho_liq * 0.33))
    mass = float(jnp.sum(M * (params.rho_liq * th_l
                              + params.rho_ice * th_i)))
    assert abs(mass - mass0) / mass0 < 1e-4
    # freezing releases latent heat; T stays near/below freezing
    T = model.temperature(q)
    assert float(jnp.min(T)) > 267.0
    assert float(jnp.max(T)) < params.T_freeze + 1.0


def test_runoff_limits_infiltration():
    """CoarseGridRunoff caps the surface water flux at the infiltration
    capacity: heavy precip adds water no faster than i_c."""
    params = SoilParams(Ksat=1e-6)
    hyd = vanGenuchten()

    def init_v(c, t):
        return jnp.full(c.shape[:-1], 0.2)

    heavy_rain = 1e-3          # m/s >> Ksat
    bc_top = LandBC(water=Neumann(
        SurfaceRunoffBC(precip=lambda t: heavy_rain,
                        runoff=CoarseGridRunoff(dz=0.1))))
    soil = SoilModel(params=params,
                     water=SoilWaterModel(hydraulics=hyd,
                                          initial_vartheta=init_v))
    model = LandModel(soil, boundary_conditions=(LandBC(), bc_top))
    for bc in model.bcs:
        if isinstance(getattr(bc.water, "value", None), SurfaceRunoffBC):
            bc.water.value.bind(model)
    grid = _stack_grid(zmax=0.5, nz=4, poly=3)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 1.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(300):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    # infiltrated volume << incident P*t (the rest ran off);
    # with NoRunoff the full P*t would have entered (and oversaturated)
    dV = float(jnp.sum(grid.M * (model.prog(q, "vartheta_l") - 0.2)))
    area = 1.0  # unit horizontal cross-section of the stack
    assert 0.0 < dV < 0.2 * heavy_rain * t * area, dV
    assert float(jnp.max(model.prog(q, "vartheta_l"))) \
        < params.porosity + 1e-3


def test_radiative_energy_flux_warms_surface():
    params = SoilParams()
    soil = SoilModel(params=params, water=None,
                     heat=SoilHeatModel(initial_T=lambda c, t:
                                        jnp.full(c.shape[:-1], 280.0)))
    bc_top = LandBC(heat=Neumann(
        RadiativeEnergyFlux(sw_down=lambda t: 300.0,
                            lw_down=lambda t: 350.0)))
    model = LandModel(soil, boundary_conditions=(LandBC(), bc_top))
    for bc in model.bcs:
        if isinstance(getattr(bc.heat, "value", None), RadiativeEnergyFlux):
            bc.heat.value.bind(model)
    grid = _stack_grid()
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 4.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(200):
        q, aux = step(q, aux, t)
        t += dt
    T = model.temperature(q)
    # net flux at 280 K: 0.8*300 + 0.98*(350 - sigma*280^4) > 0 -> warming
    assert float(jnp.mean(T)) > 280.0
    assert float(jnp.max(T)) < 320.0


def test_overland_flow_steady_state():
    """Uniform rain on a uniform slope reaches the analytic kinematic
    equilibrium at the outlet region: q_out = P·L, h_eq = (n P L /
    √S)^{3/5} (reference SurfaceFlow.jl analytic test)."""
    P, S, n_man, L = 5e-6, 0.01, 0.03, 100.0
    r = [np.linspace(0, L, 6), np.linspace(0, 10.0, 2)]
    topo = brick_topology(r, periodicity=(False, True),
                          boundary=np.array([[1, 2], [0, 0]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    model = OverlandFlowModel(
        slope=lambda x, y: (jnp.full_like(x, -S), jnp.zeros_like(x)),
        mannings=lambda x, y: n_man,
        precip=lambda x, y, t: jnp.full_like(x, P),
        ncoord=2)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    h_eq = (n_man * P * L / np.sqrt(S)) ** 0.6
    v_eq = h_eq ** (2.0 / 3.0) * np.sqrt(S) / n_man
    dt = 0.25 * min_node_distance(grid) / max(v_eq * 5 / 3, 1e-3)
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    # run to ~3x the concentration time L/v
    nsteps = int(3 * L / v_eq / dt)
    for _ in range(min(nsteps, 4000)):
        q, aux = step(q, aux, t)
        t += dt
    h = q[..., 0]
    x = grid.coords[..., 0]
    assert bool(jnp.all(jnp.isfinite(q)))
    # steady kinematic profile h(x) = (n P x / sqrt(S))^{3/5}
    h_exact = (n_man * P * jnp.maximum(x, 1e-6) / np.sqrt(S)) ** 0.6
    mask = (x > 0.3 * L) & (x < 0.9 * L)
    rel = jnp.where(mask, jnp.abs(h - h_exact) / h_exact, 0.0)
    assert float(jnp.max(rel)) < 0.2, float(jnp.max(rel))
    h_outlet = float(jnp.max(jnp.where(x > 0.95 * L, h, 0.0)))
    assert abs(h_outlet - h_eq) / h_eq < 0.3, (h_outlet, h_eq)
