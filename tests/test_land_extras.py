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


def test_stefan_neumann_analytic():
    """Freezing front vs the Neumann (Stefan) analytic solution.

    Reference tutorials/Land/Soil/PhaseChange/phase_change_analytic_test.jl:
    semi-infinite soil column at T_i = 2 C, surface clamped to
    T_s = -10 C, no water movement (Ksat = 0); the freezing front
    propagates as z_f(t) = 2 zeta sqrt(d1 t) with zeta the root of the
    classical two-phase implicit equation (Dall'Amico 2011), and the
    frozen-region profile follows erf(|z| / 2 sqrt(d1 t)) / erf(zeta).

    The two-region thermal properties (lambda_1/c_1 frozen with all
    water as ice, lambda_2/c_2 unfrozen) are evaluated with THIS
    framework's constitutive laws (simplified Kersten K_e = S_r), so the
    comparison validates the coupled heat + phase-change PDE solve, not
    the conductivity fit.  Soil composition matches the reference
    (porosity 0.535, rho c_ds = (1-nu)*2.3e6, kappa_sat values from its
    quartz/minerals/om blend).

    Known model-vs-analytic bias, same as the reference documents: the
    Clapeyron theta*(T) leaves ~10-15% residual liquid near the front,
    so less latent heat is released and the simulated front runs ~0.12 m
    deeper at day 20 (analytic 0.64 m).  Gates are set at that measured
    envelope with ~30% margin; an energy/latent/conductivity error
    produces O(1 m / several K) violations.
    """
    import math

    params = SoilParams(porosity=0.535, Ksat=0.0, S_s=1e-3, theta_r=0.0,
                        rho_c_soil=(1 - 0.535) * 2.3e6, kappa_dry=0.20,
                        kappa_sat_unfrozen=1.016, kappa_sat_frozen=2.138)
    th_l0 = 0.33
    Ts, Ti = -10.0, 2.0
    th_i1 = th_l0 * params.rho_liq / params.rho_ice
    lam1 = float(sp.thermal_conductivity(params, jnp.array(0.0),
                                         jnp.array(th_i1)))
    c1 = float(sp.volumetric_heat_capacity(params, jnp.array(0.0),
                                           jnp.array(th_i1)))
    lam2 = float(sp.thermal_conductivity(params, jnp.array(th_l0),
                                         jnp.array(0.0)))
    c2 = float(sp.volumetric_heat_capacity(params, jnp.array(th_l0),
                                           jnp.array(0.0)))
    d1, d2 = lam1 / c1, lam2 / c2

    def implicit(z):
        t1 = math.exp(-z * z) / z / math.erf(z)
        t2 = -lam2 * math.sqrt(d1) * (Ti - 0.0) / (
            lam1 * math.sqrt(d2) * (0.0 - Ts) * z
            * math.erfc(z * math.sqrt(d1 / d2))) * math.exp(-d1 / d2 * z * z)
        t3 = (-params.LH_f0 * params.rho_liq * th_l0 * math.sqrt(math.pi)
              / c1 / (0.0 - Ts))
        return t1 + t2 + t3

    a, b = 0.05, 1.5
    assert implicit(a) * implicit(b) < 0
    for _ in range(100):
        m = 0.5 * (a + b)
        if implicit(a) * implicit(m) <= 0:
            b = m
        else:
            a = m
    zeta = 0.5 * (a + b)
    assert 0.2 < zeta < 0.35, zeta      # reference root 0.2645 for its fit

    zmin, nelem = -3.0, 40
    topo = single_stack_topology(1.0, 1.0, np.linspace(zmin, 0.0, nelem + 1))
    grid = make_grid(topo, 1, dtype=np.float64)
    soil = SoilModel(
        params=params,
        water=SoilWaterModel(hydraulics=vanGenuchten(alpha=1.11, n=1.48),
                             initial_vartheta=lambda c, t:
                             jnp.full(c.shape[:-1], th_l0)),
        heat=SoilHeatModel(initial_T=lambda c, t:
                           jnp.full(c.shape[:-1], 275.15),
                           T_ref=273.16, coupled_properties=True))
    model = LandModel(soil,
                      boundary_conditions=(LandBC(),
                                           LandBC(heat=Dirichlet(263.15))),
                      sources=(PhaseChange(dz=abs(zmin) / nelem),))
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    dt = 100.0
    t_end = 3600.0 * 24 * 20          # 20 days, like the reference
    solver = LSRK54CarpenterKennedy(lambda a_, b_, t: dg(a_, b_, t), dt)
    step = jax.jit(solver.step)
    t = 0.0
    for _ in range(int(t_end / dt)):
        q, aux = step(q, aux, t)
        t += dt

    T = np.asarray(model.temperature(q)).ravel()
    z = np.asarray(grid.coords[..., 2]).ravel()
    o = np.argsort(z)
    zu, idx = np.unique(np.round(z[o], 9), return_index=True)
    Tu = T[o][idx]
    depth = -zu
    Tf = params.T_freeze

    zf_ana = 2.0 * zeta * math.sqrt(d1 * t)
    zf_sim = None
    for i in range(len(zu) - 1, 0, -1):
        if (Tu[i] - Tf) * (Tu[i - 1] - Tf) < 0:
            frac = (Tf - Tu[i]) / (Tu[i - 1] - Tu[i])
            zf_sim = depth[i] + frac * (depth[i - 1] - depth[i])
            break
    assert zf_sim is not None, "no freezing front formed"
    # front position: sqrt(t) propagation with the analytic constant
    assert abs(zf_sim - zf_ana) < 0.16, (zf_sim, zf_ana)

    erf = np.vectorize(math.erf)
    erfc = np.vectorize(math.erfc)
    T_ana = np.where(
        depth < zf_ana,
        Ts + (0.0 - Ts) * erf(depth / (2 * math.sqrt(d1 * t)))
        / math.erf(zeta),
        Ti - Ti * erfc(depth / (2 * math.sqrt(d2 * t)))
        / math.erfc(zeta * math.sqrt(d1 / d2))) + 273.15
    frozen = depth <= zf_ana
    err_frozen = np.abs(Tu - T_ana)[frozen]
    assert float(err_frozen.max()) < 1.6, float(err_frozen.max())
    # far field still at the initial temperature
    assert abs(Tu[0] - 275.15) < 0.05
    # most of the water behind the front is frozen
    th_i = np.asarray(model.prog(q, "theta_i")).ravel()[o][idx]
    near_surface = depth < zf_ana * 0.5
    assert float(th_i[near_surface].max()) > 0.3
    assert float(th_i[near_surface].min()) > 0.15
