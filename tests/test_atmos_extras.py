"""Atmos extras: viscous sponge, drag/bulk surface BCs, precipitation
(reference multiphysics + bc_* + sponge tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.boundaryconditions import (AtmosBC,
                                                         BulkFormulaEnergy,
                                                         DragLaw,
                                                         Impenetrable,
                                                         Insulating)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.moisture import EquilMoist
from climatemachine_tpu.atmos.precipitation import (RainModel,
                                                    RemovePrecipitation,
                                                    WarmRain1M)
from climatemachine_tpu.common.turbulence import (ConstantKinematicViscosity,
                                                  SmagorinskyLilly,
                                                  UpperAtmosSponge)
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import DryAdiabaticProfile


def _grid(L=1000.0, n=3, nz=4, poly=3):
    r = [np.linspace(0, L, n + 1)] * 2 + [np.linspace(0, L, nz + 1)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    return make_grid(topo, poly, dtype=np.float64)


def test_drag_law_decelerates_wind():
    ps = EARTH
    grid = _grid()
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0),
        viscoussponge=UpperAtmosSponge(z_max=1000.0, z_sponge=800.0))

    def init(m, coords, aux, t):
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        u = jnp.full_like(rho, 5.0)
        q = m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T) + Phi + 0.5 * 25.0)},
            batch_shape=rho.shape)
        return m.prog_spec.set(
            q, "rhou", jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    bcs = (AtmosBC(momentum=Impenetrable(DragLaw(C_drag=0.01))),
           AtmosBC())
    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=bcs),
                       sources=(Gravity(),))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    mom0 = float(weightedsum(grid, q0, model.prog_spec.index("rhou").start))
    mom1 = float(weightedsum(grid, q, model.prog_spec.index("rhou").start))
    assert mom1 < mom0  # drag removes x-momentum


def test_bulk_energy_flux_heats_from_warm_surface():
    ps = EARTH
    grid = _grid()
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0))

    def init(m, coords, aux, t):
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        u = jnp.full_like(rho, 5.0)
        q = m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T) + Phi + 12.5)},
            batch_shape=rho.shape)
        return m.prog_spec.set(
            q, "rhou", jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    bcs = (AtmosBC(energy=BulkFormulaEnergy(C_h=0.01, T_sfc=320.0)),
           AtmosBC())
    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=bcs),
                       sources=(Gravity(),))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    e0 = float(weightedsum(grid, q0, model.prog_spec.index("rhoe").start))
    e1 = float(weightedsum(grid, q, model.prog_spec.index("rhoe").start))
    assert e1 > e0  # warm surface heats the column


def test_rain_model_precipitates():
    """Supersaturated moist column with WarmRain1M: rain forms and falls;
    total water (vapor+cloud+rain) only changes by sedimentation out."""
    ps = EARTH
    grid = _grid(nz=4, poly=3)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0),
        moisture=EquilMoist(),
        precipitation=RainModel())

    def init(m, coords, aux, t):
        z = coords[..., 2]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 290.0 * (p / ps.MSLP) ** ps.kappa_d
        q_tot = jnp.where(z < 500.0, 0.025, 1e-4)   # supersaturated below
        pp = td.PhasePartition.vapor(q_tot)
        rho = p / (td.gas_constant_air(ps, pp) * T)
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T, pp) + Phi),
             "moisture.rhoq_tot": rho * q_tot},
            batch_shape=rho.shape)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())),
                       sources=(Gravity(), WarmRain1M()))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    # saturation adjustment created condensate
    ql = model.aux_get(aux, "moisture.q_liq")
    assert float(jnp.max(ql)) > 1e-4

    dt = 0.25 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(80):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    q_rai = model.prog(q, "precipitation.rhoq_rai")
    assert float(jnp.max(q_rai)) > 0.0  # rain formed


def test_remove_precipitation_sink():
    ps = EARTH
    grid = _grid(nz=3, poly=3)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        moisture=EquilMoist())

    def init(m, coords, aux, t):
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 285.0 * (p / ps.MSLP) ** ps.kappa_d
        q_tot = jnp.full_like(p, 0.03)
        pp = td.PhasePartition.vapor(q_tot)
        rho = p / (td.gas_constant_air(ps, pp) * T)
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T, pp) + Phi),
             "moisture.rhoq_tot": rho * q_tot},
            batch_shape=rho.shape)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())),
                       sources=(Gravity(), RemovePrecipitation(tau=200.0)))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 0.25 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(60):
        q, aux = step(q, aux, t)
        t += dt
    sl = model.prog_spec.index("moisture.rhoq_tot").start
    m0 = float(weightedsum(grid, q0, sl))
    m1 = float(weightedsum(grid, q, sl))
    assert m1 < m0  # precipitation removed water
    assert bool(jnp.all(jnp.isfinite(q)))


def test_rain_snow_model():
    """Cold supersaturated column with RainSnow1M: snow forms aloft in
    sub-freezing air, rain in warm air; everything finite and bounded
    (reference RainSnowModel + rain_snow_sources)."""
    from climatemachine_tpu.atmos.precipitation import (RainSnow1M,
                                                       RainSnowModel)
    ps = EARTH
    grid = _grid(nz=4, poly=3)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(285.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0),
        moisture=EquilMoist(),
        precipitation=RainSnowModel())

    def init(m, coords, aux, t):
        z = coords[..., 2]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        # cold aloft (below freezing even after latent-heat release)
        T = 270.0 - 0.009 * z
        q_tot = jnp.where(z > 300.0, 0.003, 5e-4)
        pp = td.PhasePartition.vapor(q_tot)
        rho = p / (td.gas_constant_air(ps, pp) * T)
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T, pp) + Phi),
             "moisture.rhoq_tot": rho * q_tot},
            batch_shape=rho.shape)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())),
                       sources=(Gravity(), RainSnow1M()))
    assert model.prog_spec.num == 5 + 1 + 2
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    # sub-freezing condensate exists -> ice present aloft
    qi = model.aux_get(aux, "moisture.q_ice")
    assert float(jnp.max(qi)) > 1e-5

    dt = 0.25 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(80):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    q_sno = model.prog(q, "precipitation.rhoq_sno")
    q_rai = model.prog(q, "precipitation.rhoq_rai")
    assert float(jnp.max(q_sno)) > 0.0   # snow formed in cold air
    assert float(jnp.max(q_sno)) < 0.05
    assert float(jnp.max(jnp.abs(q_rai))) < 0.05


def test_theta_model_bubble():
    """θ-energy formulation (reference energy.jl θModel): rising bubble
    with prognostic ρθ; both mass and ρθ are conserved to round-off
    (pure advection — no pressure-work term in the θ equation)."""
    from climatemachine_tpu.atmos.energy import ThetaModel
    from climatemachine_tpu.dg.reductions import weightedsum
    ps = EARTH
    grid = _grid(nz=4, poly=4)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        energy=ThetaModel())

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        p = m.aux_spec.get(aux, "ref_state.p")
        r = jnp.sqrt((x - 500.0) ** 2 + (z - 300.0) ** 2)
        thp = 2.0 * jnp.clip(1 - r / 200.0, 0.0, 1.0)
        theta = 300.0 + thp
        T = theta * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        return m.prog_spec.pack({"rho": rho, "rhoe": rho * theta},
                                batch_shape=rho.shape)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())),
                       sources=(Gravity(),))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    # thermo closed form is consistent: recompute T from (rho, rhotheta)
    T, p, _ = model.recover_thermo(q0, aux)
    pref = model.aux_get(aux, "ref_state.p")
    assert float(jnp.max(jnp.abs(p - pref) / pref)) < 5e-3

    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(150):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    w = model.prog(q, "rhou")[..., 2] / model.prog(q, "rho")
    assert float(jnp.max(w)) > 0.05          # bubble rising
    for sl_name in ["rho", "rhoe"]:
        sl = model.prog_spec.index(sl_name).start
        m0 = float(weightedsum(grid, q0, sl))
        m1 = float(weightedsum(grid, q, sl))
        assert abs(m1 - m0) / abs(m0) < 1e-12, sl_name


def test_anelastic1d():
    """Anelastic1D compressibility (reference AtmosModel.jl:322,
    projections.jl, thermo_states_anelastic.jl): density pinned to the
    reference profile, no vertical momentum tendencies, reference-pressure
    thermodynamics, and no acoustic CFL restriction (dt >> explicit
    acoustic limit stays stable)."""
    from climatemachine_tpu.atmos.compressibility import Anelastic1D
    ps = EARTH
    grid = _grid(nz=4, poly=4)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(1.0),
        compressibility=Anelastic1D())

    def init(m, coords, aux, t):
        x = coords[..., 0]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d \
            + 0.5 * jnp.sin(2 * np.pi * x / 1000.0)
        rho = jnp.ones_like(p)      # overwritten with rho_ref by the model
        u = 2.0 * jnp.cos(2 * np.pi * x / 1000.0)
        q = m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T) + Phi
                            + 0.5 * u ** 2)},
            batch_shape=rho.shape)
        return m.prog_spec.set(
            q, "rhou", jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())),
                       sources=(Gravity(),))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    # rho slot was forced to the reference profile
    rho_ref = model.aux_get(aux, "ref_state.rho")
    np.testing.assert_allclose(np.asarray(model.prog(q0, "rho")),
                               np.asarray(rho_ref), rtol=1e-14)
    # thermo pressure is the reference pressure
    _, p, _ = model.recover_thermo(q0, aux)
    np.testing.assert_allclose(np.asarray(p),
                               np.asarray(model.aux_get(aux, "ref_state.p")),
                               rtol=1e-14)

    # dt set by the ADVECTIVE speed only (2 m/s), ~100x the acoustic limit
    dt = 0.2 * min_node_distance(grid) / 4.0
    assert dt > 10 * min_node_distance(grid) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(60):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    # density exactly constant in time; vertical momentum never develops
    np.testing.assert_allclose(np.asarray(model.prog(q, "rho")),
                               np.asarray(rho_ref), rtol=1e-13)
    w = model.prog(q, "rhou")[..., 2]
    assert float(jnp.max(jnp.abs(w))) < 1e-10
    # horizontal kinetic energy decays under viscosity
    ke0 = float(jnp.sum(model.prog(q0, "rhou")[..., 0] ** 2))
    ke1 = float(jnp.sum(model.prog(q, "rhou")[..., 0] ** 2))
    assert ke1 < ke0


def test_hadgem_lsforcing():
    """HadGEMVertical large-scale forcing (reference lsforcing.jl + cfsite
    AMIP sources): aux profiles are filled; LargeScaleProcess heats at
    rho*cvm*(Sigma_temp + w_s dT/dz); LinearSponge relaxes winds to the
    GCM profile aloft."""
    from climatemachine_tpu.atmos.lsforcing import (HadGEMVertical,
                                                    LargeScaleProcess,
                                                    LargeScaleSubsidence,
                                                    LinearSponge)
    ps = EARTH
    grid = _grid(L=1000.0, nz=4, poly=3)
    dTdt, wsub = 2e-4, -0.02
    dTdz = -0.005

    def profile(z):
        zero = jnp.zeros_like(z)
        return dict(ta=300.0 + dTdz * z, hus=zero + 0.008,
                    ua=zero + 3.0, va=zero - 1.0,
                    temp_tendency=zero + dTdt, qt_tendency=zero + 1e-7,
                    w_s=zero + wsub)

    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0),
        moisture=EquilMoist(),
        lsforcing=HadGEMVertical(profile))

    def init(m, coords, aux, t):
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T) + Phi),
             "moisture.rhoq_tot": rho * 0.0},
            batch_shape=rho.shape)

    model = AtmosModel(
        physics,
        AtmosProblem(init_state=init,
                     boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=(Gravity(), LargeScaleProcess(), LargeScaleSubsidence(),
                 LinearSponge(z_max=1000.0, z_sponge=600.0,
                              alpha_max=1.0)))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    # aux profiles filled
    z = model.aux_get(aux, "orientation.Phi") / ps.grav
    np.testing.assert_allclose(np.asarray(model.aux_get(aux, "lsforcing.ta")),
                               300.0 + dTdz * np.asarray(z), rtol=1e-12)

    # one RHS: energy tendency in the interior ~ rho*cvm*(dTdt + w_s dT/dz)
    # (+ small moisture terms); check sign and magnitude at a mid node
    tend, _ = dg(q0, aux, 0.0)
    rho = np.asarray(model.prog(q0, "rho"))
    te = np.asarray(model.prog_spec.get(tend, "rhoe"))
    expect = rho * (ps.cv_d * (dTdt + wsub * dTdz) + ps.e_int_v0 * 1e-7)
    mid = np.asarray(z) > 100.0
    ratio = te[mid] / expect[mid]
    assert 0.8 < np.median(ratio) < 1.2

    # sponge: uniform initial wind relaxes toward (ua, va) aloft
    q1 = model.prog_spec.set(
        q0, "rhou", jnp.stack([rho * 0.0, rho * 0.0, rho * 0.0], -1))
    tend1, _ = dg(q1, aux, 0.0)
    tm = np.asarray(model.prog_spec.get(tend1, "rhou"))
    hi = np.asarray(z) > 900.0
    lo = np.asarray(z) < 200.0
    assert (tm[hi][:, 0] > 1e-3).all()      # pushed toward ua=+3
    assert (tm[hi][:, 1] < -1e-4).all()     # toward va=-1
    assert np.abs(tm[lo][:, :2]).max() < 1e-3 * np.abs(tm[hi][:, :2]).max() + 1e-12


def test_bulk_formula_moisture_bc():
    """BulkFormulaMoisture surface BC (reference bc_moisture.jl): a moist
    surface (q_sfc > q_int) under wind moistens the domain; total water
    gained matches the bulk flux sign; mass flux accompanies it."""
    from climatemachine_tpu.atmos.boundaryconditions import (
        BulkFormulaMoisture, FreeSlip, Impenetrable)
    ps = EARTH
    grid = _grid(nz=3, poly=3)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0),
        moisture=EquilMoist())

    def init(m, coords, aux, t):
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        u = jnp.full_like(rho, 5.0)
        q = m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T) + Phi + 0.5 * 25.0),
             "moisture.rhoq_tot": rho * 1e-3},
            batch_shape=rho.shape)
        return m.prog_spec.set(
            q, "rhou", jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    bcs = (AtmosBC(momentum=Impenetrable(FreeSlip()),
                   moisture=BulkFormulaMoisture(C_q=1e-2, q_tot_sfc=0.01)),
           AtmosBC())
    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=bcs),
                       sources=())
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    sl = model.prog_spec.index("moisture.rhoq_tot").start
    w0 = float(weightedsum(grid, q0, sl))
    m0 = float(weightedsum(grid, q0, 0))
    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    w1 = float(weightedsum(grid, q, sl))
    m1 = float(weightedsum(grid, q, 0))
    assert bool(jnp.all(jnp.isfinite(q)))
    assert w1 > w0          # evaporation moistens the column
    assert m1 > m0          # total-water mass flux enters continuity
    # magnitude sanity: flux ~ C_q rho |u| dq * area * t
    expect = 1e-2 * 1.1 * 5.0 * 9e-3 * 1000.0 * 1000.0 * t
    assert 0.2 * expect < (w1 - w0) < 3.0 * expect
