"""Dry atmosphere model tests: profile consistency, hydrostatic balance,
rising thermal bubble (the reference's minimum end-to-end slice,
tutorials/Atmos/risingbubble.jl; hydrostatic balance mirrors
test/Atmos/Model balance checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import (AtmosBC, FreeSlip,
                                                         Impenetrable)
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile, DryAdiabaticProfile, IsothermalProfile)


@pytest.mark.parametrize("profile", [
    IsothermalProfile(280.0),
    DecayingTemperatureProfile(290.0, 220.0),
    DryAdiabaticProfile(300.0, 230.0),
])
def test_profile_hydrostatic_consistency(profile):
    """dp/dz == -g p / (R_d T_v) for every analytic profile."""
    z = jnp.linspace(100.0, 25e3, 2001)
    Tv, p = profile(EARTH, z)
    dz = z[1] - z[0]
    dpdz = (p[2:] - p[:-2]) / (2 * dz)
    rhs = -EARTH.grav * p[1:-1] / (EARTH.R_d * Tv[1:-1])
    # exclude the lapse->isothermal kink region for the adiabatic profile
    mask = jnp.ones_like(rhs, dtype=bool)
    if isinstance(profile, DryAdiabaticProfile):
        z_t = (profile.T_surface - profile.T_min_ref) * EARTH.cp_d / EARTH.grav
        mask = jnp.abs(z[1:-1] - z_t) > 200.0
    err = jnp.max(jnp.abs((dpdz - rhs) / rhs) * mask)
    assert err < 1e-5


def _box_model(nx=3, nz=4, poly=4, Lx=1000.0, Lz=1000.0,
               profile=None, sources=(Gravity(),)):
    ranges = [np.linspace(0, Lx, nx + 1), np.linspace(0, Lx, nx + 1),
              np.linspace(0, Lz, nz + 1)]
    topo = stacked_brick_topology(
        ranges, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, poly, dtype=np.float64)
    profile = profile or DecayingTemperatureProfile(290.0, 220.0)
    physics = AtmosPhysics(ref_state=HydrostaticState(profile))

    def init_from_ref(model, coords, aux, t):
        s = model.aux_spec
        rho = s.get(aux, "ref_state.rho")
        rhoe = s.get(aux, "ref_state.rhoe")
        return model.prog_spec.pack(
            {"rho": rho, "rhoe": rhoe}, batch_shape=rho.shape)

    problem = AtmosProblem(
        init_state=init_from_ref,
        boundary_conditions=(AtmosBC(momentum=Impenetrable(FreeSlip())),
                             AtmosBC(momentum=Impenetrable(FreeSlip()))))
    model = AtmosModel(physics, problem, sources=sources)
    return model, grid


def test_hydrostatic_balance():
    """State == reference state must be an exact discrete steady state
    (subtract_off makes pressure flux and gravity source vanish)."""
    model, grid = _box_model()
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    tend, _ = dg(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(q)))
    assert float(jnp.max(jnp.abs(tend))) < 1e-8 * scale


def test_rising_bubble():
    """Dry rising thermal bubble (reference tutorials/Atmos/risingbubble.jl):
    warm perturbation rises; mass is conserved."""
    ps = EARTH
    theta0, dtheta = 300.0, 2.0
    Lx, Lz = 1000.0, 1000.0
    xc, zc, rc = Lx / 2, 300.0, 200.0

    model, grid = _box_model(nx=4, nz=4, poly=4, Lx=Lx, Lz=Lz,
                             profile=DryAdiabaticProfile(theta0, 110.0))

    def init_bubble(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        r = jnp.sqrt((x - xc) ** 2 + (z - zc) ** 2)
        theta_p = dtheta * jnp.clip(1 - r / rc, 0.0, 1.0)
        # background: dry adiabatic (theta = theta0), perturb theta at fixed p
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        exner = (p / ps.MSLP) ** ps.kappa_d
        T = (theta0 + theta_p) * exner
        rho = p / (ps.R_d * T)
        rhoe = rho * (td.internal_energy(ps, T) + Phi)
        return m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                                batch_shape=rho.shape)

    model.problem = AtmosProblem(init_state=init_bubble,
                                 boundary_conditions=model.problem.boundary_conditions)

    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    c_max = float(jnp.sqrt(1.4 * ps.R_d * 310.0))
    dt = 0.4 * min_node_distance(grid) / c_max
    solver = LSRK54CarpenterKennedy(lambda q, a, t: dg(q, a, t), dt)

    import jax
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(100):
        q, aux = step(q, aux, t)
        t += dt

    assert bool(jnp.all(jnp.isfinite(q)))
    mass0 = float(weightedsum(grid, q0, model.prog_spec.index("rho").start))
    mass1 = float(weightedsum(grid, q, model.prog_spec.index("rho").start))
    assert abs(mass1 - mass0) / mass0 < 1e-11
    # bubble rises: positive vertical momentum where the bubble is
    rhow = model.prog(q, "rhou")[..., 2]
    assert float(jnp.max(rhow)) > 1e-4
    # energy conserved (no sources of energy; gravity exchanges with PE
    # internally since rhoe includes Phi)
    e0 = float(weightedsum(grid, q0, model.prog_spec.index("rhoe").start))
    e1 = float(weightedsum(grid, q, model.prog_spec.index("rhoe").start))
    assert abs(e1 - e0) / abs(e0) < 1e-8
