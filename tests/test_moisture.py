"""Moist thermodynamics + EquilMoist model tests (reference
test/Common/Thermodynamics + moist model tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.moisture import EquilMoist
from climatemachine_tpu.atmos.tracers import NTracers
from climatemachine_tpu.common.turbulence import ConstantKinematicViscosity
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import DryAdiabaticProfile


def test_saturation_adjustment_unsaturated():
    """Unsaturated: T equals the all-vapor analytic temperature."""
    ps = EARTH
    rho = jnp.asarray([1.0, 1.1])
    q_tot = jnp.asarray([0.001, 0.002])
    T_target = jnp.asarray([290.0, 300.0])
    pp = td.PhasePartition.vapor(q_tot)
    e_int = td.internal_energy(ps, T_target, pp)
    T = td.saturation_adjustment(ps, e_int, rho, q_tot)
    qsat = td.q_vap_saturation(ps, T, rho)
    assert bool(jnp.all(q_tot < qsat))
    assert float(jnp.max(jnp.abs(T - T_target))) < 1e-6


def test_saturation_adjustment_supersaturated():
    """Supersaturated: the adjusted state is energy-consistent and has
    condensate."""
    ps = EARTH
    rho = jnp.asarray([1.0])
    q_tot = jnp.asarray([0.03])
    T_init = jnp.asarray([285.0])
    pp0 = td.phase_partition_equil(ps, T_init, rho, q_tot)
    assert float((pp0.liq + pp0.ice)[0]) > 0.0
    e_int = td.internal_energy(ps, T_init, pp0)
    T = td.saturation_adjustment(ps, e_int, rho, q_tot)
    assert float(jnp.max(jnp.abs(T - T_init))) < 1e-4
    pp = td.phase_partition_equil(ps, T, rho, q_tot)
    resid = td.internal_energy(ps, T, pp) - e_int
    assert float(jnp.max(jnp.abs(resid))) < 1.0  # J/kg


def test_moist_bubble_with_tracers():
    """EquilMoist + NTracers rising bubble: stable, conserves ρ and ρq_tot."""
    ps = EARTH
    L = 1000.0
    r = [np.linspace(0, L, 4)] * 2 + [np.linspace(0, L, 5)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0),
        moisture=EquilMoist(),
        tracers=NTracers((1.0, 2.0)))

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        rbl = jnp.sqrt((x - 500.0) ** 2 + (z - 300.0) ** 2)
        thp = 1.0 * jnp.clip(1 - rbl / 200.0, 0, 1)
        T = (300.0 + thp) * (p / ps.MSLP) ** ps.kappa_d
        q_tot = 0.005 * jnp.exp(-z / 2000.0)
        pp = td.PhasePartition.vapor(q_tot)
        rho = p / (td.gas_constant_air(ps, pp) * T)
        e_int = td.internal_energy(ps, T, pp)
        q = m.prog_spec.pack({"rho": rho,
                              "rhoe": rho * (e_int + Phi),
                              "moisture.rhoq_tot": rho * q_tot},
                             batch_shape=rho.shape)
        chi = jnp.stack([jnp.ones_like(rho), z / L], axis=-1)
        return m.prog_spec.set(q, "tracers.rhochi", rho[..., None] * chi)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(), AtmosBC())),
                       sources=(Gravity(),))
    assert model.prog_spec.num == 5 + 1 + 2
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    assert bool(jnp.all(jnp.isfinite(q0)))
    # cached temperature is reasonable
    T_cache = model.aux_get(aux, "moisture.temperature")
    assert 200 < float(jnp.min(T_cache)) and float(jnp.max(T_cache)) < 320

    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(60):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    for name in ["rho", "moisture.rhoq_tot"]:
        sl = model.prog_spec.index(name).start
        m0 = float(weightedsum(grid, q0, sl))
        m1 = float(weightedsum(grid, q, sl))
        assert abs(m1 - m0) / abs(m0) < 1e-11, name
    # warm moist bubble rises
    assert float(jnp.max(model.prog(q, "rhou")[..., 2])) > 1e-4
