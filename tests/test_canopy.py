"""Canopy-atmosphere interaction sources (reference fork's own case,
test_for_Jisu/canopy_sgstke.jl:42-152): drag, TKE destruction,
transpiration, CO2 uptake — analytic values inside the canopy, exact
zeros above."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.boundaryconditions import (AtmosBC, DragLaw,
                                                         Impenetrable,
                                                         PrescribedEnergyFlux)
from climatemachine_tpu.atmos.canopy import (CanopyAerodynamics,
                                             CanopyAtmoInteraction)
from climatemachine_tpu.atmos.moisture import EquilMoist
from climatemachine_tpu.atmos.sgstke import SGStkeModel
from climatemachine_tpu.atmos.tracers import NTracers
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.common.turbulence import Deardorff
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import \
    DryAdiabaticProfile

C_D, H_C, LAI = 0.2, 20.0, 2.0
G_VEG, GPP = 0.2, 1.0
Q_TOT0 = 1e-3
UGEO = 5.0
ps = EARTH


def _model(grid):
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 0.0)),
        turbulence=Deardorff(),
        moisture=EquilMoist(maxiter=5),
        tracers=NTracers((1.6e-5,)),
        sgstke=SGStkeModel())

    def init(m, coords, aux, t):
        z = coords[..., 2]
        theta = jnp.where(z <= 2 * H_C, 300.0, 300.0 - 3e-3 * (z - 2 * H_C))
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        pp = td.PhasePartition.vapor(jnp.full_like(z, Q_TOT0))
        Rm = td.gas_constant_air(ps, pp)
        H = Rm * 300.0 / ps.grav
        pz = ps.MSLP * jnp.exp(-z / H)
        T = theta * (pz / ps.MSLP) ** ps.kappa_d
        rho = pz / (Rm * T)
        e_int = td.internal_energy(ps, T, pp)
        e_kin = 0.5 * UGEO ** 2
        q = m.prog_spec.pack(
            {"rho": rho, "rhoe": rho * (e_int + e_kin + Phi),
             "moisture.rhoq_tot": rho * Q_TOT0,
             "sgstke.rhoe_SGS": rho * 0.2 * e_kin,
             "tracers.rhochi": (3.4e-4 * rho)[..., None]},
            batch_shape=rho.shape)
        rhou = jnp.stack([rho * UGEO, jnp.zeros_like(rho),
                          jnp.zeros_like(rho)], axis=-1)
        return m.prog_spec.set(q, "rhou", rhou)

    sources = (Gravity(),
               CanopyAerodynamics(C_D, H_C, LAI),
               CanopyAtmoInteraction(H_C, LAI, 0.0, G_VEG, GPP))
    bc = AtmosBC(momentum=Impenetrable(DragLaw(0.0011)),
                 energy=PrescribedEnergyFlux(lambda m, q, a, t: 65.0))
    return AtmosModel(physics,
                      AtmosProblem(init_state=init,
                                   boundary_conditions=(bc, AtmosBC())),
                      sources=sources)


def _grid():
    r = [np.linspace(0, 100.0, 3), np.linspace(0, 100.0, 3),
         np.linspace(0, 100.0, 5)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0],
                                                     [1, 2]]))
    return make_grid(topo, 3, dtype=np.float64)


def test_canopy_source_values():
    """Source contributions match the reference formulas pointwise
    (canopy_sgstke.jl:56-152) and vanish above the canopy."""
    grid = _grid()
    model = _model(grid)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    z = grid.coords[..., 2]
    inside = np.asarray(z <= H_C)
    above = np.asarray(z > H_C)
    assert inside.any() and above.any()

    aero = CanopyAerodynamics(C_D, H_C, LAI)
    inter = CanopyAtmoInteraction(H_C, LAI, 0.0, G_VEG, GPP)
    LAD = LAI / H_C

    rho = model.prog(q, "rho")
    rhou = model.prog(q, "rhou")
    umag = jnp.linalg.norm(rhou / rho[..., None], axis=-1)
    c = aero.contributions(model, q, None, aux, 0.0)
    want_mom = -C_D * LAD * rhou * umag[..., None]
    np.testing.assert_allclose(np.asarray(c["rhou"])[inside],
                               np.asarray(want_mom)[inside], rtol=1e-12)
    assert np.all(np.asarray(c["rhou"])[above] == 0.0)
    re = model.prog(q, "sgstke.rhoe_SGS")
    want_tke = -(8.0 / 3.0) * C_D * LAD * re * umag
    np.testing.assert_allclose(np.asarray(c["sgstke.rhoe_SGS"])[inside],
                               np.asarray(want_tke)[inside], rtol=1e-12)

    ci = inter.contributions(model, q, None, aux, 0.0)
    T, p, _, pp = model.thermo_full(q, aux)
    vpd = (1.0 - td.relative_humidity(ps, T, p, pp)) * rho
    np.testing.assert_allclose(np.asarray(ci["moisture.rhoq_tot"])[inside],
                               np.asarray(G_VEG * LAD * vpd)[inside],
                               rtol=1e-12)
    assert np.all(np.asarray(ci["moisture.rhoq_tot"])[above] == 0.0)
    assert float(jnp.min(ci["moisture.rhoq_tot"][inside])) > 0.0
    tr = np.asarray(ci["tracers.rhochi"])
    np.testing.assert_allclose(tr[inside], -GPP * LAD, rtol=1e-12)
    assert np.all(tr[above] == 0.0)


def test_canopy_les_steps():
    """Short canopy LES drive: state stays finite, canopy wind decays
    toward the drag equilibrium, CO2 is taken up inside the canopy."""
    grid = _grid()
    model = _model(grid)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 0.1 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt,
                                    pre_stage=dg.pre_stage)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(40):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    z = grid.coords[..., 2]
    inside = z <= H_C
    u = model.prog(q, "rhou")[..., 0] / model.prog(q, "rho")
    u0 = model.prog(q0, "rhou")[..., 0] / model.prog(q0, "rho")
    mean_in = lambda f: float(jnp.sum(jnp.where(inside, f, 0.0))
                              / jnp.sum(inside))
    assert mean_in(u) < mean_in(u0)  # drag decelerates canopy flow
    chi = model.prog(q, "tracers.rhochi")[..., 0] / model.prog(q, "rho")
    chi0 = model.prog(q0, "tracers.rhochi")[..., 0] / model.prog(q0, "rho")
    assert mean_in(chi) < mean_in(chi0)  # GPP uptake
    qt = model.prog(q, "moisture.rhoq_tot") / model.prog(q, "rho")
    qt0 = model.prog(q0, "moisture.rhoq_tot") / model.prog(q0, "rho")
    assert mean_in(qt) > mean_in(qt0)  # transpiration moistens
