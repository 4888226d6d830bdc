"""DYCOMS longwave radiation (reference experiments/AtmosLES/dycoms.jl
DYCOMSRadiationModel): attenuation-path column integrals and the
three-term radiative flux against the analytic solution for a
piecewise-constant cloud slab."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics,
                                      DYCOMSRadiationModel, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.moisture import NonEquilMoist
from climatemachine_tpu.common.orientations import FlatOrientation
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import \
    DecayingTemperatureProfile

ps = EARTH
ZB, ZT, ZTOP = 600.0, 900.0, 1500.0   # slab aligned to element faces
C = 5e-4                              # rho*q_liq inside the slab


def _setup():
    rad = DYCOMSRadiationModel(kappa=85.0, alpha_z=1.0, z_i=840.0,
                               rho_i=1.13, D_subsidence=3.75e-6,
                               F_0=70.0, F_1=22.0)
    physics = AtmosPhysics(
        orientation=FlatOrientation(),
        ref_state=HydrostaticState(DecayingTemperatureProfile(290.0, 220.0)),
        moisture=NonEquilMoist(),
        radiation=rad)

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        p = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        z = coords[..., 2]
        T = p / (ps.R_d * rho)
        # element-wise constant slab (centroid test) so the integrand is
        # polynomial per element and the path integrals are exact
        zc = jnp.mean(z, axis=-1, keepdims=True)
        rhoql = jnp.where((zc > ZB) & (zc < ZT), C,
                          0.0) * jnp.ones_like(z)
        rhoqt = rhoql + 0.004 * rho
        pp = td.PhasePartition(rhoqt / rho, rhoql / rho,
                               jnp.zeros_like(rho))
        rhoe = rho * td.internal_energy(ps, T, pp) + rho * Phi
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        q = m.prog_spec.set(q, "moisture.rhoq_tot", rhoqt)
        q = m.prog_spec.set(q, "moisture.rhoq_liq", rhoql)
        return q

    model = AtmosModel(
        physics,
        AtmosProblem(init_state=init,
                     boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=(Gravity(),))
    r = [np.linspace(0, 1e3, 3), np.linspace(0, 1e3, 3),
         np.linspace(0, ZTOP, 6)]      # z faces at multiples of 300 m
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0],
                                                     [1, 2]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    dg = DGModel(model, grid)
    return model, grid, dg, rad


def test_dycoms_radiation_flux_analytic():
    model, grid, dg, rad = _setup()
    q, aux = init_ode_state(dg)
    aux = model.update_auxiliary_state(grid, q, aux, 0.0)

    z = np.asarray(grid.coords[..., 2])
    # analytic attenuation paths for the slab: Q(0,z), Q(z,ztop)
    pathlen_up = np.clip(np.minimum(z, ZT) - ZB, 0.0, None)
    pathlen_dn = np.clip(ZT - np.maximum(z, ZB), 0.0, None)
    want_up = rad.kappa * C * pathlen_up
    want_dn = rad.kappa * C * pathlen_dn
    got_up = np.asarray(model.aux_get(aux, "radiation.int_att"))
    got_dn = np.asarray(model.aux_get(aux, "radiation.int_att_rev"))
    assert np.max(np.abs(got_up - want_up)) < 1e-10
    assert np.max(np.abs(got_dn - want_dn)) < 1e-10

    # three-term flux (Stevens et al. 2005 Eq. 3)
    dz_i = np.maximum(z - rad.z_i, 0.0)
    want_F = (rad.F_1 * np.exp(-want_up) + rad.F_0 * np.exp(-want_dn)
              + rad.rho_i * ps.cp_d * rad.D_subsidence * rad.alpha_z
              * np.cbrt(dz_i) * (dz_i / 4 + rad.z_i))
    Fz = np.asarray(rad.energy_flux(model, q, aux))[..., 2]
    assert np.max(np.abs(Fz - want_F)) < 1e-9

    # full RHS with radiation active stays finite and cools the cloud top
    tend, _ = dg(q, aux, 0.0)
    assert bool(jnp.all(jnp.isfinite(tend)))
    # flux divergence at cloud top -> energy sink just below z = ZT
    rhoe_t = np.asarray(model.prog_spec.get(tend, "rhoe"))
    sel = (z > 820.0) & (z < 900.0)
    assert rhoe_t[sel].mean() < 0.0
