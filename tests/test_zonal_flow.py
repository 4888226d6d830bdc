"""Balanced isothermal zonal flow stays steady on the cubed sphere
(reference experiments/TestCase/isothermal_zonal_flow.jl: deep-atmosphere
gradient balance of a sheared zonal jet, no rotation)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.common.orientations import (SphericalOrientation,
                                                    latitude,
                                                    sphr_to_cart_vec)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_cubed_sphere_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import \
    IsothermalProfile


def test_isothermal_zonal_flow_steady():
    ps = EARTH
    u0, T0 = 20.0, 300.0
    a = ps.planet_radius

    physics = AtmosPhysics(
        orientation=SphericalOrientation(),
        ref_state=HydrostaticState(IsothermalProfile(T0)))

    def init(m, coords, aux, t):
        r = jnp.sqrt(jnp.sum(coords ** 2, axis=-1))
        z = r - a
        phi = latitude(coords)
        shear = 1 + z / a
        f2 = z / a + z ** 2 / (2 * a ** 2)
        u_sph = jnp.stack([u0 * shear * jnp.cos(phi),
                           jnp.zeros_like(phi), jnp.zeros_like(phi)],
                          axis=-1)
        u = sphr_to_cart_vec(coords, u_sph)
        pre = u0 ** 2 / (ps.R_d * T0)
        exparg = (pre * f2 * jnp.cos(phi) ** 2
                  - pre * jnp.sin(phi) ** 2 / 2
                  - ps.grav * z / (ps.R_d * T0))
        p = ps.MSLP * jnp.exp(exparg)
        rho = p / (ps.R_d * T0)
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        rhoe = rho * (td.internal_energy(ps, T0 * jnp.ones_like(rho))
                      + ke + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rho[..., None] * u)

    model = AtmosModel(
        physics,
        AtmosProblem(init_state=init,
                     boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=(Gravity(),))
    topo = stacked_cubed_sphere_topology(3, a + np.linspace(0, 10e3, 3))
    grid = make_grid(topo, 4, dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
    dt = 0.3 * float(min_node_distance(grid)) / 350.0
    step = jax.jit(LSRK54CarpenterKennedy(lambda a_, b, t: dg(a_, b, t),
                                          dt).step)
    q, t = q0, 0.0
    m0 = float(weightedsum(grid, q0, 0))
    nsteps = 60
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt

    assert bool(jnp.all(jnp.isfinite(q)))
    m1 = float(weightedsum(grid, q, 0))
    assert abs(m1 - m0) / abs(m0) < 1e-13
    # the balanced jet must stay steady: velocity drift small vs u0
    u_now = q[..., 1:4] / q[..., :1]
    u_init = q0[..., 1:4] / q0[..., :1]
    drift = float(jnp.max(jnp.abs(u_now - u_init)))
    assert drift < 0.05 * u0, drift
