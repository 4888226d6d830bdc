"""Nonhydrostatic gravity wave on a reduced planet — DCMIP 2012 case 3-1
(reference experiments/AtmosGCM/nonhydrostatic_gravity_wave.jl).

Small planet (radius / 125, no rotation), isothermal hydrostatic
background, a potential-temperature bubble at the equator radiates
internal gravity waves around the sphere.  Demonstrates custom
parameter sets (the reference overrides CLIMAParameters).  Smoke::

    python examples/gravity_wave.py --timeend 120 --platform cpu
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.common.orientations import latitude, longitude
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_cubed_sphere_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-horz", type=int, default=6)
    p.add_argument("--n-vert", type=int, default=4)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=300.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    X = 125.0                       # DCMIP reduced-planet factor
    ps = dataclasses.replace(cm.EARTH,
                             planet_radius=cm.EARTH.planet_radius / X,
                             Omega=0.0)
    a = ps.planet_radius
    ztop = 10e3
    T0 = 300.0
    dtheta, Lr, zc = 1.0, 5e3, 5e3   # bubble amplitude / width / height

    physics = cm.AtmosPhysics(
        param_set=ps,
        orientation=cm.SphericalOrientation(),
        ref_state=cm.HydrostaticState(cm.IsothermalProfile(T0)))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        pr = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        r = jnp.sqrt(jnp.sum(coords ** 2, axis=-1))
        z = r - a
        lat, lon = latitude(coords), longitude(coords)
        # great-circle distance from the equatorial point (lon=0)
        gc = a * jnp.arccos(jnp.clip(jnp.cos(lat) * jnp.cos(lon),
                                     -1.0, 1.0))
        shape = Lr ** 2 / (Lr ** 2 + gc ** 2) \
            * jnp.sin(jnp.pi * z / ztop)
        T = pr / (ps.R_d * rho)
        theta = T * (ps.MSLP / pr) ** ps.kappa_d
        theta = theta + dtheta * shape
        T_new = theta * (pr / ps.MSLP) ** ps.kappa_d
        rho_new = pr / (ps.R_d * T_new)
        rhoe = rho_new * (cm.td.internal_energy(ps, T_new) + Phi)
        return m.prog_spec.pack({"rho": rho_new, "rhoe": rhoe},
                                batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))
    topo = stacked_cubed_sphere_topology(
        args.n_horz, a + np.linspace(0, ztop, args.n_vert + 1))
    grid = make_grid(topo, args.poly, dtype=np.float64)
    dg = cm.DGModel(model, grid)
    q, aux = init_ode_state(dg)
    dt = 0.3 * float(min_node_distance(grid)) / 350.0
    nsteps = max(int(args.timeend / dt), 1)
    print(f"dt = {dt:.3f} s, elements = {grid.nelem}, steps = {nsteps}")

    step = jax.jit(LSRK54CarpenterKennedy(lambda a_, b, t: dg(a_, b, t),
                                          dt).step)
    m0 = float(weightedsum(grid, q, 0))
    t = 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    m1 = float(weightedsum(grid, q, 0))
    w = jnp.sum(q[..., 1:4] * (grid.coords / jnp.linalg.norm(
        grid.coords, axis=-1, keepdims=True)), axis=-1) / q[..., 0]
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"mass rel drift: {abs(m1 - m0) / abs(m0):.2e}   "
          f"max |w| (gravity waves): {float(jnp.max(jnp.abs(w))):.3f} m/s")


if __name__ == "__main__":
    main()
