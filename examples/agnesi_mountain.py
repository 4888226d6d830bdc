"""Agnesi mountain waves over terrain-following coordinates (reference
tutorials/Atmos/agnesi_hs_lin.jl / agnesi_nh_lin.jl).

Uniform isothermal inflow over a witch-of-Agnesi ridge
h(x) = h_m / (1 + (x/a)²) meshwarped into the grid; vertically
propagating gravity waves develop above the ridge, absorbed by a
Rayleigh sponge.  Smoke run::

    python examples/agnesi_mountain.py --timeend 200 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.spatial import init_ode_state
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, nargs=3, default=(12, 1, 6))
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=200.0)
    p.add_argument("--hm", type=float, default=None,
                   help="mountain height [m] (default per variant)")
    p.add_argument("--variant", choices=["hs", "nh"], default="hs",
                   help="hs: hydrostatic linear ridge a=8 km, U=20 "
                   "(agnesi_hs_lin.jl); nh: nonhydrostatic a=1 km, "
                   "U=10, 144 km domain (agnesi_nh_lin.jl)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    if args.variant == "hs":
        Lx, Ly, H = 120e3, 5e3, 24e3
        a, U, T0 = 8e3, 20.0, 250.0
        hm = 400.0 if args.hm is None else args.hm
    else:
        # nonhydrostatic: narrow ridge (a << U/N ~ 1 km scale waves)
        # reference agnesi_nh_lin.jl:9,46: a = 1 km, 144 km x 30 km
        Lx, Ly, H = 144e3, 2e3, 30e3
        a, U, T0 = 1e3, 10.0, 280.0
        hm = 1.0 if args.hm is None else args.hm

    def warp(x, y, z):
        h = hm / (1.0 + ((x - Lx / 2) / a) ** 2)
        return x, y, z + h * (1.0 - z / H)

    r = [np.linspace(0, Lx, args.nel[0] + 1),
         np.linspace(0, Ly, args.nel[1] + 1),
         np.linspace(0, H, args.nel[2] + 1)]
    topo = stacked_brick_topology(
        r, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]), meshwarp=warp)
    grid = make_grid(topo, args.poly, dtype=np.float64)

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.IsothermalProfile(T0)))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        pr = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        T = pr / (ps.R_d * rho)
        u = jnp.stack([U * jnp.ones_like(rho), jnp.zeros_like(rho),
                       jnp.zeros_like(rho)], axis=-1)
        rhoe = rho * (cm.td.internal_energy(ps, T)
                      + 0.5 * U ** 2 + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rho[..., None] * u)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),
                 cm.RayleighSponge(z_max=H, z_sponge=0.625 * H,
                                   alpha_max=0.5,
                                   u_relaxation=(U, 0.0, 0.0))))
    dg = cm.DGModel(model, grid)
    q, aux = init_ode_state(dg)
    dt = 0.25 * float(min_node_distance(grid)) / 350.0
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
    w = q[..., 3] / q[..., 0]
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"mass rel drift: {abs(m1 - m0) / abs(m0):.2e}   "
          f"max |w| (mountain waves): {float(jnp.max(jnp.abs(w))):.3f} m/s")


if __name__ == "__main__":
    main()
