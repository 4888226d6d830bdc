"""Schär mountain scalar advection (reference
experiments/AtmosLES/schar_scalar_advection.jl, Schär et al. 2002).

A passive tracer anomaly is advected by a sheared flow (u = 0 below
4 km, ramping to 10 m/s above 5 km) over the two-scale Schär ridge
h(x) = h0 cos²(πx/2a) cos²(πx/λ) meshwarped into terrain-following
coordinates; the classic test for spurious distortion of advection by
terrain-following metric errors.  Isothermal background, Vreman SGS,
NTracers{1}, Rayleigh sponge above 20 km.  Smoke run::

    python examples/schar_scalar_advection.py --timeend 60 --platform cpu
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
    p.add_argument("--nel", type=int, nargs=3, default=(15, 1, 10))
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=600.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    # reference schar_scalar_advection.jl:190-196 domain; :110-130 warp
    Lx, Ly, H = 150e3, 2.5e3, 25e3
    h0, a_ridge, lam = 3e3, 25e3, 8e3
    Tiso, u0 = 250.0, 10.0
    z1, z2 = 4e3, 5e3
    Ax, Az, x0, zc = 25e3, 3e3, 25e3, 9e3

    def warp(x, y, z):
        xc = x - Lx / 2
        hstar = np.where(np.abs(xc) <= a_ridge,
                         h0 * np.cos(np.pi * xc / (2 * a_ridge)) ** 2, 0.0)
        h = hstar * np.cos(np.pi * xc / lam) ** 2
        return x, y, z + h * (H - z) / H

    r = [np.linspace(0, Lx, args.nel[0] + 1),
         np.linspace(0, Ly, args.nel[1] + 1),
         np.linspace(0, H, args.nel[2] + 1)]
    topo = stacked_brick_topology(
        r, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]), meshwarp=warp)
    grid = make_grid(topo, args.poly, dtype=np.float64)

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.IsothermalProfile(Tiso)),
        turbulence=cm.Vreman(0.21),
        tracers=cm.NTracers(delta_chi=(0.0,)))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        pr = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        x, z = coords[..., 0], coords[..., 2]
        # sheared inflow (reference :65-77)
        zs = (z - z1) / (z2 - z1)
        u = u0 * jnp.where(z >= z2, 1.0,
                           jnp.where(z >= z1,
                                     jnp.sin(jnp.pi * zs / 2) ** 2, 0.0))
        # tracer anomaly (reference :80-90)
        rr = ((x - x0) / Ax) ** 2 + ((z - zc) / Az) ** 2
        chi = jnp.where(rr <= 1.0, jnp.cos(jnp.pi * rr / 2) ** 2, 0.0)
        T = pr / (ps.R_d * rho)
        rhoe = rho * (cm.td.internal_energy(ps, T) + 0.5 * u ** 2 + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        rhou = jnp.stack([rho * u, jnp.zeros_like(u), jnp.zeros_like(u)],
                         axis=-1)
        q = m.prog_spec.set(q, "rhou", rhou)
        return m.prog_spec.set(q, "tracers.rhochi",
                               (rho * chi)[..., None])

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),
                 cm.RayleighSponge(z_max=H, z_sponge=20e3, alpha_max=0.5,
                                   u_relaxation=(u0, 0.0, 0.0),
                                   gamma=2)))
    dg = cm.DGModel(model, grid)
    q, aux = init_ode_state(dg)
    dt = 0.25 * float(min_node_distance(grid)) / 350.0
    nsteps = max(int(args.timeend / dt), 1)
    print(f"dt = {dt:.3f} s, elements = {grid.nelem}, steps = {nsteps}")

    step = jax.jit(LSRK54CarpenterKennedy(lambda a_, b, t: dg(a_, b, t),
                                          dt).step)
    ichi = model.prog_spec.index("tracers.rhochi")
    m0 = float(weightedsum(grid, q, 0))
    c0 = float(weightedsum(grid, q, ichi.start))
    t = 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    m1 = float(weightedsum(grid, q, 0))
    c1 = float(weightedsum(grid, q, ichi.start))
    chi_max = float(jnp.max(q[..., ichi.start] / q[..., 0]))
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"mass rel drift: {abs(m1 - m0) / abs(m0):.2e}   "
          f"tracer rel drift: {abs(c1 - c0) / abs(c0):.2e}   "
          f"max chi: {chi_max:.3f}")


if __name__ == "__main__":
    main()
