"""Coupled soil water + heat equilibrium (reference
tutorials/Land/Soil/Coupled/equilibrium_test.jl).

A 1 m soil column with exponential initial profiles of temperature
(288 -> 289 K) and augmented liquid fraction (0.4 nu -> 0.5 nu), zero
water and heat flux at both boundaries (Neumann 0).  Evolved long
compared to the dynamical timescales, the column must relax toward the
coupled equilibrium dh/dz = 0 (pressure balances gravity) and
dT/dz = 0 (uniform temperature), while conserving total water and
energy (the reference checks the same, equilibrium_test.jl:30-60).

Run::

    python examples/soil_coupled_equilibrium.py --hours 6 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.land import (LandModel, SoilHeatModel, SoilModel,
                                     SoilWaterModel, SoilParams,
                                     vanGenuchten)
from climatemachine_tpu.land.model import LandBC, Neumann
from climatemachine_tpu.land import soil_params as sp
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import single_stack_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=6.0)
    p.add_argument("--nz", type=int, default=10)
    p.add_argument("--poly", type=int, default=3)
    p.add_argument("--dt", type=float, default=5.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    # soil: sandy loam of the reference tutorial (equilibrium_test.jl:
    # porosity 0.395, Ksat 4.42 cm/h, vG alpha=7.5/m n=1.89, S_s 1e-3)
    params = SoilParams(porosity=0.395, Ksat=4.42 / 3600 / 100, S_s=1e-3,
                        theta_r=0.0)
    hyd = vanGenuchten(alpha=7.5, n=1.89)
    c = 20.0
    zmax = 1.0     # column [0, 1] here; reference uses [-1, 0]

    def init_theta(coords, t):
        z = coords[..., 2] - zmax            # -> [-1, 0]
        th_min, th_max = 0.4 * params.porosity, 0.5 * params.porosity
        return th_min + (th_max - th_min) * jnp.exp(z * c)

    def init_T(coords, t):
        z = coords[..., 2] - zmax
        return 288.0 + 1.0 * jnp.exp(z * c)

    soil = SoilModel(params=params,
                     water=SoilWaterModel(hydraulics=hyd,
                                          initial_vartheta=init_theta),
                     heat=SoilHeatModel(initial_T=init_T))
    zero = lambda t: 0.0
    bcs = (LandBC(water=Neumann(zero), heat=Neumann(zero)),   # bottom
           LandBC(water=Neumann(zero), heat=Neumann(zero)))   # surface
    model = LandModel(soil, boundary_conditions=bcs)
    topo = single_stack_topology(1.0, 1.0,
                                 np.linspace(0, zmax, args.nz + 1))
    grid = make_grid(topo, args.poly, dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), args.dt)
    step = jax.jit(solver.step)

    nsteps = int(args.hours * 3600.0 / args.dt)
    print(f"dt = {args.dt} s, steps = {nsteps}, elements = {grid.nelem}")
    q, t = q0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += args.dt

    v = model.prog(q, "vartheta_l")
    T = model.temperature(q)
    z = grid.coords[..., 2] - zmax
    psi = sp.pressure_head(hyd, params.porosity, params.S_s,
                           params.theta_r, v, jnp.zeros_like(v))
    h = psi + z

    def spread(f):
        return float(jnp.max(f) - jnp.min(f))

    M = grid.M
    water0 = float(jnp.sum(M * model.prog(q0, "vartheta_l")))
    water1 = float(jnp.sum(M * v))
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}")
    print(f"t = {t / 3600:.2f} h   dh spread: {spread(h):.3e} m "
          f"(init {spread(psi + z - psi + 0):.3f})   "
          f"T spread: {spread(T):.4f} K (init 1.0)")
    print(f"water rel drift: {abs(water1 - water0) / water0:.2e}")
    assert bool(jnp.all(jnp.isfinite(q)))
    assert spread(T) < 1.0          # relaxing toward uniform T
    assert abs(water1 - water0) / water0 < 1e-10


if __name__ == "__main__":
    main()
