"""Soil heat equation in a single column (reference
tutorials/Land/Heat/heat_equation.jl and
tutorials/Land/Soil/Heat/bonan_heat_tutorial.jl).

A heat-only LandModel column: initial uniform temperature, surface
clamped warmer, no-flux bottom; the solution is the classical
semi-infinite erfc profile T(z,t) = T_i + (T_s - T_i) erfc(|z| /
2 sqrt(d t)), checked at the end of the run.  ``--bonan`` switches to
moisture-dependent thermal properties (volumetric heat capacity and
Kersten-blended conductivity at a prescribed water content, the Bonan
2019 configuration concept).  Smoke::

    python examples/heat_equation.py --timeend 3600
"""

import argparse
import math
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.land import (LandModel, SoilHeatModel, SoilModel,
                                     SoilParams, SoilWaterModel,
                                     vanGenuchten)
from climatemachine_tpu.land import soil_params as sp
from climatemachine_tpu.land.model import Dirichlet, LandBC
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import single_stack_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bonan", action="store_true",
                   help="moisture-dependent rho_c / kappa (Bonan config)")
    p.add_argument("--nel", type=int, default=50)
    p.add_argument("--depth", type=float, default=5.0)
    p.add_argument("--timeend", type=float, default=3600.0 * 24 * 10)
    p.add_argument("--dt", type=float, default=600.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    T_i, T_s = 279.85, 299.85          # reference heat_equation.jl values
    # Ksat = 0: no water movement (the Bonan tutorial prescribes the
    # moisture; Richards would otherwise drain the column)
    params = SoilParams(Ksat=0.0)
    theta = 0.25
    if args.bonan:
        heat = SoilHeatModel(initial_T=lambda c, t:
                             jnp.full(c.shape[:-1], T_i),
                             T_ref=T_i, coupled_properties=True)
        water = SoilWaterModel(hydraulics=vanGenuchten(),
                               initial_vartheta=lambda c, t:
                               jnp.full(c.shape[:-1], theta))
        kappa = float(sp.thermal_conductivity(
            params, jnp.array(theta), jnp.array(0.0)))
        rho_c = float(sp.volumetric_heat_capacity(
            params, jnp.array(theta), jnp.array(0.0)))
    else:
        heat = SoilHeatModel(initial_T=lambda c, t:
                             jnp.full(c.shape[:-1], T_i), T_ref=T_i)
        water = None
        kappa, rho_c = params.kappa_soil, params.rho_c_soil
    d = kappa / rho_c

    soil = SoilModel(params=params, water=water, heat=heat)
    model = LandModel(soil,
                      boundary_conditions=(LandBC(),
                                           LandBC(heat=Dirichlet(T_s))))
    topo = single_stack_topology(1.0, 1.0,
                                 np.linspace(-args.depth, 0.0,
                                             args.nel + 1))
    grid = make_grid(topo, 1, dtype=np.float64)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), args.dt)
    step = jax.jit(solver.step)
    t = 0.0
    for _ in range(int(args.timeend / args.dt)):
        q, aux = step(q, aux, t)
        t += args.dt

    T = np.asarray(model.temperature(q)).ravel()
    z = np.asarray(grid.coords[..., 2]).ravel()
    o = np.argsort(z)
    zu, idx = np.unique(np.round(z[o], 9), return_index=True)
    Tu = T[o][idx]
    erfc = np.vectorize(math.erfc)
    T_ana = T_i + (T_s - T_i) * erfc(-zu / (2 * math.sqrt(d * t)))
    # the t=0 surface step is unresolvable in the first cells and its
    # imprint decays only algebraically — gate below the top 2 cells
    interior = zu < -2.0 * args.depth / args.nel
    err = float(np.max(np.abs(Tu - T_ana)[interior]))
    print(f"bonan={args.bonan} t={t:.0f}s kappa={kappa:.3f} "
          f"rho_c={rho_c:.3e} d={d:.3e}  max|T - erfc analytic| = "
          f"{err:.3f} K")
    depth_reached = 4 * math.sqrt(d * t)
    assert depth_reached < args.depth, "domain no longer semi-infinite"
    # gate only when the front is resolved (>= 3 cells); smoke runs with
    # a tiny --timeend just check finiteness
    cells = 2 * math.sqrt(d * t) / (args.depth / args.nel)
    if cells >= 3.0:
        assert err < 0.35, err
    else:
        print(f"(front spans {cells:.1f} cells — analytic gate skipped)")
    assert bool(jnp.all(jnp.isfinite(q)))


if __name__ == "__main__":
    main()
