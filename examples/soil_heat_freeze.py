"""Multi-column land model: soil heat diffusion from a warm surface
(reference tutorials/Land/Soil/*): Dirichlet warm top boundary heats an
initially uniform soil column::

    python examples/soil_heat_freeze.py --hours 6
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.land.model import Dirichlet, LandBC


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=6.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    params = cm.SoilParams()
    soil = cm.SoilModel(
        params=params, water=None,
        heat=cm.SoilHeatModel(initial_T=lambda c, t:
                              jnp.full_like(c[..., 2], 278.0)))
    model = cm.LandModel(
        soil, boundary_conditions=(LandBC(), LandBC(heat=Dirichlet(295.0))))
    dc = cm.MultiColumnLandModelConfiguration(
        "soil", 4, (0.5, 0.5, 0.1), 1.0, 1.0, 1.0, model,
        boundary=((1, 1), (1, 1), (1, 2)), dtype=np.float64)
    dg = DGModel(model, dc.grid,
                 numerical_flux_first_order=dc.numerical_flux_first_order)
    q, aux = init_ode_state(dg)

    dt = 5.0
    solver = cm.LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    t, nsteps = 0.0, int(args.hours * 3600 / dt)
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    T = np.asarray(model.temperature(q))
    z = np.asarray(dc.grid.coords[..., 2])
    for zq in (1.0, 0.75, 0.5, 0.25, 0.0):
        sel = np.abs(z - zq) < 0.02
        print(f"z = {zq:4.2f} m   T = {T[sel].mean():7.2f} K")


if __name__ == "__main__":
    main()
