"""Wind-driven ocean gyre (reference experiments/OceanBoxGCM /
ocean_gyre.jl problem): hydrostatic Boussinesq box forced by a zonal
wind stress with temperature relaxation at the surface::

    python examples/ocean_gyre.py --days 0.25
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.ode.lsrk3n import LS3NRK33Heuns


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--days", type=float, default=0.25)
    p.add_argument("--nx", type=int, default=4)
    p.add_argument("--nz", type=int, default=4)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    Lx = Ly = 1e6
    H = 400.0
    problem = cm.OceanGyre(Lx, Ly, H)
    model = cm.HydrostaticBoussinesqModel(problem, c_h=np.sqrt(9.81 * H))
    grid = cm.ocean_box_grid(problem, args.nx, args.nx, args.nz, 4,
                             dtype=np.float64)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    dt = 240.0
    solver = LS3NRK33Heuns(lambda a, b, t: dg(a, b, t), dt,
                           pre_stage=dg.pre_stage)
    step = jax.jit(solver.step)
    t, nsteps = 0.0, int(args.days * 86400 / dt)
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
        if i % max(nsteps // 5, 1) == 0:
            u = model.prog(q, "u")
            print(f"t = {t/3600.0:7.2f} h   max|u| = "
                  f"{float(jnp.max(jnp.abs(u))):.4f} m/s")
    eta = model.prog(q, "eta")
    print(f"final: max|eta| = {float(jnp.max(jnp.abs(eta))):.5f} m")


if __name__ == "__main__":
    main()
