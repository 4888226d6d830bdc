"""OceanBoxGCM experiments: simple box / homogeneous box / ocean gyre
(reference experiments/OceanBoxGCM/{simple_box.jl, homogeneous_box.jl,
ocean_gyre.jl} run_simple_box).

HydrostaticBoussinesqModel on a closed box with c_h = sqrt(gH):

- ``homogeneous``: wind-driven barotropic gyre, uniform theta = 20
  (HomogeneousBox; reference homogeneous_box.jl).
- ``gyre``: wind stress + north-south surface temperature restoring
  (OceanGyre; reference ocean_gyre.jl).

Boundary tags: coasts NoSlip, floor NoSlip (or FreeSlip with
--floor-free-slip, the windstress-test variant), surface penetrable
with KinematicStress (reference run_simple_box BC tuples).  Explicit
LSRK144 (reference also offers IMEX with LinearHBModel).

Smoke run::

    python examples/ocean_box_gcm.py --problem homogeneous --nelem 3 3 3 \
        --timeend 1800 --dt 180 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.ocean.core import (FreeSlip, Impenetrable,
                                           Insulating, KinematicStress,
                                           NoSlip, OceanBC, Penetrable)
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel)
from climatemachine_tpu.ocean.problems import (HomogeneousBox, OceanGyre,
                                               ocean_box_grid)
from climatemachine_tpu.ode.lsrk import LSRK144NiegemannDiehlBusch
from climatemachine_tpu.ode.solve import solve
from climatemachine_tpu.physics.parameters import EARTH


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problem", default="homogeneous",
                   choices=["homogeneous", "gyre"])
    p.add_argument("--nelem", type=int, nargs=3, default=(20, 20, 20))
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--domain", type=float, nargs=3,
                   default=(4e6, 4e6, 400.0))
    p.add_argument("--dt", type=float, default=55.0)
    p.add_argument("--timeend", type=float, default=6 * 3600.0)
    p.add_argument("--floor-free-slip", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    Lx, Ly, H = args.domain
    floor = FreeSlip() if args.floor_free_slip else NoSlip()
    if args.problem == "homogeneous":
        BC = (OceanBC(Impenetrable(NoSlip()), Insulating()),
              OceanBC(Impenetrable(floor), Insulating()),
              OceanBC(Penetrable(KinematicStress()), Insulating()))
        problem = HomogeneousBox(Lx, Ly, H, boundary_conditions=BC)
    else:
        problem = OceanGyre(Lx, Ly, H)

    model = HydrostaticBoussinesqModel(
        problem, c_h=float(np.sqrt(EARTH.grav * H)))
    grid = ocean_box_grid(problem, *args.nelem, args.poly,
                          dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    solver = LSRK144NiegemannDiehlBusch(lambda a, b, t: dg(a, b, t),
                                        args.dt, pre_stage=dg.pre_stage)
    print(f"problem = {args.problem}, elements = {grid.nelem}, "
          f"dt = {args.dt:.0f} s, steps = "
          f"{int(args.timeend / args.dt)}")
    st = solve(q0, aux, solver, args.timeend, callbacks=())
    q = st.q
    u = model.prog(q, "u")
    eta = model.prog(q, "eta")
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"max |u|: {float(jnp.max(jnp.abs(u))):.4f} m/s   "
          f"eta range: [{float(jnp.min(eta)):.4f}, "
          f"{float(jnp.max(eta)):.4f}] m")
    assert bool(jnp.all(jnp.isfinite(q)))


if __name__ == "__main__":
    main()
