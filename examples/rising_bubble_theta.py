"""Rising bubble in the theta (potential-temperature) energy formulation
(reference experiments/AtmosLES/rising_bubble_theta_formulation.jl).

Prognostic rho*theta instead of total energy: a +2 K theta bubble in a
neutral 300 K atmosphere rises; under pure advection the theta equation
has no pressure-work term, so both mass and rho*theta are conserved to
round-off.

Smoke run::

    python examples/rising_bubble_theta.py --timeend 50 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.atmos.energy import ThetaModel
from climatemachine_tpu.dg.reductions import weightedsum


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(50.0, 50.0, 50.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(2500.0, 2500.0, 2500.0))
    p.add_argument("--timeend", type=float, default=100.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    xc, zc, rc = args.domain[0] / 2, 2000.0, 2000.0
    amp = 2.0

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 0.0)),
        energy=ThetaModel(),
        turbulence=cm.SmagorinskyLilly(0.0))

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        r = jnp.sqrt((x - xc) ** 2 + (z - zc) ** 2)
        dtheta = jnp.where(r <= rc, amp * (1.0 - r / rc), 0.0)
        theta = 300.0 + dtheta
        exner = 1.0 - ps.grav / (ps.cp_d * theta) * z
        rho = ps.MSLP / (ps.R_d * theta) * exner ** (ps.cv_d / ps.R_d)
        # prognostic slot carries rho*theta under ThetaModel
        return m.prog_spec.pack({"rho": rho, "rhoe": rho * theta},
                                batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))

    dc = cm.AtmosLESConfiguration(
        "rising_bubble_theta", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], args.domain[2], model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    m0 = float(weightedsum(dc.grid, sc.q, 0))
    th0 = float(weightedsum(dc.grid, sc.q, 4))
    cm.invoke(sc)
    m1 = float(weightedsum(dc.grid, sc.q, 0))
    th1 = float(weightedsum(dc.grid, sc.q, 4))

    rho = model.prog(sc.q, "rho")
    w = model.prog(sc.q, "rhou")[..., 2] / rho
    print(f"max w: {float(jnp.max(w)):.4f} m/s   "
          f"mass drift: {(m1-m0)/m0:.2e}   rho-theta drift: "
          f"{(th1-th0)/th0:.2e}   "
          f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}")


if __name__ == "__main__":
    main()
