"""Solid-body rotation steady state (reference
experiments/TestCase/solid_body_rotation.jl).

An atmosphere initialized at rest in a rotating frame on the cubed
sphere, with a decaying-temperature hydrostatic reference state, must
stay at rest: the discrete pressure gradient and gravity source cancel
through the reference-state split, and Coriolis vanishes at u = 0.
Any spurious velocity measures the free-stream preservation of the
warped-mesh metrics + IMEX splitting.  Exercises the reference's
configuration exactly: Roe numerical flux, HEVI IMEX
(ARK2 Giraldo-Kelly-Constantinescu + columnwise implicit solve) with
an acoustic-gravity linear model (reference solid_body_rotation.jl:100
-106).  Smoke::

    python examples/solid_body_rotation.py --timeend 600 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.reductions import weightedsum


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-horz", type=int, default=4)
    p.add_argument("--n-vert", type=int, default=3)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=7200.0)
    p.add_argument("--explicit", action="store_true",
                   help="explicit LSRK instead of the reference's IMEX")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    dtype = np.float64 if args.platform == "cpu" else np.float32
    if dtype == np.float64:
        jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    # reference solid_body_rotation.jl:94-96: DecayingTemperatureProfile
    # (290 K surface, 220 K top, 8 km scale height), 30 km domain
    profile = cm.DecayingTemperatureProfile(290.0, 220.0, 8e3)
    physics = cm.AtmosPhysics(
        param_set=ps,
        orientation=cm.SphericalOrientation(),
        ref_state=cm.HydrostaticState(profile))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        rhoe = s.get(aux, "ref_state.rhoe")
        return m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                                batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(), cm.Coriolis()))

    dc = cm.AtmosGCMConfiguration(
        "solid_body_rotation", args.poly, (args.n_horz, args.n_vert),
        30e3, model, dtype=dtype)
    dc.numerical_flux_first_order = cm.RoeNumericalFlux()

    solver_type = cm.ExplicitSolverType() if args.explicit \
        else cm.IMEXSolverType()
    sc = cm.make_solver_configuration(
        0.0, args.timeend, dc, ode_solver_type=solver_type,
        Courant_number=0.2, CFL_direction="horizontal")
    grid, q0 = dc.grid, sc.q
    print(f"dt = {sc.dt:.2f} s, elements = {grid.nelem}, "
          f"solver = {'explicit' if args.explicit else 'IMEX ARK2'}")

    m0 = float(weightedsum(grid, q0, 0))
    ratio = cm.invoke(sc)
    q = sc.q
    m1 = float(weightedsum(grid, q, 0))
    umax = float(jnp.max(jnp.linalg.norm(
        q[..., 1:4] / q[..., :1], axis=-1)))
    print(f"norm(Q)/norm(Q0) = {ratio:.8f}   "
          f"mass rel drift = {abs(m1 - m0) / abs(m0):.2e}   "
          f"max |u| (spurious) = {umax:.3e} m/s")
    assert umax < 0.5, "rest state not maintained"


if __name__ == "__main__":
    main()
