"""Rising thermal bubble driven by MIS multirate solvers (reference
experiments/AtmosLES/rising_bubble_bryan.jl).

The reference's Bryan-style large bubble (20 km x 10 km domain, 2 K
cosine-squared perturbation at z_c = 2 km, r_c = 2 km) whose point is
the SOLVER menu: a slow/fast acoustic split stepped by MIS with
different fast methods.  ``--fast-method`` selects the assembly like
the reference's ``fast_method`` flag (rising_bubble_bryan.jl
config_risingbubble): ``lsrk`` (MIS2 + LSRK54 substeps), ``ssprk``
(MIS2 + SSPRK33), ``mrrk`` (MultirateRungeKutta slow/fast), or
``imex`` (ARK2 + columnwise solve) for comparison.  Smoke::

    python examples/rising_bubble_bryan.py --timeend 20 --resolution 500
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fast-method", choices=["lsrk", "ssprk", "mrrk",
                                             "imex"], default="lsrk")
    p.add_argument("--resolution", type=float, default=250.0)
    p.add_argument("--timeend", type=float, default=100.0)
    p.add_argument("--nsubsteps", type=int, default=12)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 110.0)),
        turbulence=cm.SmagorinskyLilly(0.21))

    def init(m, coords, aux, t):
        # reference init_risingbubble!: theta perturbation
        # 2 cos^2(pi/2 r/rc) inside r <= rc, hydrostatic Exner base
        x, z = coords[..., 0], coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        r = jnp.sqrt((x - 10000.0) ** 2 + (z - 2000.0) ** 2)
        dtheta = jnp.where(
            r <= 2000.0,
            2.0 * jnp.cos(0.5 * np.pi * r / 2000.0) ** 2, 0.0)
        theta = 300.0 + dtheta
        T = theta * (pr / ps.MSLP) ** ps.kappa_d
        rho = pr / (ps.R_d * T)
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (cm.td.internal_energy(ps, T) + Phi)},
            batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))

    res = (args.resolution, args.resolution * 8, args.resolution)
    dc = cm.AtmosLESConfiguration(
        "rising_bubble_bryan", 4, res, 20000.0, 2000.0, 10000.0,
        model, dtype=np.float64)

    if args.fast_method == "lsrk":
        from climatemachine_tpu.ode.mis import MIS2
        st = cm.MISSolverType(mis_method=MIS2,
                              nsubsteps=args.nsubsteps)
    elif args.fast_method == "ssprk":
        from climatemachine_tpu.ode.mis import MIS2
        from climatemachine_tpu.ode.ssprk import SSPRK33ShuOsher
        st = cm.MISSolverType(mis_method=MIS2,
                              fast_method=SSPRK33ShuOsher,
                              nsubsteps=args.nsubsteps)
    elif args.fast_method == "mrrk":
        st = cm.MultirateSolverType(timestep_ratio=args.nsubsteps)
    else:
        st = cm.IMEXSolverType()

    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4,
                                      ode_solver_type=st)
    print(f"fast_method={args.fast_method} dt={sc.dt:.3f}s "
          f"elements={dc.grid.nelem}")
    cm.invoke(sc)
    w = model.prog(sc.q, "rhou")[..., 2] / model.prog(sc.q, "rho")
    print(f"max updraft velocity: {float(jnp.max(w)):.3f} m/s")
    assert bool(jnp.all(jnp.isfinite(sc.q)))


if __name__ == "__main__":
    main()
