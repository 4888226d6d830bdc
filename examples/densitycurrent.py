"""Straka density current (reference tutorials/Atmos/densitycurrent.jl).

A −15 K cold bubble collapses and spreads as a gravity current with
Kelvin-Helmholtz rotors along the head; constant 75 m²/s viscosity makes
the solution grid-convergent (Straka et al. 1993).  Short smoke run::

    python examples/densitycurrent.py --timeend 120 --resolution 200
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
    p.add_argument("--resolution", type=float, default=100.0)
    p.add_argument("--timeend", type=float, default=120.0)
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--out", default="/tmp/densitycurrent")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    # reference: ConstantKinematicViscosity(75 m²/s), isothermal-θ base
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 0.0)),
        turbulence=cm.ConstantKinematicViscosity(75.0))

    xc, zc, xr, zr = 0.0, 3000.0, 4000.0, 2000.0

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        r = jnp.sqrt(((x - xc) / xr) ** 2 + ((z - zc) / zr) ** 2)
        dtheta = jnp.where(r <= 1.0,
                           -15.0 / 2 * (1 + jnp.cos(jnp.pi * r)), 0.0)
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

    # reference domain: x ∈ [0, 25.6 km] (half-domain symmetric), z ≤ 6.4 km
    dc = cm.AtmosLESConfiguration(
        "densitycurrent", 4, (args.resolution,) * 3,
        25600.0, 400.0, 6400.0, model, dtype=np.float64,
        periodicity=(False, True, False),
        boundary=((1, 1), (0, 0), (1, 2)))
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")

    cbs = []
    if args.vtk_every:
        from climatemachine_tpu.io.vtk import vtk_dump_state
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def dump(state):
            vtk_dump_state(f"{args.out}_{state.step:05d}", sc.dg,
                           state.q, state.aux)
        cbs.append(EveryXSimulationSteps(dump, args.vtk_every))

    cm.invoke(sc, user_callbacks=cbs)
    u = model.prog(sc.q, "rhou")[..., 0] / model.prog(sc.q, "rho")
    print(f"max front speed u: {float(jnp.max(jnp.abs(u))):.2f} m/s")


if __name__ == "__main__":
    main()
