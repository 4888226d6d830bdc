"""Dry rising thermal bubble (reference tutorials/Atmos/risingbubble.jl).

A 2 K warm bubble in a hydrostatically balanced dry atmosphere rises and
deforms.  Runs in ~1 min on CPU::

    python examples/risingbubble.py --timeend 100 --vtk-every 50
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
    p.add_argument("--resolution", type=float, default=50.0)
    p.add_argument("--timeend", type=float, default=100.0)
    p.add_argument("--vtk-every", type=int, default=0,
                   help="dump VTK every N steps (0 = off)")
    p.add_argument("--out", default="/tmp/risingbubble")
    p.add_argument("--platform", default=None,
                   help="force jax platform (e.g. cpu)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 110.0)),
        turbulence=cm.SmagorinskyLilly(0.21))

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        r = jnp.sqrt((x - 1250.0) ** 2 + (z - 1000.0) ** 2)
        dtheta = 2.0 * jnp.clip(1 - r / 500.0, 0.0, 1.0)
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

    dc = cm.AtmosLESConfiguration(
        "risingbubble", 4, (args.resolution,) * 3, 2500.0, 2500.0, 2500.0,
        model, dtype=np.float64)
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
    w = model.prog(sc.q, "rhou")[..., 2] / model.prog(sc.q, "rho")
    print(f"max updraft velocity: {float(jnp.max(w)):.3f} m/s")


if __name__ == "__main__":
    main()
