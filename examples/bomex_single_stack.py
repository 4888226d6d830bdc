"""BOMEX single-column (single-stack) configuration (reference
experiments/AtmosLES/bomex_single_stack.jl).

The full BOMEX moist physics + forcing set of examples/bomex_les.py on
a SingleStackConfiguration: one horizontal element, periodic laterally,
a high-resolution vertical stack — the reference's testbed for
single-column physics (SingleStackConfigType, bomex_single_stack.jl:58,
:121).  Smoke::

    python examples/bomex_single_stack.py --timeend 3 --platform cpu
"""

import argparse
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.mesh.filters import tmar

import bomex_les as bx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nelem-vert", type=int, default=20)
    p.add_argument("--zmax", type=float, default=3000.0)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=60.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    zmax = args.zmax

    ps = cm.EARTH
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(290.0, 220.0)),
        turbulence=cm.SmagorinskyLilly(bx.C_SMAG),
        moisture=cm.EquilMoist(maxiter=5))

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(
            lambda m, q, a, t, speed: (bx.U_STAR / speed) ** 2)),
        energy=cm.PrescribedEnergyFlux(
            lambda m, q, a, t: bx.LHF + bx.SHF),
        moisture=cm.PrescribedMoistureFlux(
            lambda m, q, a, t: bx.LHF / cm.td.latent_heat_vapor(
                ps, bx.T_SFC)))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=bx.init_bomex,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(), bx.BomexTendencies(zmax),
                 bx.BomexSponge(zmax), bx.BomexGeostrophic(zmax)))

    dc = cm.SingleStackConfiguration(
        "bomex_single_stack", args.poly, args.nelem_vert, zmax, model,
        hmax=100.0, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.35)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")

    from climatemachine_tpu.ode.callbacks import EveryXSimulationSteps
    qt_slot = [model.prog_spec.flattened_names().index(
        "moisture.rhoq_tot")]

    def apply_tmar(state):
        state.q = tmar(dc.grid, state.q, fields=qt_slot)

    cm.invoke(sc, user_callbacks=[EveryXSimulationSteps(apply_tmar, 1)])

    rho = model.prog(sc.q, "rho")
    qt = model.prog(sc.q, "moisture.rhoq_tot") / rho
    print(f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}   "
          f"q_tot range: [{float(jnp.min(qt)) * 1e3:.2f}, "
          f"{float(jnp.max(qt)) * 1e3:.2f}] g/kg")
    assert bool(jnp.all(jnp.isfinite(sc.q)))


if __name__ == "__main__":
    main()
