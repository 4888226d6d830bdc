"""Dry Rayleigh-Benard convection (reference
tutorials/Atmos/dry_rayleigh_benard.jl): heated bottom / cooled top
plates (PrescribedTemperature walls, ΔT = 10 K), no-slip boundaries,
constant-viscosity SGS; convective cells spin up from a seeded
perturbation.  Smoke run::

    python examples/rayleigh_benard.py --timeend 100 --platform cpu
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
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    T_bot, T_top = 299.0, 289.0
    zmax = 250.0

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DryAdiabaticProfile(0.5 * (T_bot + T_top), 0.0)),
        turbulence=cm.ConstantKinematicViscosity(1.0))

    def init(m, coords, aux, t):
        s = m.aux_spec
        pr = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
        # linear unstable temperature profile + deterministic seed noise
        T = T_bot + (T_top - T_bot) * z / zmax
        T = T + 0.05 * jnp.sin(2 * jnp.pi * x / 250.0) \
              * jnp.cos(2 * jnp.pi * y / 250.0) \
              * jnp.sin(jnp.pi * z / zmax)
        rho = pr / (ps.R_d * T)
        rhoe = rho * (cm.td.internal_energy(ps, T) + Phi)
        return m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                                batch_shape=rho.shape)

    bc_bot = cm.AtmosBC(momentum=cm.Impenetrable(cm.NoSlip()),
                        energy=cm.PrescribedTemperature(T_bot))
    bc_top = cm.AtmosBC(momentum=cm.Impenetrable(cm.NoSlip()),
                        energy=cm.PrescribedTemperature(T_top))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bot, bc_top)),
        sources=(cm.Gravity(),))

    dc = cm.AtmosLESConfiguration(
        "rayleigh_benard", 4, (args.resolution,) * 3, 250.0, 250.0, zmax,
        model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.3)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    cm.invoke(sc)

    w = model.prog(sc.q, "rhou")[..., 2] / model.prog(sc.q, "rho")
    print(f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}   "
          f"max |w| (convection): {float(jnp.max(jnp.abs(w))):.3f} m/s")


if __name__ == "__main__":
    main()
