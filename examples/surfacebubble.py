"""Surface-flux-driven rising thermals (reference
experiments/AtmosLES/surfacebubble.jl).

Neutral theta = 300 K atmosphere; a spatially varying surface heat flux
F0 cos^2(2 pi x/x0) cos^2(2 pi y/x0) heats the floor until t1 = 500 s,
spawning thermal plumes.  EquilMoist + Smagorinsky (C_s = 0.23).

Smoke run::

    python examples/surfacebubble.py --timeend 40 --platform cpu
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
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(50.0, 50.0, 50.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(2000.0, 2000.0, 2000.0))
    p.add_argument("--timeend", type=float, default=500.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    F0, t1 = 100.0, 500.0
    x0 = args.domain[0]

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(290.0, 220.0)),
        turbulence=cm.SmagorinskyLilly(0.23),
        moisture=cm.EquilMoist())

    def init(m, coords, aux, t):
        z = coords[..., 2]
        theta = jnp.full_like(z, 300.0)
        exner = 1.0 - ps.grav / (ps.cp_d * theta) * z
        rho = ps.MSLP / (ps.R_d * theta) * exner ** (ps.cv_d / ps.R_d)
        T = theta * exner
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        rhoe = rho * (cm.td.internal_energy(ps, T) + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "moisture.rhoq_tot", jnp.zeros_like(rho))

    def energyflux(model, q, aux, t):
        """(surfacebubble.jl:88-94): cos^2 plume heater until t1."""
        coord = model.aux_get(aux, "coord")
        x, y = coord[..., 0], coord[..., 1]
        msef = (F0 * jnp.cos(2 * jnp.pi * x / x0) ** 2
                * jnp.cos(2 * jnp.pi * y / x0) ** 2)
        return jnp.where(t < t1, msef, 0.0)

    bc_bottom = cm.AtmosBC(energy=cm.PrescribedEnergyFlux(energyflux))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(),))

    dc = cm.AtmosLESConfiguration(
        "surfacebubble", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], args.domain[2], model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    cm.invoke(sc)

    rho = model.prog(sc.q, "rho")
    w = model.prog(sc.q, "rhou")[..., 2] / rho
    print(f"max w: {float(jnp.max(w)):.4f} m/s   "
          f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}")


if __name__ == "__main__":
    main()
