"""Dry convective boundary layer LES (reference
experiments/AtmosLES/convective_bl_les.jl + convective_bl_model.jl).

theta = 288 K + 4 K/km, hydrostatic Exner initial state, Smagorinsky
(C_s = 0.23), bulk surface fluxes against a diurnally heating surface
theta_sfc = 291.15 + 20 sin(pi t / 12 h), geostrophic relaxation (4 m/s)
and a Rayleigh sponge above 2560 m.

Smoke run::

    python examples/convective_bl_les.py --timeend 60 --platform cpu
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
                   default=(80.0, 80.0, 40.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(4800.0, 4800.0, 3200.0))
    p.add_argument("--timeend", type=float, default=360.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    C_drag = 0.001
    z_sponge = 2560.0
    u_geo, v_geo = 4.0, 0.0
    f_cor = 1.031e-4
    zmax = args.domain[2]

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(290.0, 220.0)),
        turbulence=cm.SmagorinskyLilly(0.23))

    def init(m, coords, aux, t):
        z = coords[..., 2]
        theta = 288.0 + 4.0e-3 * z
        # hydrostatic Exner built on theta itself
        # (convective_bl_model.jl:144-145)
        exner = 1.0 - ps.grav / (ps.cp_d * theta) * z
        rho = (ps.MSLP / (ps.R_d * theta)
               * exner ** (ps.cv_d / ps.R_d))
        T = theta * exner
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        rhoe = rho * (cm.td.internal_energy(ps, T) + Phi)
        return m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                                batch_shape=rho.shape)

    def surface_T(model, q, aux, t):
        """theta_sfc -> T at the local surface density
        (convective_bl_model.jl:176-185)."""
        theta_sfc = 291.15 + 20.0 * jnp.sin(jnp.pi * t / (12 * 3600.0))
        rho = model.prog(q, "rho")
        # PhaseDry_rho-theta: T = theta (rho R theta / p0)^(R/cv)
        return theta_sfc * (rho * ps.R_d * theta_sfc / ps.MSLP) \
            ** (ps.R_d / ps.cv_d)

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(C_drag)),
        energy=cm.BulkFormulaEnergy(
            C_h=lambda model, q, aux, t, speed: C_drag,
            T_sfc=surface_T))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(),
                 cm.GeostrophicForcing(f_cor, u_geo, v_geo),
                 cm.RayleighSponge(z_max=zmax, z_sponge=z_sponge,
                                   alpha_max=0.75,
                                   u_relaxation=(u_geo, v_geo, 0.0))))

    dc = cm.AtmosLESConfiguration(
        "convective_bl", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], zmax, model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    cm.invoke(sc)

    rho = model.prog(sc.q, "rho")
    w = model.prog(sc.q, "rhou")[..., 2] / rho
    print(f"max |w|: {float(jnp.max(jnp.abs(w))):.4f} m/s   "
          f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}")


if __name__ == "__main__":
    main()
