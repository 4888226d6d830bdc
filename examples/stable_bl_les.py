"""GABLS stable boundary layer LES (reference
experiments/AtmosLES/stable_bl_les.jl + stable_bl_model.jl).

Strongly stable BL at 73N: theta = 265 K below 100 m then +0.01 K/m,
u = 8 m/s, u*-pinned surface drag ((u_star/|u|)^2 drag law), cooling
surface (-0.25 K/h), geostrophic relaxation + Rayleigh sponge.

Surface-flux variants (reference stable_bl_model.jl:256-291):
  bulk        BulkFormulaEnergy/Moisture with C_drag(param_set)
  custom_sbl  PrescribedTemperature (Dirichlet, cooling surface)

Smoke run::

    python examples/stable_bl_les.py --timeend 60 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm


def surface_temperature(t):
    """reference stable_bl_model.jl:184: 265 K cooling at 0.25 K/h."""
    return 265.0 - 0.25 * (t / 3600.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(20.0, 20.0, 10.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(100.0, 100.0, 400.0))
    p.add_argument("--timeend", type=float, default=360.0)
    p.add_argument("--surface-flux", default="bulk",
                   choices=["bulk", "custom_sbl"])
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    u_star = 0.30
    C_drag = 0.0044              # CLIMAParameters C_drag
    z_sponge = 300.0
    u_geo, v_geo = 8.0, 0.0
    f_cor = 1.39e-4              # 73N
    zmax = args.domain[2]

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(290.0, 220.0)),
        turbulence=cm.ConstantKinematicViscosity(0.0))

    def init(m, coords, aux, t):
        z = coords[..., 2]
        theta = jnp.where(z <= 100.0, 265.0,
                          265.0 + 0.01 * jnp.maximum(z - 100.0, 0.0))
        pr = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        exner = (pr / ps.MSLP) ** ps.kappa_d
        T = theta * exner
        rho = pr / (ps.R_d * T)
        u = jnp.stack([jnp.full_like(z, u_geo), jnp.zeros_like(z),
                       jnp.zeros_like(z)], axis=-1)
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        rhoe = rho * (cm.td.internal_energy(ps, T) + ke + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rho[..., None] * u)

    # u*-pinned drag: C_d = (u_star / |u_t|)^2 (stable_bl_model.jl:308)
    def drag_coef(model, q, aux, t, speed):
        return (u_star / jnp.maximum(speed, 1e-4)) ** 2

    if args.surface_flux == "bulk":
        energy_bc = cm.BulkFormulaEnergy(
            C_h=lambda model, q, aux, t, speed: C_drag,
            T_sfc=lambda t: surface_temperature(t))
    else:
        energy_bc = cm.PrescribedTemperature(
            T_sfc=lambda t: surface_temperature(t))

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(drag_coef)),
        energy=energy_bc)
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
        "stable_bl", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], zmax, model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}, "
          f"surface_flux = {args.surface_flux}")
    cm.invoke(sc)

    rho = model.prog(sc.q, "rho")
    u = model.prog(sc.q, "rhou") / rho[..., None]
    T, _, _ = model.recover_thermo(sc.q, sc.aux)
    z = dc.grid.coords[..., 2]
    near = z < 20.0
    print(f"max |u|: {float(jnp.max(jnp.abs(u))):.3f} m/s   "
          f"near-surface T: {float(jnp.sum(T*near)/jnp.sum(near)):.2f} K   "
          f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}")


if __name__ == "__main__":
    main()
