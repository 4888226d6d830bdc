"""DYCOMS-II RF01 nocturnal stratocumulus LES (reference
experiments/AtmosLES/dycoms.jl).

Two-layer liquid-water potential-temperature / total-water profile with a
sharp inversion at z_i = 840 m, geostrophic winds (7, −5.5) m/s,
Smagorinsky SGS closure, prescribed surface latent/sensible heat fluxes,
DYCOMS longwave radiation (Stevens et al. 2005), large-scale subsidence,
and a Rayleigh sponge.  Short smoke run::

    python examples/dycoms.py --timeend 30 --platform cpu
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
                   default=(35.0, 35.0, 20.0))
    p.add_argument("--timeend", type=float, default=60.0)
    p.add_argument("--diagnostics-every", type=int, default=0,
                   help="write AtmosLESDefault NetCDF profiles every N "
                        "steps (0 = off)")
    p.add_argument("--out", default="/tmp/dycoms")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    z_i = 840.0
    LHF, SHF = 115.0, 15.0            # W/m^2 (reference dycoms.jl:345)
    C_drag = 0.0011
    D_sub = 3.75e-6
    u_geo, v_geo = 7.0, -5.5
    f_cor = 7.62e-5

    rad = cm.DYCOMSRadiationModel(kappa=85.0, alpha_z=1.0, z_i=z_i,
                                  rho_i=1.13, D_subsidence=D_sub,
                                  F_0=70.0, F_1=22.0)
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(289.0, 220.0)),
        turbulence=cm.SmagorinskyLilly(0.21),
        moisture=cm.EquilMoist(),
        radiation=rad)

    def init(m, coords, aux, t):
        s = m.aux_spec
        pr = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        z = coords[..., 2]
        # two-layer θ_liq / q_tot (reference dycoms.jl init: RF01)
        below = z <= z_i
        theta_liq = jnp.where(below, 289.0,
                              297.5 + jnp.cbrt(jnp.maximum(z - z_i, 0.0)))
        q_tot = jnp.where(below, 9.0e-3, 1.5e-3)
        T = cm.td.temperature_from_theta_liq(ps, pr, theta_liq, q_tot)
        R_m = cm.td.gas_constant_air(
            ps, cm.td.PhasePartition(q_tot, jnp.zeros_like(q_tot),
                                     jnp.zeros_like(q_tot)))
        rho = pr / (R_m * T)
        u = jnp.stack([jnp.full_like(z, u_geo), jnp.full_like(z, v_geo),
                       jnp.zeros_like(z)], axis=-1)
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        pphase = cm.td.PhasePartition(q_tot, jnp.zeros_like(q_tot),
                                      jnp.zeros_like(q_tot))
        rhoe = rho * (cm.td.internal_energy(ps, T, pphase) + ke + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        q = m.prog_spec.set(q, "rhou", rho[..., None] * u)
        return m.prog_spec.set(q, "moisture.rhoq_tot", rho * q_tot)

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(C_drag)),
        energy=cm.PrescribedEnergyFlux(LHF + SHF),
        moisture=cm.PrescribedMoistureFlux(
            lambda m, q, aux, t: LHF / ps.LH_v0))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(),
                 cm.GeostrophicForcing(f_cor, u_geo, v_geo),
                 cm.Subsidence(D_sub),
                 cm.RayleighSponge(z_max=1500.0, z_sponge=1125.0,
                                   alpha_max=1.0,
                                   u_relaxation=(u_geo, v_geo, 0.0))))

    dc = cm.AtmosLESConfiguration(
        "dycoms", 4, tuple(args.resolution), 840.0, 840.0, 1500.0, model,
        dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.3)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    cbs = []
    if args.diagnostics_every:
        from climatemachine_tpu.diagnostics.atmos_les import \
            AtmosLESDefaultGroup
        from climatemachine_tpu.io.writers import NetCDFWriter
        grp = AtmosLESDefaultGroup(sc.dg, writer=NetCDFWriter(),
                                   out_path=f"{args.out}_profiles.nc")
        cbs.append(grp.make_callback(args.diagnostics_every))
        print(f"AtmosLESDefault profiles -> {args.out}_profiles.nc")
    cm.invoke(sc, user_callbacks=cbs)

    qliq = model.aux_get(sc.aux, "moisture.q_liq")
    w = model.prog(sc.q, "rhou")[..., 2] / model.prog(sc.q, "rho")
    print(f"max q_liq: {float(jnp.max(qliq))*1e3:.3f} g/kg   "
          f"max |w|: {float(jnp.max(jnp.abs(w))):.3f} m/s")


if __name__ == "__main__":
    main()
