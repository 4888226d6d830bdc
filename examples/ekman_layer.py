"""Ekman layer LES (reference experiments/AtmosLES/ekman_layer_model.jl).

Neutral boundary layer at 73N: geostrophic forcing (f = 1.39e-4, u_geo
= 1 m/s), constant-viscosity closure (nu = 0.1 m^2/s, the reference
default), u_star DragLaw surface with zero energy flux, Rayleigh sponge
above 300 m.  The steady state is the classic Ekman spiral
u + iv = u_geo (1 - exp(-(1+i) z/delta)) with delta = sqrt(2 nu / f);
the run reports the simulated hodograph against it.

Smoke::

    python examples/ekman_layer.py --timeend 30 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm

U_GEO, V_GEO = 1.0, 0.0
F_COR = 1.39e-4
Z_SPONGE, ALPHA_MAX = 300.0, 0.75
U_STAR = 0.3
NU = 0.1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(50.0, 50.0, 20.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(200.0, 200.0, 400.0))
    p.add_argument("--timeend", type=float, default=3600.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    ps = cm.EARTH
    zmax = args.domain[2]
    theta_sfc = 300.0

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DryAdiabaticProfile(theta_sfc, 0.0)),
        turbulence=cm.ConstantKinematicViscosity(NU))

    def init(m, coords, aux, t):
        z = coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = theta_sfc * (pr / ps.MSLP) ** ps.kappa_d
        rho = pr / (ps.R_d * T)
        u = jnp.full_like(rho, 1.0)
        e_kin = 0.5 * u ** 2
        rhoe = rho * (cm.td.internal_energy(ps, T) + e_kin + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(
            q, "rhou", jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(
            lambda m, q, a, t, speed: (U_STAR / speed) ** 2)),
        energy=cm.PrescribedEnergyFlux(lambda m, q, a, t: 0.0))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(),
                 cm.GeostrophicForcing(F_COR, U_GEO, V_GEO),
                 cm.RayleighSponge(z_max=zmax, z_sponge=Z_SPONGE,
                                   alpha_max=ALPHA_MAX,
                                   u_relaxation=(U_GEO, V_GEO, 0.0))))

    dc = cm.AtmosLESConfiguration(
        "ekman_layer", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], zmax, model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    cm.invoke(sc)

    q = sc.q
    rho = model.prog(q, "rho")
    u = model.prog(q, "rhou")[..., 0] / rho
    v = model.prog(q, "rhou")[..., 1] / rho
    delta = float(np.sqrt(2 * NU / F_COR))
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"Ekman depth delta = {delta:.1f} m")
    z = dc.grid.coords[..., 2]
    for ztarget in (0.25 * delta, delta, 2 * delta):
        m_ = jnp.abs(z - ztarget) < 10.0
        um = float(jnp.sum(jnp.where(m_, u, 0.0)) / jnp.maximum(
            jnp.sum(m_), 1))
        vm = float(jnp.sum(jnp.where(m_, v, 0.0)) / jnp.maximum(
            jnp.sum(m_), 1))
        print(f"  z ~ {ztarget:5.1f} m: (u, v) = ({um:+.3f}, {vm:+.3f})")
    assert bool(jnp.all(jnp.isfinite(q)))


if __name__ == "__main__":
    main()
