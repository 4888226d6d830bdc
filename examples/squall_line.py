"""Squall line / deep convection with warm-rain microphysics (reference
experiments/AtmosLES/squall_line.jl).

Weisman-Klemp analytic sounding (CAPE-bearing θ/RH profiles), a 3 K
thermal trigger, EquilMoist saturation adjustment + 1-moment warm-rain
microphysics with sedimentation.  Storm development needs ~30+ min of
simulated time; the smoke run just spins up the updraft::

    python examples/squall_line.py --timeend 60 --platform cpu
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
                   default=(250.0, 1000.0, 200.0))
    p.add_argument("--timeend", type=float, default=60.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    theta_0, theta_tr, T_tr, z_tr = 300.0, 343.0, 213.0, 12e3

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(300.0, 213.0)),
        turbulence=cm.SmagorinskyLilly(0.18),
        moisture=cm.EquilMoist(),
        precipitation=cm.RainModel())

    def init(m, coords, aux, t):
        s = m.aux_spec
        pr = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        x, z = coords[..., 0], coords[..., 2]
        # Weisman-Klemp sounding
        frac = jnp.clip(z / z_tr, 0.0, 1.0) ** 1.25
        theta = jnp.where(
            z <= z_tr, theta_0 + (theta_tr - theta_0) * frac,
            theta_tr * jnp.exp(ps.grav * (z - z_tr) / (ps.cp_d * T_tr)))
        rh = jnp.where(z <= z_tr, 1.0 - 0.75 * frac, 0.25)
        T = theta * (pr / ps.MSLP) ** ps.kappa_d
        # thermal trigger
        r = jnp.sqrt(((x - 15e3) / 10e3) ** 2 + ((z - 2e3) / 1.5e3) ** 2)
        T = T + 3.0 * jnp.clip(1 - r, 0.0, 1.0)
        q_sat = cm.td.q_vap_saturation(ps, T, pr / (ps.R_d * T)) \
            if hasattr(cm.td, "q_vap_saturation") else 0.0
        q_tot = jnp.minimum(rh * q_sat, 0.014)
        pp = cm.td.PhasePartition(q_tot, jnp.zeros_like(q_tot),
                                  jnp.zeros_like(q_tot))
        rho = pr / (cm.td.gas_constant_air(ps, pp) * T)
        rhoe = rho * (cm.td.internal_energy(ps, T, pp) + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "moisture.rhoq_tot", rho * q_tot)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))

    dc = cm.AtmosLESConfiguration(
        "squall_line", 4, tuple(args.resolution), 30e3, 4000.0, 16e3,
        model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.3)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")
    cm.invoke(sc)

    ql = model.aux_get(sc.aux, "moisture.q_liq")
    qr = model.prog(sc.q, "precipitation.rhoq_rai") \
        / model.prog(sc.q, "rho")
    w = model.prog(sc.q, "rhou")[..., 2] / model.prog(sc.q, "rho")
    print(f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}   "
          f"max w: {float(jnp.max(w)):.2f} m/s   "
          f"max q_liq: {float(jnp.max(ql))*1e3:.3f} g/kg   "
          f"max q_rai: {float(jnp.max(qr))*1e6:.3f} mg/kg")


if __name__ == "__main__":
    main()
