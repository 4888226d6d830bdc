"""BOMEX shallow-cumulus LES — plain (non-EDMF) variant (reference
experiments/AtmosLES/bomex_les.jl + bomex_model.jl).

Moist equilibrium physics with Smagorinsky (C_s = 0.23); the BOMEX
forcing set: large-scale moisture sink + radiative cooling + prescribed
subsidence advection (BomexTendencies, bomex_model.jl:152-246),
altitude-sloped geostrophic relaxation (BomexGeostrophic, :80-104),
Rayleigh sponge relaxing to the sloped geostrophic wind (BomexSponge,
:109-146).  Surface: u_star DragLaw + prescribed (or bulk) latent +
sensible heat and moisture fluxes (:431-449).

Smoke run::

    python examples/bomex_les.py --timeend 3 --platform cpu \
        --resolution 800 800 375
"""

import argparse
import sys
from dataclasses import dataclass

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.atmos.sources import Source
from climatemachine_tpu.mesh.filters import tmar

ps = cm.EARTH

# BOMEX constants (bomex_model.jl:359-387)
C_SMAG = 0.23
U_STAR = 0.28
T_SFC, Q_SFC = 300.4, 22.45e-3
LHF, SHF = 147.2, 9.5
DQTDT_PEAK = -1.2e-8
ZL_MOIST, ZH_MOIST = 300.0, 500.0
DTHDT_PEAK = -2.0 / 86400.0
Z_SPONGE, ALPHA_MAX, GAMMA_SP = 2400.0, 0.75, 2.0
U_GEO, U_SLOPE, V_GEO = -10.0, 1.8e-3, 0.0
ZL_SUB, ZH_SUB, W_SUB = 1500.0, 2100.0, -0.65e-2
F_CORIOLIS = 0.376e-4


def _z(model, aux):
    return model.aux_get(aux, "orientation.Phi") / ps.grav


@dataclass(frozen=True)
class BomexGeostrophic(Source):
    """-f ẑ × (ρu − ρ u_geo(z)) with sloped u_geo (bomex_model.jl:93)."""
    z_max: float

    def contributions(self, model, q, gf, aux, t):
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        z = _z(model, aux)
        u_geo = jnp.stack([U_GEO + U_SLOPE * z,
                           jnp.full_like(z, V_GEO),
                           jnp.zeros_like(z)], axis=-1)
        m = rhou - rho[..., None] * u_geo
        fk = jnp.asarray([0.0, 0.0, F_CORIOLIS], dtype=q.dtype)
        return {"rhou": -jnp.cross(jnp.broadcast_to(fk, m.shape), m)}


@dataclass(frozen=True)
class BomexSponge(Source):
    """Rayleigh sponge to the sloped geostrophic wind
    (bomex_model.jl:128)."""
    z_max: float

    def contributions(self, model, q, gf, aux, t):
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        z = _z(model, aux)
        u_geo = jnp.stack([U_GEO + U_SLOPE * z,
                           jnp.full_like(z, V_GEO),
                           jnp.zeros_like(z)], axis=-1)
        r = jnp.clip((z - Z_SPONGE) / (self.z_max - Z_SPONGE), 0.0, 1.0)
        beta = ALPHA_MAX * jnp.sin(jnp.pi / 2 * r) ** GAMMA_SP
        return {"rhou": -beta[..., None]
                * (rhou - rho[..., None] * u_geo)}


@dataclass(frozen=True)
class BomexTendencies(Source):
    """Large-scale moisture sink, radiative cooling, and subsidence
    advection of h_tot/q_tot (bomex_model.jl:173-246)."""
    z_max: float

    def contributions(self, model, q, gf, aux, t):
        if gf is None:
            return {}
        rho = model.prog(q, "rho")
        z = _z(model, aux)

        lin_m = (z - ZL_MOIST) / (ZH_MOIST - ZL_MOIST)
        rdqdt = rho * jnp.where(
            z <= ZL_MOIST, DQTDT_PEAK,
            jnp.where(z <= ZH_MOIST, DQTDT_PEAK * (1 - lin_m), 0.0))
        lin_t = (z - ZL_SUB) / (self.z_max - ZL_SUB)
        rdthdt = rho * jnp.where(
            z <= ZL_SUB, DTHDT_PEAK,
            jnp.where(z <= self.z_max, DTHDT_PEAK * (1 - lin_t), 0.0))
        lin_s = (z - ZL_SUB) / (ZH_SUB - ZL_SUB)
        w_s = jnp.where(
            z <= ZL_SUB, z * W_SUB / ZL_SUB,
            jnp.where(z <= ZH_SUB, W_SUB * (1 - lin_s), 0.0))

        T, p, _, pp = model.thermo_full(q, aux)
        cvm = cm.td.cv_m(ps, pp)
        exn = cm.td.exner(ps, p, pp)
        d_h = model.gf_spec.get(gf, "d_h_tot")[..., 2]
        d_q = model.gf_spec.get(gf, "moisture.d_q_tot")[..., 2]
        adv_q = rho * w_s * d_q
        return {"rho": rdqdt - adv_q,
                "rhoe": (cvm * rdthdt * exn + ps.e_int_v0 * rdqdt
                         - rho * w_s * d_h),
                "moisture.rhoq_tot": rdqdt - adv_q}


def init_bomex(m, coords, aux, t):
    """Piecewise BOMEX soundings (bomex_model.jl:253-343)."""
    z = coords[..., 2]
    zl1, zl2, zl3, zl4 = 520.0, 1480.0, 2000.0, 3000.0
    th = jnp.where(
        z <= zl1, 298.7,
        jnp.where(z <= zl2, 298.7 + (z - zl1) * (302.4 - 298.7) / (zl2 - zl1),
                  jnp.where(z <= zl3,
                            302.4 + (z - zl2) * (308.2 - 302.4) / (zl3 - zl2),
                            308.2 + (z - zl3) * (311.85 - 308.2)
                            / (zl4 - zl3))))
    qt = jnp.where(
        z <= zl1, 17.0 + (z / zl1) * (16.3 - 17.0),
        jnp.where(z <= zl2, 16.3 + (z - zl1) * (10.7 - 16.3) / (zl2 - zl1),
                  jnp.where(z <= zl3,
                            10.7 + (z - zl2) * (4.2 - 10.7) / (zl3 - zl2),
                            4.2 + (z - zl3) * (3.0 - 4.2)
                            / (zl4 - zl3)))) / 1000.0
    zlv = 700.0
    u = jnp.where(z <= zlv, -8.75,
                  -8.75 + (z - zlv) * (-4.61 + 8.75) / (zl4 - zlv))

    P_sfc = 1.015e5
    Rm_sfc = cm.td.gas_constant_air(ps, cm.td.PhasePartition.vapor(
        jnp.asarray(Q_SFC)))
    H = Rm_sfc * T_SFC / ps.grav
    p = P_sfc * jnp.exp(-z / H)
    T = cm.td.temperature_from_theta_liq(ps, p, th, qt)
    rho = p / (cm.td.gas_constant_air(
        ps, cm.td.PhasePartition.vapor(qt)) * T)
    # saturation-adjusted internal energy at (T, rho, qt)
    pp = cm.td.phase_partition_equil(ps, T, rho, qt)
    e_int = cm.td.internal_energy(ps, T, pp)
    Phi = m.aux_spec.get(aux, "orientation.Phi")
    rhoe = rho * (e_int + 0.5 * u ** 2 + Phi)
    q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe,
                          "moisture.rhoq_tot": rho * qt},
                         batch_shape=rho.shape)
    return m.prog_spec.set(
        q, "rhou", jnp.stack([rho * u, jnp.zeros_like(u),
                              jnp.zeros_like(u)], axis=-1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(100.0, 100.0, 40.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(6400.0, 6400.0, 3000.0))
    p.add_argument("--timeend", type=float, default=1200.0)
    p.add_argument("--surface-flux", default="prescribed",
                   choices=["prescribed", "bulk"])
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    zmax = args.domain[2]

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(290.0, 220.0)),
        turbulence=cm.SmagorinskyLilly(C_SMAG),
        moisture=cm.EquilMoist(maxiter=5))

    if args.surface_flux == "prescribed":
        energy_bc = cm.PrescribedEnergyFlux(lambda m, q, a, t: LHF + SHF)
        moist_bc = cm.PrescribedMoistureFlux(
            lambda m, q, a, t: LHF / cm.td.latent_heat_vapor(ps, T_SFC))
    else:
        energy_bc = cm.BulkFormulaEnergy(
            C_h=lambda m, q, a, t, speed: 0.0011,
            T_sfc=lambda t: T_SFC)
        moist_bc = cm.BulkFormulaMoisture(C_q=0.0011, q_tot_sfc=Q_SFC)

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(
            lambda m, q, a, t, speed: (U_STAR / speed) ** 2)),
        energy=energy_bc, moisture=moist_bc)
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init_bomex,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(), BomexTendencies(zmax),
                 BomexSponge(zmax), BomexGeostrophic(zmax)))

    dc = cm.AtmosLESConfiguration(
        "bomex_les", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], zmax, model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.35)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")

    # TMAR positivity on total moisture every step (reference
    # cbtmarfilter, bomex_les.jl:104-112)
    from climatemachine_tpu.ode.callbacks import EveryXSimulationSteps
    qt_slot = [model.prog_spec.flattened_names().index(
        "moisture.rhoq_tot")]

    def apply_tmar(state):
        state.q = tmar(dc.grid, state.q, fields=qt_slot)

    cm.invoke(sc, user_callbacks=[EveryXSimulationSteps(apply_tmar, 1)])

    rho = model.prog(sc.q, "rho")
    qt = model.prog(sc.q, "moisture.rhoq_tot") / rho
    w = model.prog(sc.q, "rhou")[..., 2] / rho
    print(f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}   "
          f"max w: {float(jnp.max(jnp.abs(w))):.3f} m/s   "
          f"q_tot range: [{float(jnp.min(qt)) * 1e3:.2f}, "
          f"{float(jnp.max(qt)) * 1e3:.2f}] g/kg")


if __name__ == "__main__":
    main()
