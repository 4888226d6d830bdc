"""GCM-driven cfsite LES (reference experiments/AtmosLES/
cfsite_hadgem2-a_07_amip.jl): a limited-area LES forced by HadGEM2-A
AMIP column profiles — large-scale temperature/moisture tendencies,
GCM subsidence, a wind-relaxation sponge, u*-pinned surface drag, and
prescribed latent/sensible surface fluxes, with EquilMoist + Vreman SGS.

The reference reads its profiles from the HadGEM2-A_amip.2004-2008.07
NetCDF artifact (get_gcm_info :241-331); this environment has no network
access, so the example ships an analytic marine shallow-cumulus sounding
shaped like the site-07 JJA column (trade-wind layer, inversion,
subsidence aloft, ~-1.5 K/day radiative+advective cooling).  Swap
``hadgem_like_profile`` for interpolated NetCDF columns to run real
cfsite data — ``HadGEMVertical(profile)`` accepts any callable z->dict::

    python examples/cfsite_amip.py --timeend 60 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.atmos.lsforcing import (HadGEMVertical,
                                                LargeScaleProcess,
                                                LargeScaleSubsidence,
                                                LinearSponge)
from climatemachine_tpu.mesh.filters import tmar

# AMIP surface forcing for the site (reference main: hfls/hfss/ts from
# the NetCDF group means); representative site-07 JJA values
HFLS, HFSS, TS = 100.0, 10.0, 289.0
U_STAR = 0.28                 # reference config_cfsites :392
GAMMA = 6.0e-3                # tropospheric lapse rate (K/m)
T_SFC = 287.0


def hadgem_like_profile(z):
    """Analytic stand-in for the site-07 HadGEM2-A column (CMIP names;
    w_s = -wap/(rho g) conversion already applied, reference
    init_cfsites! :380)."""
    ta = T_SFC - GAMMA * z
    hus = 0.0088 * jnp.exp(-z / 1800.0)
    ua = jnp.full_like(z, -5.0)
    va = jnp.full_like(z, -2.0)
    # radiative (tntr ~ -1.5 K/day) + horizontal/vertical advective
    # temperature tendencies
    temp_tendency = jnp.full_like(z, -1.7e-5)
    # drying by large-scale advection
    qt_tendency = jnp.full_like(z, -4.0e-9)
    # subsidence ramping to ~-4.5 mm/s by 2 km (descending branch)
    w_s = -4.5e-3 * jnp.clip(z / 2000.0, 0.0, 1.0)
    return dict(ta=ta, hus=hus, ua=ua, va=va,
                temp_tendency=temp_tendency, qt_tendency=qt_tendency,
                w_s=w_s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(75.0, 75.0, 20.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(1800.0, 1800.0, 4000.0))
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=600.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    xmax, ymax, zmax = args.domain

    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(T_SFC, 220.0)),
        turbulence=cm.Vreman(0.23),          # reference config_cfsites
        moisture=cm.EquilMoist(),
        lsforcing=HadGEMVertical(hadgem_like_profile))

    def init(m, coords, aux, t):
        """reference init_cfsites!: state from the GCM column (here the
        closed-form sounding; pfull follows hydrostatically from ta)."""
        z = coords[..., 2]
        prof = hadgem_like_profile(z)
        ta, hus = prof["ta"], prof["hus"]
        # constant-lapse hydrostatic pressure for the synthetic column
        pfull = ps.MSLP * (ta / T_SFC) ** (ps.grav / (ps.R_d * GAMMA))
        pp = cm.td.PhasePartition(hus, jnp.zeros_like(hus),
                                  jnp.zeros_like(hus))
        R_m = cm.td.gas_constant_air(ps, pp)
        rho = pfull / (R_m * ta)
        ua, va = prof["ua"], prof["va"]
        e_kin = 0.5 * (ua ** 2 + va ** 2)
        rhoe = rho * (cm.td.internal_energy(ps, ta, pp) + e_kin
                      + ps.grav * z)
        # deterministic seed perturbations below 400 m (the reference
        # adds 1% RNG noise, init_cfsites! :369-373; a fixed-phase mode
        # keeps the example reproducible on any backend)
        x, y = coords[..., 0], coords[..., 1]
        bump = jnp.where(
            z <= 400.0,
            2e-3 * jnp.sin(np.pi * x / 300.0) * jnp.sin(np.pi * y / 300.0)
            * jnp.sin(np.pi * z / 400.0), 0.0)
        rhoe = rhoe * (1.0 + bump)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        u = jnp.stack([ua, va, jnp.zeros_like(z)], axis=-1)
        q = m.prog_spec.set(q, "rhou", rho[..., None] * u)
        return m.prog_spec.set(q, "moisture.rhoq_tot",
                               rho * hus * (1.0 + bump))

    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(
            lambda m, q, aux, t, norm_u: (U_STAR / norm_u) ** 2)),
        energy=cm.PrescribedEnergyFlux(HFLS + HFSS),
        moisture=cm.PrescribedMoistureFlux(
            lambda m, q, aux, t: HFLS / cm.td.latent_heat_vapor(ps, TS)))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=(cm.Gravity(),
                 LinearSponge(z_max=zmax, z_sponge=zmax * 0.85,
                              alpha_max=1.0, gamma=4.0),
                 LargeScaleProcess(),
                 LargeScaleSubsidence()))

    dc = cm.AtmosLESConfiguration(
        "cfsite_amip", args.poly, tuple(args.resolution), xmax, ymax,
        zmax, model, dtype=np.float64)
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.2)
    print(f"dt = {sc.dt:.3f} s, elements = {dc.grid.nelem}")

    qtot_idx = [model.prog_spec.index("moisture.rhoq_tot").start]
    step = jax.jit(sc.solver.step)
    q, aux, t = sc.q, sc.aux, 0.0
    nsteps = int(round(args.timeend / sc.dt))
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        # per-step TMAR positivity on q_tot (reference cbtmarfilter)
        q = tmar(dc.grid, q, qtot_idx)
        t += sc.dt
        if i % max(nsteps // 5, 1) == 0:
            w = model.prog(q, "rhou")[..., 2] / model.prog(q, "rho")
            qt = model.prog(q, "moisture.rhoq_tot") / model.prog(q, "rho")
            print(f"t = {t:8.2f} s  max|w| = {float(jnp.max(jnp.abs(w))):.4f}"
                  f" m/s  q_tot in [{float(jnp.min(qt))*1e3:.3f},"
                  f" {float(jnp.max(qt))*1e3:.3f}] g/kg")
    finite = bool(jnp.all(jnp.isfinite(q)))
    print(f"finite: {finite}")
    assert finite


if __name__ == "__main__":
    main()
