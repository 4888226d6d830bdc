"""Canopy LES with prognostic SGS-TKE (the reference fork's own test
case, test_for_Jisu/canopy_sgstke.jl, after Patton et al. 2016).

100 m^3 box at p4 (10 m horizontal / 5 m vertical resolution): a 20 m
vegetation canopy exerts form drag on momentum and destroys SGS TKE
(CanopyAerodynamics, canopy_sgstke.jl:42-97), transpires moisture
against the vapor pressure deficit and takes up a CO2 tracer at the GPP
rate (CanopyAtmoInteraction, :99-152).  Equilibrium moisture, Deardorff
closure + SGStkeModel with shear/buoyancy production and dissipation
(:332-333), surface drag C_d = 0.0011, prescribed latent+sensible heat
flux and moisture flux (:373-380), theta = 300 K below 2 h_c with a
3 K/km lapse above, 5 m/s geostrophic inflow (init_canopy_moist!,
:222-295).

Smoke run::

    python examples/canopy_sgstke.py --timeend 5 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.atmos.canopy import (CanopyAerodynamics,
                                             CanopyAtmoInteraction)
from climatemachine_tpu.atmos.sgstke import SGStkeModel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, nargs=3,
                   default=(10.0, 10.0, 5.0))
    p.add_argument("--domain", type=float, nargs=3,
                   default=(100.0, 100.0, 100.0))
    p.add_argument("--timeend", type=float, default=600.0)
    p.add_argument("--moisture", default="equilibrium",
                   choices=["dry", "equilibrium"])
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    # canopy constants (canopy_sgstke.jl:440-446)
    c_d, LAI, h_c = 0.2, 2.0, 20.0
    G_veg, GPP = 0.2, 1.0
    dz = args.resolution[2]
    C_drag = 0.0011
    LHF, SHF = 50.0, 15.0
    ugeo = 5.0
    q_tot0 = 1e-3
    dry = args.moisture == "dry"

    moisture = cm.DryModel() if dry else cm.EquilMoist(maxiter=5)
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 0.0)),
        turbulence=cm.Deardorff(),
        moisture=moisture,
        tracers=cm.NTracers((1.6e-5,)),       # CO2 diffusivity
        sgstke=SGStkeModel())

    def init(m, coords, aux, t):
        """init_canopy_moist!/init_canopy_dry! (canopy_sgstke.jl:222-295):
        theta = 300 K to 2 h_c then 3 K/km lapse, hydrostatic, 5 m/s
        geostrophic u, e_SGS = 0.2 e_kin, CO2 = 340 ppm."""
        z = coords[..., 2]
        theta = jnp.where(z <= 2 * h_c, 300.0,
                          300.0 - 3e-3 * (z - 2 * h_c))
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        if dry:
            exner = 1.0 - ps.grav / (ps.cp_d * theta) * z
            rho = (ps.MSLP / (ps.R_d * theta)
                   * exner ** (ps.cv_d / ps.R_d))
            T = theta * exner
            e_int = cm.td.internal_energy(ps, T)
        else:
            pp = cm.td.PhasePartition.vapor(jnp.full_like(z, q_tot0))
            Rm = cm.td.gas_constant_air(ps, pp)
            H = Rm * 300.0 / ps.grav
            pz = ps.MSLP * jnp.exp(-z / H)
            exner = (pz / ps.MSLP) ** (ps.kappa_d)
            T = theta * exner
            rho = pz / (Rm * T)
            e_int = cm.td.internal_energy(ps, T, pp)
        e_kin = 0.5 * ugeo ** 2
        fields = {"rho": rho, "rhoe": rho * (e_int + e_kin + Phi),
                  "sgstke.rhoe_SGS": rho * 0.2 * e_kin,
                  "tracers.rhochi": (3.4e-4 * rho)[..., None]}
        if not dry:
            fields["moisture.rhoq_tot"] = rho * q_tot0
        q = m.prog_spec.pack(fields, batch_shape=rho.shape)
        rhou = jnp.stack([rho * ugeo, jnp.zeros_like(rho),
                          jnp.zeros_like(rho)], axis=-1)
        return m.prog_spec.set(q, "rhou", rhou)

    moisture_bc = {} if dry else {
        "moisture": cm.PrescribedMoistureFlux(
            lambda model, q, aux, t: LHF / ps.LH_v0)}
    bc_bottom = cm.AtmosBC(
        momentum=cm.Impenetrable(cm.DragLaw(C_drag)),
        energy=cm.PrescribedEnergyFlux(
            lambda model, q, aux, t: LHF + SHF),
        **moisture_bc)

    sources = (cm.Gravity(),
               CanopyAerodynamics(c_d, h_c, LAI, dz),
               CanopyAtmoInteraction(h_c, LAI, dz, G_veg, GPP))
    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(bc_bottom, cm.AtmosBC())),
        sources=sources)

    dc = cm.AtmosLESConfiguration(
        "canopy_sgstke", 4, tuple(args.resolution), args.domain[0],
        args.domain[1], args.domain[2], model, dtype=np.float64)
    sc = cm.make_solver_configuration(
        0.0, args.timeend, dc, Courant_number=0.1,
        ode_solver_type=cm.ExplicitSolverType(
            solver_method=cm.LSRK144NiegemannDiehlBusch))
    print(f"dt = {sc.dt:.4f} s, elements = {dc.grid.nelem}")
    cm.invoke(sc)

    rho = model.prog(sc.q, "rho")
    z = dc.grid.coords[..., 2]
    in_canopy = z <= h_c
    u = model.prog(sc.q, "rhou")[..., 0] / rho
    e_sgs = model.prog(sc.q, "sgstke.rhoe_SGS") / rho
    chi = model.prog(sc.q, "tracers.rhochi")[..., 0] / rho
    print(f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}")
    print(f"mean u in canopy:  {float(jnp.mean(jnp.where(in_canopy, u, 0)) / jnp.mean(in_canopy)):.3f} m/s (init 5.0)")
    print(f"max e_SGS: {float(jnp.max(e_sgs)):.4f} m2/s2")
    print(f"min CO2:   {float(jnp.min(chi)) * 1e6:.2f} ppm (init 340)")


if __name__ == "__main__":
    main()
