"""(Moist) baroclinic wave on the cubed sphere — DCMIP2016 test case.

Scope of reference ``experiments/AtmosGCM/GCMDriver/``:
baroclinicwave_problem.jl + gcm_base_states.jl (BCWaveBaseState :58,
Ullrich et al. 2016 deep-atmosphere analytic base state),
gcm_perturbations.jl (DeterministicPerturbation — the same localized
velocity dipole as Held-Suarez init), gcm_moisture_profiles.jl
(MoistLowTropicsMoistureProfile :56).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Coriolis,
                                      Gravity, HydrostaticState)
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.moisture import DryModel, EquilMoist
from climatemachine_tpu.common.orientations import (SphericalOrientation,
                                                    latitude, longitude,
                                                    sphr_to_cart_vec)
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_cubed_sphere_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH, PlanetParameterSet
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile)


def bcwave_base_state(ps: PlanetParameterSet, phi, z):
    """(T_v, p, u_zonal) deep-atmosphere base state (reference
    gcm_base_states.jl:58-124)."""
    g, R_d, Om, a, p0 = ps.grav, ps.R_d, ps.Omega, ps.planet_radius, ps.MSLP
    k = 3.0
    T_E, T_P = 310.0, 240.0
    T_0 = 0.5 * (T_E + T_P)
    Gam = 0.005
    A = 1 / Gam
    B = (T_0 - T_P) / (T_0 * T_P)
    C = 0.5 * (k + 2) * (T_E - T_P) / (T_E * T_P)
    b = 2.0
    H = R_d * T_0 / g
    gam = 1.0  # deep atmosphere

    tz1 = jnp.exp(Gam * z / T_0)
    tz2 = 1 - 2 * (z / (b * H)) ** 2
    tz3 = jnp.exp(-((z / (b * H)) ** 2))
    tau1 = tz1 / T_0 + B * tz2 * tz3
    tau2 = C * tz2 * tz3
    ti1 = A * (tz1 - 1) + B * z * tz3
    ti2 = C * z * tz3
    cr = jnp.cos(phi) * (1 + gam * z / a)
    I_T = cr ** k - k / (k + 2) * cr ** (k + 2)

    T_v = 1.0 / (tau1 - tau2 * I_T)
    p = p0 * jnp.exp(-g / R_d * (ti1 - ti2 * I_T))

    U = (g * k / a * ti2 * T_v * (cr ** (k - 1) - cr ** (k + 1)))
    rc = (a + gam * z) * jnp.cos(phi)
    u_ref = -Om * rc + jnp.sqrt((Om * rc) ** 2 + jnp.maximum(rc * U, -((Om * rc) ** 2)))
    return T_v, p, u_ref


def bcwave_perturbation(ps, phi, lam, z, V_p=1.0):
    """Localized velocity dipole (reference gcm_perturbations.jl:42,
    identical in form to the HS init perturbation)."""
    a = ps.planet_radius
    z_t = 15e3
    lam_c, phi_c = np.pi / 9, 2 * np.pi / 9
    d_0 = a / 6
    zr = jnp.clip(z / z_t, 0.0, 1.0)
    F_z = jnp.where(z > z_t, 0.0, 1 - 3 * zr ** 2 + 2 * zr ** 3)
    cosarg = jnp.clip(jnp.sin(phi) * np.sin(phi_c)
                      + jnp.cos(phi) * np.cos(phi_c) * jnp.cos(lam - lam_c),
                      -1.0, 1.0)
    d = a * jnp.arccos(cosarg)
    c3 = jnp.cos(np.pi * d / 2 / d_0) ** 3
    s1 = jnp.sin(np.pi * d / 2 / d_0)
    sda = jnp.sin(d / a)
    safe = jnp.where(jnp.abs(sda) < 1e-12, 1.0, sda)
    coeff = 16 * V_p / (3 * np.sqrt(3.0)) * F_z * c3 * s1 / safe
    u_p = -coeff * (-np.sin(phi_c) * jnp.cos(phi)
                    + np.cos(phi_c) * jnp.sin(phi) * jnp.cos(lam - lam_c))
    v_p = coeff * np.cos(phi_c) * jnp.sin(lam - lam_c)
    active = (d > 0) & (d < d_0) & (jnp.abs(sda) > 1e-12)
    return jnp.where(active, u_p, 0.0), jnp.where(active, v_p, 0.0)


def moist_low_tropics_q(ps, phi, p):
    """(reference gcm_moisture_profiles.jl:56-88)"""
    p_w = 34e3
    eta_crit = p_w / ps.MSLP
    q_0, q_t = 0.018, 1e-12
    phi_w = 2 * np.pi / 9
    eta = p / ps.MSLP
    q = q_0 * jnp.exp(-((phi / phi_w) ** 4)) \
        * jnp.exp(-(((eta - 1) * ps.MSLP / p_w) ** 2))
    return jnp.where(eta > eta_crit, q, q_t)


def baroclinic_wave_init(model, coords, aux, t):
    ps = model.param_set
    phi, lam = latitude(coords), longitude(coords)
    z = model.aux_get(aux, "orientation.Phi") / ps.grav

    T_v, p, u_ref = bcwave_base_state(ps, phi, z)
    u_p, v_p = bcwave_perturbation(ps, phi, lam, z)
    u_sphere = jnp.stack([u_ref + u_p, v_p, jnp.zeros_like(u_p)], axis=-1)
    u_cart = sphr_to_cart_vec(coords, u_sphere)

    moist = model.physics.moisture
    if isinstance(moist, EquilMoist):
        q_tot = moist_low_tropics_q(ps, phi, p)
    else:
        q_tot = jnp.zeros_like(p)
    eps = ps.molmass_ratio
    T = T_v / (1 + (eps - 1) * q_tot)
    pp = td.PhasePartition.vapor(q_tot)
    rho = p / (td.gas_constant_air(ps, pp) * T)
    ke = 0.5 * jnp.sum(u_cart * u_cart, axis=-1)
    Phi = model.aux_get(aux, "orientation.Phi")
    e_int = td.internal_energy(ps, T, pp)
    fields = {"rho": rho, "rhoe": rho * (e_int + ke + Phi)}
    if isinstance(moist, EquilMoist):
        fields["moisture.rhoq_tot"] = rho * q_tot
    q = model.prog_spec.pack(fields, batch_shape=rho.shape)
    return model.prog_spec.set(q, "rhou", rho[..., None] * u_cart)


@dataclass
class BaroclinicWaveConfig:
    model: AtmosModel
    grid: object


def baroclinic_wave_config(n_horz=8, n_vert=4, poly_order=4,
                           domain_height=30e3, moist=True, tracers=None,
                           dtype=None, param_set=EARTH,
                           hyperdiffusion_tau=8 * 3600.0):
    """(reference baroclinicwave_problem.jl + GCMDriver defaults)"""
    from climatemachine_tpu.atmos.hyperdiffusion import (
        DryBiharmonic, EquilMoistBiharmonic)
    a = param_set.planet_radius
    vert_range = a + np.linspace(0.0, domain_height, n_vert + 1)
    topo = stacked_cubed_sphere_topology(n_horz, vert_range)
    grid = make_grid(topo, poly_order, dtype=dtype)

    hyper = None
    if hyperdiffusion_tau:
        hyper = (EquilMoistBiharmonic(hyperdiffusion_tau) if moist
                 else DryBiharmonic(hyperdiffusion_tau))
    physics = AtmosPhysics(
        param_set=param_set,
        orientation=SphericalOrientation(),
        ref_state=HydrostaticState(
            DecayingTemperatureProfile(290.0, 220.0, 8e3)),
        moisture=EquilMoist() if moist else DryModel(),
        tracers=tracers,
        hyperdiffusion=hyper)
    problem = AtmosProblem(init_state=baroclinic_wave_init,
                           boundary_conditions=(AtmosBC(), AtmosBC()))
    model = AtmosModel(physics, problem, sources=(Gravity(), Coriolis()))
    return BaroclinicWaveConfig(model=model, grid=grid)
