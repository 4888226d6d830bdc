"""Moist-air thermodynamics (equation of state, saturation adjustment).

TPU-native re-provision of the external Thermodynamics.jl package — a
de-facto component of the reference (used pervasively, e.g.
``src/Atmos/Model/AtmosModel.jl:49-56``; dependency recorded at
``Manifest.toml:979-980``).

Design: plain functions over batched jnp arrays.  A "thermodynamic state"
is not an object: hot-path code calls the closed-form functions directly
(recompute beats store+reload on TPU where HBM bandwidth is the
bottleneck).  The saturation adjustment is a fixed-iteration Newton solve
(no data-dependent loop bounds) so XLA can fully unroll and fuse it.

``q`` is a :class:`PhasePartition` (q_tot, q_liq, q_ice specific
humidities); pass ``None``/defaults for dry air.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from climatemachine_tpu.physics.parameters import PlanetParameterSet


class PhasePartition(NamedTuple):
    """Specific humidities [kg/kg]: total, liquid, ice."""
    tot: jnp.ndarray
    liq: jnp.ndarray
    ice: jnp.ndarray

    @staticmethod
    def dry(like=None):
        z = 0.0 if like is None else jnp.zeros_like(like)
        return PhasePartition(z, z, z)

    @staticmethod
    def vapor(q_tot):
        z = jnp.zeros_like(q_tot)
        return PhasePartition(q_tot, z, z)

    @property
    def vap(self):
        return self.tot - self.liq - self.ice


# --- moist-air material properties -----------------------------------------

def gas_constant_air(ps: PlanetParameterSet, q: Optional[PhasePartition] = None):
    """R_m: specific gas constant of moist air."""
    if q is None:
        return ps.R_d
    eps = ps.molmass_ratio
    return ps.R_d * (1 + (eps - 1) * q.tot - eps * (q.liq + q.ice))


def cv_m(ps: PlanetParameterSet, q: Optional[PhasePartition] = None):
    if q is None:
        return ps.cv_d
    return (ps.cv_d + (ps.cv_v - ps.cv_d) * q.tot
            + (ps.cv_l - ps.cv_v) * q.liq + (ps.cv_i - ps.cv_v) * q.ice)


def cp_m(ps: PlanetParameterSet, q: Optional[PhasePartition] = None):
    if q is None:
        return ps.cp_d
    return (ps.cp_d + (ps.cp_v - ps.cp_d) * q.tot
            + (ps.cp_l - ps.cp_v) * q.liq + (ps.cp_i - ps.cp_v) * q.ice)


# --- internal energy <-> temperature ---------------------------------------

def internal_energy(ps: PlanetParameterSet, T, q: Optional[PhasePartition] = None):
    """Specific internal energy e_int(T, q)."""
    if q is None:
        return ps.cv_d * (T - ps.T_0)
    return (cv_m(ps, q) * (T - ps.T_0)
            + (q.tot - q.liq) * ps.e_int_v0
            - q.ice * (ps.e_int_v0 + ps.e_int_i0))


def air_temperature(ps: PlanetParameterSet, e_int,
                    q: Optional[PhasePartition] = None):
    """T(e_int, q) — inverse of :func:`internal_energy`."""
    if q is None:
        return ps.T_0 + e_int / ps.cv_d
    return ps.T_0 + (e_int - (q.tot - q.liq) * ps.e_int_v0
                     + q.ice * (ps.e_int_v0 + ps.e_int_i0)) / cv_m(ps, q)


def internal_energy_from_state(rho, rhoe, rhou, Phi):
    """e_int from conserved state: (ρe - |ρu|²/2ρ - ρΦ)/ρ."""
    ke = 0.5 * jnp.sum(rhou * rhou, axis=-1) / (rho * rho)
    return rhoe / rho - ke - Phi


def total_energy(ps: PlanetParameterSet, e_kin, e_pot, T,
                 q: Optional[PhasePartition] = None):
    """Specific total energy e_tot = e_kin + e_pot + e_int(T, q)."""
    return e_kin + e_pot + internal_energy(ps, T, q)


# --- equation of state ------------------------------------------------------

def air_pressure(ps: PlanetParameterSet, T, rho,
                 q: Optional[PhasePartition] = None):
    return rho * gas_constant_air(ps, q) * T


def air_density(ps: PlanetParameterSet, T, p,
                q: Optional[PhasePartition] = None):
    return p / (gas_constant_air(ps, q) * T)


def soundspeed_air(ps: PlanetParameterSet, T,
                   q: Optional[PhasePartition] = None):
    gamma = cp_m(ps, q) / cv_m(ps, q)
    return jnp.sqrt(gamma * gas_constant_air(ps, q) * T)


def exner(ps: PlanetParameterSet, p, q: Optional[PhasePartition] = None):
    if q is None:
        return (p / ps.MSLP) ** ps.kappa_d
    return (p / ps.MSLP) ** (gas_constant_air(ps, q) / cp_m(ps, q))


def dry_pottemp(ps: PlanetParameterSet, T, p,
                q: Optional[PhasePartition] = None):
    return T / exner(ps, p, q)


def virtual_temperature(ps: PlanetParameterSet, T,
                        q: Optional[PhasePartition] = None):
    return gas_constant_air(ps, q) / ps.R_d * T


def liquid_ice_pottemp(ps: PlanetParameterSet, T, p,
                       q: Optional[PhasePartition] = None):
    """Liquid-ice potential temperature θ_li = θ(1 − (L_v q_l + L_s q_i)
    /(c_pm T)) (reference Thermodynamics.jl liquid_ice_pottemp, used by
    the SGS-TKE model, sgstke.jl:107)."""
    theta = dry_pottemp(ps, T, p, q)
    if q is None:
        return theta
    return theta * (1.0 - (ps.LH_v0 * q.liq + ps.LH_s0 * q.ice)
                    / (cp_m(ps, q) * T))


# --- saturation -------------------------------------------------------------

def liquid_fraction(ps: PlanetParameterSet, T):
    """Equilibrium liquid fraction λ(T) (Heaviside at freezing, matching the
    Thermodynamics.jl default)."""
    return jnp.where(T > ps.T_freeze, 1.0, 0.0)


def saturation_vapor_pressure(ps: PlanetParameterSet, T, LH_0, dcp):
    """Clausius-Clapeyron with linear-in-T latent heat."""
    Tt, Rv, T0 = ps.T_triple, ps.R_v, ps.T_0
    return (ps.press_triple * (T / Tt) ** (dcp / Rv)
            * jnp.exp((LH_0 - dcp * T0) / Rv * (1 / Tt - 1 / T)))


def saturation_vapor_pressure_liquid(ps: PlanetParameterSet, T):
    return saturation_vapor_pressure(ps, T, ps.LH_v0, ps.cp_v - ps.cp_l)


def saturation_vapor_pressure_ice(ps: PlanetParameterSet, T):
    return saturation_vapor_pressure(ps, T, ps.LH_s0, ps.cp_v - ps.cp_i)


def q_vap_saturation(ps: PlanetParameterSet, T, rho, lam=None):
    """Saturation specific humidity over a λ-weighted liquid/ice mixture."""
    if lam is None:
        lam = liquid_fraction(ps, T)
    pvs = (lam * saturation_vapor_pressure_liquid(ps, T)
           + (1 - lam) * saturation_vapor_pressure_ice(ps, T))
    return pvs / (rho * ps.R_v * T)


def latent_heat_vapor(ps: PlanetParameterSet, T):
    return ps.LH_v0 + (ps.cp_v - ps.cp_l) * (T - ps.T_0)


def latent_heat_sublim(ps: PlanetParameterSet, T):
    return ps.LH_s0 + (ps.cp_v - ps.cp_i) * (T - ps.T_0)


def latent_heat_fusion(ps: PlanetParameterSet, T):
    return ps.LH_f0 + (ps.cp_l - ps.cp_i) * (T - ps.T_0)


def phase_partition_equil(ps: PlanetParameterSet, T, rho, q_tot):
    """Equilibrium phase partition at temperature T."""
    lam = liquid_fraction(ps, T)
    q_sat = q_vap_saturation(ps, T, rho, lam)
    excess = jnp.maximum(q_tot - q_sat, 0.0)
    return PhasePartition(q_tot, lam * excess, (1 - lam) * excess)


def saturation_adjustment(ps: PlanetParameterSet, e_int, rho, q_tot,
                          n_iter: int = 6, n_bisect: int = 30):
    """Equilibrium temperature T s.t. e_int == internal_energy(T, q_eq(T)).

    Bracketed bisection on [T_min, T_max] followed by Newton polish —
    e_int_eq(T) is monotone in T but only piecewise-smooth (the Heaviside
    liquid fraction at freezing), so plain Newton can stall on a false
    root; the reference uses a bounded secant for the same reason
    (Thermodynamics.jl `PhaseEquil` with SecantMethod).  All loops have
    static trip counts (jit-friendly, fully fused).

    Unsaturated points short-circuit to the analytic all-vapor
    temperature.
    """
    T_vap = air_temperature(ps, e_int, PhasePartition.vapor(q_tot))
    T_vap = jnp.clip(T_vap, ps.T_min, ps.T_max)
    unsaturated = q_tot <= q_vap_saturation(ps, T_vap, rho)

    def resid(T):
        q = phase_partition_equil(ps, T, rho, q_tot)
        return internal_energy(ps, T, q) - e_int

    lo = jnp.full_like(T_vap, ps.T_min)
    hi = jnp.full_like(T_vap, ps.T_max)
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        f = resid(mid)
        lo = jnp.where(f < 0, mid, lo)
        hi = jnp.where(f < 0, hi, mid)
    T = 0.5 * (lo + hi)

    dT = 1e-3
    for _ in range(n_iter):
        f = resid(T)
        df = (resid(T + dT) - f) / dT
        Tn = T - f / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        # keep the Newton step inside the bisection bracket
        T = jnp.clip(Tn, lo, hi)
    return jnp.where(unsaturated, T_vap, T)


def virtual_pottemp(ps: PlanetParameterSet, T, p,
                    q: Optional[PhasePartition] = None):
    """θ_v = (R_m/R_d) θ (reference Thermodynamics.jl virtual_pottemp)."""
    return gas_constant_air(ps, q) / ps.R_d * dry_pottemp(ps, T, p, q)


def relative_humidity(ps: PlanetParameterSet, T, p,
                      q: Optional[PhasePartition] = None):
    """RH = p_vap / p_vap_sat (reference Thermodynamics.jl
    relative_humidity); dry air returns 0."""
    if q is None:
        return jnp.zeros_like(T)
    q_vap = q.tot - q.liq - q.ice
    eps_vi = ps.R_v / ps.R_d
    p_vap = q_vap * p / (q_vap + (1.0 / eps_vi) * (1 - q.tot))
    lam = liquid_fraction(ps, T)
    pvs = (lam * saturation_vapor_pressure_liquid(ps, T)
           + (1 - lam) * saturation_vapor_pressure_ice(ps, T))
    return jnp.clip(p_vap / pvs, 0.0, 1.0)


def total_specific_enthalpy(ps: PlanetParameterSet, e_tot, T,
                            q: Optional[PhasePartition] = None):
    """h_tot = e_tot + R_m T (reference total_specific_enthalpy)."""
    return e_tot + gas_constant_air(ps, q) * T


def temperature_from_theta_liq(ps: PlanetParameterSet, p, theta_liq,
                               q_tot=None, n_iter: int = 5):
    """T from (p, θ_liq-ice[, q_tot]) — the PhaseDry_pθ / PhaseEquil_pθq
    constructors of Thermodynamics.jl (used by the EDMF subdomain thermo
    states).  Dry: closed form T = θ Π.  Moist: fixed-point on T with the
    equilibrium phase partition at ρ = p/(R_m T)."""
    if q_tot is None:
        return theta_liq * exner(ps, p)

    def theta_liq_of(T):
        pp = PhasePartition.vapor(q_tot)
        rho = p / (gas_constant_air(ps, pp) * T)
        pp = phase_partition_equil(ps, T, rho, q_tot)
        return liquid_ice_pottemp(ps, T, p, pp)

    # θ_liq(T) is monotone increasing at fixed (p, q_tot): bisect
    # (a plain fixed point 2-cycles across the saturation boundary).
    # lax.fori_loop keeps the traced graph small — this runs inside the
    # per-node EDMF subdomain recovery, so an unrolled loop would blow
    # up compile time.
    import jax
    theta_liq = jnp.asarray(theta_liq)
    lo0 = jnp.broadcast_to(jnp.asarray(ps.T_min, theta_liq.dtype),
                           theta_liq.shape)
    hi0 = jnp.broadcast_to(jnp.asarray(ps.T_max, theta_liq.dtype),
                           theta_liq.shape)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = theta_liq_of(mid) < theta_liq
        return (jnp.where(below, mid, lo), jnp.where(below, hi, mid))

    lo, hi = jax.lax.fori_loop(0, 30, body, (lo0, hi0))
    return 0.5 * (lo + hi)
