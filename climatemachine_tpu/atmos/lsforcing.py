"""Large-scale (GCM-driven) forcing for LES configurations.

Scope of reference ``src/Atmos/Model/lsforcing.jl`` (NoLSForcing :32,
HadGEMVertical :38 — aux container for CMIP-named GCM profiles + vertical
gradients of ta/hus) and the forcing sources defined by the AMIP cfsite
experiment (``experiments/AtmosLES/cfsite_hadgem2-a_07_amip.jl``:
LargeScaleProcess :89, LargeScaleSubsidence :144, LinearSponge :183).

TPU-first: the reference reads NetCDF GCM output into 1-D splines on the
host and fills aux in the init kernel; here the profile is a user
callable ``profile(z) -> dict`` evaluated once at aux init (traced,
shape-[nodes] arrays), so any data source (interpolated arrays, closed
forms) plugs in without an I/O dependency in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from climatemachine_tpu.atmos.sources import Source
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.utils.variables import VarSpec


class NoLSForcing:
    """No large-scale forcing (reference lsforcing.jl:32)."""

    def vars_aux(self) -> VarSpec:
        return VarSpec()

    def vars_gradient(self) -> VarSpec:
        return VarSpec()

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec()

    def init_aux(self, model, z, aux):
        return aux

    def gradient_argument(self, model, q, aux, t, out):
        return out

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        return out


@dataclass(frozen=True)
class HadGEMVertical(NoLSForcing):
    """Container for HadGEM2-A GCM forcing profiles (reference
    lsforcing.jl:38-75): aux holds CMIP-named fields; the vertical
    gradients of ta (air temperature) and hus (specific humidity) are
    computed through the DG gradient chain.

    ``profile(z)`` must return a dict with keys ta, hus, ua, va,
    temp_tendency (Σ of tntha+tntva+tntr), qt_tendency (Σ of
    tnhusha+tnhusva) and w_s (subsidence velocity, m/s, positive up —
    the reference converts from wap [Pa/s] via -wap/(ρ g)).
    """
    profile: Callable

    def vars_aux(self) -> VarSpec:
        return VarSpec(ta=1, hus=1, ua=1, va=1, temp_tendency=1,
                       qt_tendency=1, w_s=1)

    def vars_gradient(self) -> VarSpec:
        return VarSpec(ta=1, hus=1)

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec(dz_ta=1, dz_hus=1)

    def init_aux(self, model, z, aux):
        fields = self.profile(z)
        s = model.aux_spec
        for name in ("ta", "hus", "ua", "va", "temp_tendency",
                     "qt_tendency", "w_s"):
            aux = s.set(aux, f"lsforcing.{name}", fields[name])
        return aux

    def gradient_argument(self, model, q, aux, t, out):
        s = model.grad_spec
        out = s.set(out, "lsforcing.ta",
                    model.aux_get(aux, "lsforcing.ta"))
        return s.set(out, "lsforcing.hus",
                     model.aux_get(aux, "lsforcing.hus"))

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        # vertical components only (reference lsforcing.jl:65-74)
        k = model._vertical_unit(aux)
        ta_sl = model.grad_spec.index("lsforcing.ta").start
        hus_sl = model.grad_spec.index("lsforcing.hus").start
        s = model.gf_spec
        out = s.set(out, "lsforcing.dz_ta",
                    jnp.sum(grad_g[..., :, ta_sl] * k, axis=-1))
        return s.set(out, "lsforcing.dz_hus",
                     jnp.sum(grad_g[..., :, hus_sl] * k, axis=-1))


def _q_tot_tendency(model, gf, aux):
    """Σqt_tendency + w_s ∂hus/∂z (reference cfsite compute_q_tot_tend)."""
    dz_hus = model.gf_spec.get(gf, "lsforcing.dz_hus")
    w_s = model.aux_get(aux, "lsforcing.w_s")
    return model.aux_get(aux, "lsforcing.qt_tendency") + dz_hus * w_s


class LargeScaleProcess(Source):
    """GCM-derived temperature/moisture tendencies (reference cfsite
    LargeScaleProcess :89-137): energy gets ρ c_vm (Σtemp + w_s ∂T/∂z)
    + ρ e_int_v0 (dq_tot/dt); mass and q_tot get ρ (dq_tot/dt)."""

    def contributions(self, model, q, gf, aux, t):
        if gf is None:
            return {}
        ps = model.param_set
        rho = model.prog(q, "rho")
        T, p, u, pp = model.thermo_full(q, aux)
        cvm = td.cv_m(ps, pp)
        dz_ta = model.gf_spec.get(gf, "lsforcing.dz_ta")
        w_s = model.aux_get(aux, "lsforcing.w_s")
        T_tendency = model.aux_get(aux, "lsforcing.temp_tendency") \
            + dz_ta * w_s
        out = {"rhoe": cvm * rho * T_tendency}
        try:
            qt_tend = _q_tot_tendency(model, gf, aux)
            out["rhoe"] = out["rhoe"] + ps.e_int_v0 * rho * qt_tend
            out["rho"] = rho * qt_tend
            out["moisture.rhoq_tot"] = rho * qt_tend
        except KeyError:
            pass
        return out


class LargeScaleSubsidence(Source):
    """Subsidence with GCM vertical velocity w_s from aux (reference
    cfsite LargeScaleSubsidence :144-176): −ρ w_s k̂·∇h_tot (energy),
    −ρ w_s k̂·∇q_tot (mass, moisture)."""

    def contributions(self, model, q, gf, aux, t):
        if gf is None:
            return {}
        rho = model.prog(q, "rho")
        k = model._vertical_unit(aux)
        w_s = model.aux_get(aux, "lsforcing.w_s")
        d_h = model.gf_spec.get(gf, "d_h_tot")
        out = {"rhoe": -rho * w_s * jnp.sum(d_h * k, axis=-1)}
        try:
            d_q = model.gf_spec.get(gf, "moisture.d_q_tot")
            dq = -rho * w_s * jnp.sum(d_q * k, axis=-1)
            out["rho"] = dq
            out["moisture.rhoq_tot"] = dq
        except KeyError:
            pass
        return out


@dataclass(frozen=True)
class LinearSponge(Source):
    """Momentum relaxation toward the GCM wind (ua, va) above z_sponge
    (reference cfsite LinearSponge :183-220):
    −α_max sin(π/2 r)^γ (ρu − ρ u_geo)."""
    z_max: float
    z_sponge: float
    alpha_max: float
    gamma: float = 2.0

    def contributions(self, model, q, gf, aux, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        z = model.aux_get(aux, "orientation.Phi") / ps.grav
        u_geo = jnp.stack(
            [model.aux_get(aux, "lsforcing.ua"),
             model.aux_get(aux, "lsforcing.va"),
             jnp.zeros_like(rho)], axis=-1)
        r = jnp.clip((z - self.z_sponge) / (self.z_max - self.z_sponge),
                     0.0, 1.0)
        beta = self.alpha_max * jnp.sin(jnp.pi / 2 * r) ** self.gamma
        return {"rhou": -beta[..., None]
                * (rhou - rho[..., None] * u_geo)}
