"""EDMF (eddy-diffusivity mass-flux) turbulence-convection scheme.

Scope of the reference EDMF plugin living in ``test/Atmos/EDMF/``:
``edmf_model.jl`` (EntrainmentDetrainment/Pressure/MixingLength/Surface/
Subdomain models, EDMF struct, Coupled/Decoupled), ``edmf_kernels.jl``
(state vars, advective fluxes, entr/detr + pressure + buoyancy + shear +
dissipation + gradient-production sources, SGSFlux grid-mean coupling,
EDMFBottomBC/EDMFTopBC), ``closures/`` (entr_detr.jl Cohen et al. 2020,
mixing_length.jl + turbulence_functions.jl Lopez-Gomez et al. 2020,
pressure.jl He et al. 2020, surface_functions.jl) and ``helper_funcs/``
(diagnose_environment.jl, subdomain_thermo_states.jl,
lamb_smooth_minimum.jl).

TPU-first redesign:
- the updraft index is a trailing static axis of width N_up, so every
  closure evaluates for all updrafts in one vectorized expression (the
  reference unrolls per-updraft scalar kernels);
- the void-updraft guards (`fix_void_up`) become `where` masks;
- `percentile_bounds_mean_norm` is evaluated analytically from the
  truncated-normal mean instead of Monte-Carlo sampling;
- the per-tendency `precompute` is one function whose results are shared
  between the flux/source hooks by XLA CSE within the traced RHS.

Divergences (documented):
- second-order wall fluxes for turbconv variables are zero at both
  boundaries (the reference copies the interior flux at the bottom for
  environment second moments; surface forcing enters through the
  strongly-imposed first-order boundary state either way);
- positivity of `rhoa`/`rhoatke`/covariances is enforced with the
  existing TMAR filter between steps (reference: turbconv_filters).

Default free parameters follow the published values of Cohen et al.
(JAMES 2020), Lopez-Gomez et al. (JAMES 2020) and He et al. (JAMES 2020)
as collected in CLIMAParameters.jl.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import SimpleNamespace
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.utils.variables import VarSpec

_TOL = 1e-8


def lamb_smooth_minimum(l, frac_upper_bound, reg_min):
    """Smooth minimum over the last axis (reference
    lamb_smooth_minimum.jl, Lopez-Gomez et al. 2020 Appendix A)."""
    n = l.shape[-1]
    # lambertw((n-1)/e) for n = 2, 3 (reference lambertw_gpu)
    lw = {2: 0.2784645427610738, 3: 0.46305551336554884}[n]
    xmin = jnp.min(l, axis=-1, keepdims=True)
    lam = jnp.maximum(xmin * frac_upper_bound / lw, reg_min)
    w = jnp.exp(-(l - xmin) / lam)
    return jnp.sum(l * w, axis=-1) / jnp.sum(w, axis=-1)


def percentile_bounds_mean_norm(low, high):
    """Mean of a standard normal conditioned to (Φ⁻¹(low), Φ⁻¹(high)) —
    the analytic value of the reference's sampled estimate
    (surface_functions.jl percentile_bounds_mean_norm)."""
    from scipy.special import ndtri
    a, b = ndtri(low), ndtri(high)
    phi = lambda x: np.exp(-0.5 * x * x) / np.sqrt(2 * np.pi)
    return float((phi(a) - phi(b)) / (high - low))


# --- sub-models (reference edmf_model.jl) -----------------------------------

@dataclass(frozen=True)
class EntrainmentDetrainment:
    """(reference edmf_model.jl:16; defaults: Cohen et al. 2020)."""
    c_lambda: float = 0.3      # entrainment TKE scale
    c_eps: float = 0.13        # entrainment factor
    c_del: float = 0.52        # detrainment factor
    c_t: float = 0.1           # turbulent entrainment factor
    beta: float = 2.0          # detrainment RH power
    mu_0: float = 4e-4         # logistic scale [1/s]
    chi: float = 0.25          # updraft mixing fraction
    w_min: float = 0.1         # minimum updraft velocity
    lim_eps: float = 1e-4      # area limiter scale (unused: TMAR filter)
    lim_amp: float = 10.0


@dataclass(frozen=True)
class PressureModel:
    """(reference edmf_model.jl:209; defaults: He et al. 2020)."""
    alpha_d: float = 10.0      # drag
    alpha_a: float = 0.1       # advection
    alpha_b: float = 0.12      # buoyancy
    H_up_min: float = 500.0    # min diagnostic updraft height


@dataclass(frozen=True)
class MixingLengthModel:
    """(reference edmf_model.jl:240; defaults: Lopez-Gomez et al. 2020)."""
    c_d: float = 0.22          # dissipation
    c_m: float = 0.14          # eddy viscosity
    c_b: float = 0.63          # static stability
    a1: float = 0.2            # stability function exponent
    a2: float = 100.0          # stability function coefficient
    kappa: float = 0.4         # von Karman
    omega_pr: float = 53.0 / 13.0
    Pr_n: float = 0.74
    Ri_c: float = 0.25
    smin_ub: float = 0.1
    smin_rm: float = 1.5
    max_length: float = 1e6
    random_minval: float = 1e-9


@dataclass(frozen=True)
class SurfaceModel:
    """(reference edmf_model.jl:98; BOMEX defaults)."""
    a: float = 0.1             # total updraft surface area
    psi_phi_stab: float = 8.3
    kappa_star2: float = 3.75
    theta_liq: float = 299.1
    q_tot: float = 22.45e-3
    shf: float = 9.5           # sensible heat flux [W/m2]
    lhf: float = 147.2         # latent heat flux [W/m2]
    ustar: float = 0.28
    obukhov_length: float = 0.0
    zLL: float = 60.0          # height of the lowest nodal level


@dataclass(frozen=True)
class NeutralDrySurfaceModel:
    """(reference edmf_model.jl:176): dry neutral surface — zero scalar
    fluxes, TKE set by ustar only."""
    a: float = 0.1
    kappa_star2: float = 3.75
    ustar: float = 0.3
    zLL: float = 60.0
    obukhov_length: float = 0.0
    psi_phi_stab: float = 8.3
    shf: float = 0.0
    lhf: float = 0.0


@dataclass(frozen=True)
class SubdomainModel:
    """(reference edmf_model.jl:81)."""
    a_min: float = 0.0
    a_max: float = 1.0


class Decoupled:
    """EDMF SGS fluxes do not feed back on the grid mean."""


class Coupled:
    """EDMF SGS fluxes modify grid-mean momentum/energy/moisture."""


class EDMF:
    """EDMF turbulence-convection model (reference edmf_model.jl:379).

    ``N_up`` updrafts (prognostic area, vertical momentum, liquid-ice
    potential temperature, total water) + an environment (prognostic TKE
    and second moments), vertically advective with entrainment/
    detrainment exchange, eddy-diffusivity closure from a multi-scale
    mixing length, and optional coupling of the resulting SGS fluxes to
    the grid-mean equations.
    """

    def __init__(self, N_up: int = 1,
                 entr_detr: EntrainmentDetrainment = None,
                 pressure: PressureModel = None,
                 surface=None,
                 mix_len: MixingLengthModel = None,
                 subdomains: SubdomainModel = None,
                 coupling=None):
        self.N_up = N_up
        self.entr_detr = entr_detr or EntrainmentDetrainment()
        self.pressure = pressure or PressureModel()
        self.surface = surface or SurfaceModel()
        self.mix_len = mix_len or MixingLengthModel()
        self.subdomains = subdomains or SubdomainModel()
        self.coupling = coupling or Decoupled()
        a = self.surface.a
        if a > 0:
            self.upd_surface_std = np.array(
                [percentile_bounds_mean_norm(1 - a + i * a / N_up,
                                             1 - a + (i + 1) * a / N_up)
                 for i in range(N_up)])
        else:
            self.upd_surface_std = np.zeros(N_up)

    # --- schemas (gated on the host model's moisture) -----------------------
    def _moist(self, model) -> bool:
        from climatemachine_tpu.atmos.moisture import EquilMoist
        return isinstance(model.physics.moisture, EquilMoist)

    def vars_prognostic(self, moist: bool) -> VarSpec:
        N = (self.N_up,)          # tuple: keep the axis even for N_up=1
        f = dict(up_rhoa=N, up_rhoaw=N, up_rhoatheta_liq=N,
                 en_rhoatke=1, en_rhoatheta_liq_cv=1)
        if moist:
            f["up_rhoaq_tot"] = N
            f["en_rhoaq_tot_cv"] = 1
            f["en_rhoatheta_liq_q_tot_cv"] = 1
        return VarSpec(**f)

    def vars_aux(self) -> VarSpec:
        return VarSpec(up_T=(self.N_up,), en_T=1)

    def vars_gradient(self, moist: bool) -> VarSpec:
        f = dict(up_w=(self.N_up,), en_theta_liq=1, en_w=1, en_tke=1,
                 en_theta_liq_cv=1, en_thetav=1, en_h_tot=1, u=1, v=1)
        if moist:
            f["en_q_tot"] = 1
            f["en_q_tot_cv"] = 1
            f["en_theta_liq_q_tot_cv"] = 1
        return VarSpec(**f)

    def vars_gradient_flux(self, moist: bool) -> VarSpec:
        # vertical components only — every consumer uses [3] (reference
        # edmf_kernels.jl gradient-flux reads are all ∇x[3])
        f = dict(up_dwdz=(self.N_up,), en_dthetadz=1, en_dwdz=1,
                 en_dtkedz=1,
                 en_dtheta_cvdz=1, en_dthetavdz=1, en_dhtotdz=1,
                 dudz=1, dvdz=1)
        if moist:
            f["en_dqtdz"] = 1
            f["en_dqt_cvdz"] = 1
            f["en_dthqt_cvdz"] = 1
        return VarSpec(**f)

    # --- small helpers ------------------------------------------------------
    @staticmethod
    def _safe_div(num, den, alt=0.0):
        ok = jnp.abs(den) > _TOL
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), alt)

    @staticmethod
    def _filter_w(w, w_min):
        """|result| >= w_min, sign preserved (reference filter_w)."""
        return jnp.where(w < 0, -1.0, 1.0) * jnp.maximum(jnp.abs(w), w_min)

    def _tc(self, model, q, name):
        return model.prog_spec.get(q, f"turbconv.{name}")

    def _environment(self, model, q):
        """a_en, w_en (reference diagnose_environment.jl)."""
        rho = model.prog(q, "rho")
        rhoa = self._tc(model, q, "up_rhoa")
        rhoaw = self._tc(model, q, "up_rhoaw")
        a_en = 1.0 - jnp.sum(rhoa, axis=-1) / rho
        a_en = jnp.maximum(a_en, _TOL)
        w_gm = model.prog(q, "rhou")[..., 2]
        w_en = (w_gm - jnp.sum(rhoaw, axis=-1)) / (a_en * rho)
        return a_en, w_en

    def _rhoa_up(self, model, q):
        """Area-clipped updraft density-area (reference compute_ρa_up)."""
        rho = model.prog(q, "rho")[..., None]
        a = jnp.clip(self._tc(model, q, "up_rhoa") / rho,
                     self.subdomains.a_min, self.subdomains.a_max)
        return rho * a

    def _subdomain_thermo(self, model, q, aux):
        """Thermo of updrafts and environment at grid-mean pressure
        (reference subdomain_thermo_states.jl)."""
        ps = model.param_set
        moist = self._moist(model)
        T_gm, p_gm, u_gm, pp_gm = model.thermo_full(q, aux)
        rho = model.prog(q, "rho")
        theta_liq_gm = td.liquid_ice_pottemp(ps, T_gm, p_gm, pp_gm)
        q_tot_gm = pp_gm.tot if pp_gm is not None else None
        a_en, w_en = self._environment(model, q)

        rhoa = self._tc(model, q, "up_rhoa")
        void = rhoa <= _TOL
        theta_liq_up = jnp.where(
            void, theta_liq_gm[..., None],
            self._safe_div(self._tc(model, q, "up_rhoatheta_liq"), rhoa))
        theta_liq_en = (theta_liq_gm - jnp.sum(
            jnp.where(void, 0.0, self._tc(model, q, "up_rhoatheta_liq")),
            axis=-1) / rho) / a_en
        if moist:
            q_tot_up = jnp.where(
                void, q_tot_gm[..., None],
                self._safe_div(self._tc(model, q, "up_rhoaq_tot"), rhoa))
            q_tot_en = (q_tot_gm - jnp.sum(
                jnp.where(void, 0.0, self._tc(model, q, "up_rhoaq_tot")),
                axis=-1) / rho) / a_en
            q_tot_en = jnp.clip(q_tot_en, 0.0, 1.0)
            T_up = td.temperature_from_theta_liq(ps, p_gm[..., None],
                                                 theta_liq_up, q_tot_up)
            T_en = td.temperature_from_theta_liq(ps, p_gm, theta_liq_en,
                                                 q_tot_en)
            rho_up = p_gm[..., None] / (ps.R_d * T_up)  # refined below
            pp_up = td.phase_partition_equil(
                ps, T_up, rho_up, q_tot_up)
            rho_en0 = p_gm / (ps.R_d * T_en)
            pp_en = td.phase_partition_equil(ps, T_en, rho_en0, q_tot_en)
            rho_up = p_gm[..., None] / (td.gas_constant_air(ps, pp_up)
                                        * T_up)
            rho_en = p_gm / (td.gas_constant_air(ps, pp_en) * T_en)
        else:
            q_tot_up = q_tot_en = pp_up = pp_en = None
            T_up = td.temperature_from_theta_liq(ps, p_gm[..., None],
                                                 theta_liq_up)
            T_en = td.temperature_from_theta_liq(ps, p_gm, theta_liq_en)
            rho_up = p_gm[..., None] / (ps.R_d * T_up)
            rho_en = p_gm / (ps.R_d * T_en)
        return SimpleNamespace(
            T_gm=T_gm, p_gm=p_gm, pp_gm=pp_gm, u_gm=u_gm,
            theta_liq_gm=theta_liq_gm, q_tot_gm=q_tot_gm,
            a_en=a_en, w_en=w_en,
            theta_liq_up=theta_liq_up, q_tot_up=q_tot_up,
            theta_liq_en=theta_liq_en, q_tot_en=q_tot_en,
            T_up=T_up, T_en=T_en, rho_up=rho_up, rho_en=rho_en,
            pp_up=pp_up, pp_en=pp_en)

    def _buoyancy(self, model, q, aux, sub):
        """Subdomain buoyancies with the grid-mean removed (reference
        compute_buoyancy)."""
        ps = model.param_set
        rho = model.prog(q, "rho")
        rho_ref = model.aux_get(aux, "ref_state.rho")
        b_en = -ps.grav * (sub.rho_en - rho_ref) / rho
        b_up = -ps.grav * (sub.rho_up - rho_ref[..., None]) / rho[..., None]
        a_up = self._tc(model, q, "up_rhoa") / rho[..., None]
        b_gm = sub.a_en * b_en + jnp.sum(a_up * b_up, axis=-1)
        return b_up - b_gm[..., None], b_en - b_gm

    # --- closures -----------------------------------------------------------
    def _entr_detr(self, model, q, aux, sub, b_up, b_en):
        """Dynamic entrainment/detrainment + turbulent entrainment
        (reference closures/entr_detr.jl, Cohen et al. 2020)."""
        ps = model.param_set
        ed = self.entr_detr
        rho = model.prog(q, "rho")
        rhoa_raw = self._tc(model, q, "up_rhoa")
        rhoatke = self._tc(model, q, "en_rhoatke")
        a_en, w_en = sub.a_en, sub.w_en
        a_up = rhoa_raw / rho[..., None]
        w_up = self._safe_div(self._tc(model, q, "up_rhoaw"), rhoa_raw)

        tke_en = jnp.maximum(rhoatke, 0.0) / rho / a_en
        sqrt_tke = jnp.sqrt(tke_en)
        dw = self._filter_w(w_up - w_en[..., None], ed.w_min)
        db = b_up - b_en[..., None]

        # nondimensional exchange functions
        if self._moist(model):
            RH_up = td.relative_humidity(ps, sub.T_up, sub.p_gm[..., None],
                                         sub.pp_up)
            RH_en = td.relative_humidity(ps, sub.T_en, sub.p_gm,
                                         sub.pp_en)[..., None]
            cond = (sub.pp_en.liq + sub.pp_en.ice)[..., None] \
                + sub.pp_up.liq + sub.pp_up.ice
            c_del = jnp.sign(cond) * ed.c_del
            b = ed.beta
            M_eps = c_del * jnp.maximum(RH_en ** b - RH_up ** b,
                                        0.0) ** (1.0 / b)
            M_del = c_del * jnp.maximum(RH_up ** b - RH_en ** b,
                                        0.0) ** (1.0 / b)
        else:
            M_eps = M_del = jnp.zeros_like(w_up)

        mu_ij = (ed.chi - a_up / (a_up + a_en[..., None])) * db / dw
        D_eps = ed.c_eps / (1.0 + jnp.exp(-mu_ij / ed.mu_0))
        D_del = ed.c_eps / (1.0 + jnp.exp(mu_ij / ed.mu_0))

        lam_w = jnp.abs(db / dw)
        lam_tke = ed.c_lambda * jnp.abs(
            db / (jnp.maximum(rhoatke / rho, 0.0) + ed.w_min)[..., None])
        lam = lamb_smooth_minimum(
            jnp.stack([lam_w, lam_tke], axis=-1),
            self.mix_len.smin_ub, self.mix_len.smin_rm)

        E_trb = jnp.maximum(
            2.0 * rhoa_raw * ed.c_t * sqrt_tke[..., None]
            / self.pressure.H_up_min, 0.0)
        E_dyn = jnp.maximum(rhoa_raw * lam * (D_eps + M_eps), 0.0)
        D_dyn = jnp.maximum(rhoa_raw * lam * (D_del + M_del), 0.0)
        return E_dyn, D_dyn, E_trb

    def _buoyancy_gradients(self, model, q, gf, aux, sub):
        """Environmental ∂b/∂z and effective N² (reference
        turbulence_functions.jl compute_buoyancy_gradients; SubdomainMean
        statistics: cloud_frac = 1 where env has condensate)."""
        ps = model.param_set
        rho = model.prog(q, "rho")
        gfs = model.gf_spec
        dthdz = gfs.get(gf, "turbconv.en_dthetadz")
        dthvdz = gfs.get(gf, "turbconv.en_dthetavdz")
        pre = ps.grav * ps.R_d * rho / sub.p_gm * td.exner(ps, sub.p_gm,
                                                           sub.pp_en)
        theta_virt = td.virtual_pottemp(ps, sub.T_en, sub.p_gm, sub.pp_en)
        if self._moist(model):
            dqtdz = gfs.get(gf, "turbconv.en_dqtdz")
            eps_v = 1.0 / ps.molmass_ratio
            q_tot = sub.q_tot_en
            lv = td.latent_heat_vapor(ps, sub.T_en)
            cpm = td.cp_m(ps, sub.pp_en)
            q_vap = sub.pp_en.vap
            th_dry = td.dry_pottemp(ps, sub.T_en, sub.p_gm, sub.pp_en)
            cloud = (sub.pp_en.liq + sub.pp_en.ice) > 0
            db_dthl_dry = pre * (1.0 + (eps_v - 1.0) * q_tot)
            db_dqt_dry = pre * sub.theta_liq_en * (eps_v - 1.0)
            num = pre * (1.0 + eps_v * (1.0 + lv / ps.R_v / sub.T_en)
                         * q_vap - q_tot)
            den = 1.0 + lv * lv / cpm / ps.R_v / sub.T_en ** 2 * q_vap
            db_dthl_cl = num / den
            db_dqt_cl = (lv / cpm / sub.T_en * db_dthl_cl - pre) * th_dry
            cf = jnp.where(cloud, 1.0, 0.0)
            db_dthl = cf * db_dthl_cl + (1 - cf) * db_dthl_dry
            db_dqt = cf * db_dqt_cl + (1 - cf) * db_dqt_dry
            dbdz = db_dthl * dthdz + db_dqt * dqtdz
            dthvl_dz = (1.0 + (eps_v - 1.0) * q_tot) * dthdz \
                + (eps_v - 1.0) * sub.theta_liq_en * dqtdz
            dthv_dthvl = jnp.exp(lv * sub.pp_en.liq / cpm / sub.T_en)
            N2_eff = ps.grav / theta_virt * (
                (1 - cf) * dthvdz + cf * dthvl_dz * dthv_dthvl)
        else:
            dbdz = pre * dthdz
            N2_eff = ps.grav / theta_virt * dthvdz
        return dbdz, N2_eff

    def _mixing_length(self, model, q, gf, aux, sub, D_dyn, E_trb, shear2):
        """Multi-scale mixing length (reference closures/mixing_length.jl,
        Lopez-Gomez et al. 2020): smooth minimum of stability, wall and
        tke-balance lengths; also returns ∂b/∂z and Pr_t."""
        ml = self.mix_len
        ps = model.param_set
        rho = model.prog(q, "rho")
        a_en, w_en = sub.a_en, sub.w_en
        rhoatke = self._tc(model, q, "en_rhoatke")
        tke_en = jnp.maximum(rhoatke, 0.0) / rho / a_en
        z = model.aux_get(aux, "orientation.Phi") / ps.grav

        dbdz, N2_eff = self._buoyancy_gradients(model, q, gf, aux, sub)
        grad_Ri = jnp.minimum(
            dbdz / jnp.maximum(shear2, 1.0 / ml.max_length), ml.Ri_c)
        pr_neutral = jnp.asarray(ml.Pr_n, dtype=grad_Ri.dtype)
        disc = jnp.sqrt(jnp.maximum(
            (1 + ml.omega_pr * grad_Ri) ** 2 - 4 * grad_Ri, 0.0))
        # conjugate form of the reference's 2Ri/(1+ωRi−√disc)
        # (turbulence_functions.jl turbulent_Prandtl_number) — identical
        # analytically, but the original cancels catastrophically as
        # Ri→0⁺ (denominator ~ 1e-16 ⇒ Pr_t ~ 0 ⇒ K_h ~ 1e19)
        factor = jnp.where(grad_Ri > 0,
                           (1 + ml.omega_pr * grad_Ri + disc) / 2, 1.0)
        Pr_t = pr_neutral * factor

        # L1: static stability
        stable = N2_eff > _TOL
        L_N = jnp.where(
            stable,
            jnp.minimum(ml.c_b * jnp.sqrt(tke_en)
                        / jnp.sqrt(jnp.where(stable, N2_eff, 1.0)),
                        ml.max_length),
            ml.max_length)

        # L2: law of the wall
        L_W = ml.kappa * jnp.maximum(z, 5.0) \
            / (np.sqrt(self.surface.kappa_star2) * ml.c_m)
        ol = self.surface.obukhov_length
        if ol < -_TOL:
            L_W = L_W * jnp.minimum((1.0 - ml.a2 * z / ol) ** ml.a1,
                                    1.0 / ml.kappa)

        # L3: tke production/dissipation balance
        a = ml.c_m * (shear2 - dbdz / Pr_t) * jnp.sqrt(tke_en)
        rhoa_raw = self._tc(model, q, "up_rhoa")
        w_up = self._safe_div(self._tc(model, q, "up_rhoaw"), rhoa_raw)
        dw = w_up - w_en[..., None]
        b = jnp.sum(
            D_dyn / rho[..., None] / a_en[..., None]
            * (dw * dw / 2 - tke_en[..., None])
            - dw * E_trb / rho[..., None] * w_en[..., None]
            / a_en[..., None], axis=-1)
        c_neg = ml.c_d * tke_en * jnp.sqrt(tke_en)
        disc3 = b * b + 4.0 * a * c_neg
        branch_quad = (jnp.abs(a) > ml.random_minval) & (disc3 > 0)
        l_quad = jnp.maximum(
            self._safe_div(-b / 2 + jnp.sqrt(jnp.maximum(disc3, 0.0)) / 2,
                           a), 0.0)
        l_lin = self._safe_div(c_neg, b)
        L_tke = jnp.where(branch_quad, l_quad,
                          jnp.where(jnp.abs(b) > _TOL, l_lin, 0.0))

        def _valid(L):
            return jnp.where((L < _TOL) | (L > ml.max_length),
                             ml.max_length, L)

        l_mix = lamb_smooth_minimum(
            jnp.stack([_valid(L_N), _valid(L_W), _valid(L_tke)], axis=-1),
            ml.smin_ub, ml.smin_rm)
        return l_mix, dbdz, Pr_t

    def _dpdz(self, model, q, gf, aux, sub, b_up):
        """Perturbation pressure gradient (reference closures/pressure.jl,
        He et al. 2020)."""
        pr = self.pressure
        rhoa_raw = self._tc(model, q, "up_rhoa")
        w_up = self._safe_div(self._tc(model, q, "up_rhoaw"), rhoa_raw)
        dwdz = model.gf_spec.get(gf, "turbconv.up_dwdz")
        dw = w_up - sub.w_en[..., None]
        return (pr.alpha_b * b_up
                - pr.alpha_a * w_up * dwdz
                + pr.alpha_d * dw * jnp.abs(dw) / pr.H_up_min)

    def _precompute(self, model, q, gf, aux):
        """Everything the flux/source hooks share (reference precompute);
        duplicate calls inside one traced RHS are merged by XLA CSE."""
        sub = self._subdomain_thermo(model, q, aux)
        b_up, b_en = self._buoyancy(model, q, aux, sub)
        E_dyn, D_dyn, E_trb = self._entr_detr(model, q, aux, sub, b_up,
                                              b_en)
        gfs = model.gf_spec
        shear2 = (gfs.get(gf, "turbconv.dudz") ** 2
                  + gfs.get(gf, "turbconv.dvdz") ** 2
                  + gfs.get(gf, "turbconv.en_dwdz") ** 2)
        l_mix, dbdz, Pr_t = self._mixing_length(model, q, gf, aux, sub,
                                                D_dyn, E_trb, shear2)
        rho = model.prog(q, "rho")
        rhoatke = self._tc(model, q, "en_rhoatke")
        tke_en = jnp.maximum(rhoatke, 0.0) / rho / sub.a_en
        K_m = self.mix_len.c_m * l_mix * jnp.sqrt(tke_en)
        K_h = K_m / Pr_t
        Diss0 = self.mix_len.c_d * jnp.sqrt(tke_en) / jnp.maximum(l_mix,
                                                                  _TOL)
        dpdz = self._dpdz(model, q, gf, aux, sub, b_up)
        return SimpleNamespace(sub=sub, b_up=b_up, b_en=b_en, E_dyn=E_dyn,
                               D_dyn=D_dyn, E_trb=E_trb, shear2=shear2,
                               l_mix=l_mix, dbdz=dbdz, Pr_t=Pr_t, K_m=K_m,
                               K_h=K_h, Diss0=Diss0, dpdz=dpdz,
                               tke_en=tke_en)

    # --- hooks called by AtmosModel -----------------------------------------
    def init_state(self, model, q, aux):
        """Minimal-area updrafts + BOMEX-style covariance seed (reference
        bomex_edmf.jl init_state_prognostic! turbconv part)."""
        ps = model.param_set
        s = model.prog_spec
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        w_gm = rhou[..., 2]
        # direct thermo from the state (reference init uses
        # PhaseDry/PhaseEquil from e_int — the moisture aux cache is not
        # yet filled at init time)
        Phi = model.aux_get(aux, "orientation.Phi")
        e_int = td.internal_energy_from_state(rho, model.prog(q, "rhoe"),
                                              rhou, Phi)
        if self._moist(model):
            q_tot = model.prog(q, "moisture.rhoq_tot") / rho
            T = td.saturation_adjustment(ps, e_int, rho, q_tot)
            pp = td.phase_partition_equil(ps, T, rho, q_tot)
        else:
            pp = None
            T = td.air_temperature(ps, e_int)
        p = td.air_pressure(ps, T, rho, pp)
        theta_liq = td.liquid_ice_pottemp(ps, T, p, pp)
        z = model.aux_get(aux, "orientation.Phi") / ps.grav
        a_min = self.subdomains.a_min
        N = self.N_up
        ones = jnp.ones(rho.shape + (N,), dtype=q.dtype)
        q = s.set(q, "turbconv.up_rhoa", rho[..., None] * a_min * ones)
        q = s.set(q, "turbconv.up_rhoaw",
                  (rho * w_gm)[..., None] * a_min * ones)
        q = s.set(q, "turbconv.up_rhoatheta_liq",
                  (rho * theta_liq)[..., None] * a_min * ones)
        tke0 = jnp.where(z <= 2500.0, rho * jnp.maximum(1 - z / 3000.0, 0),
                         0.0)
        q = s.set(q, "turbconv.en_rhoatke", tke0)
        q = s.set(q, "turbconv.en_rhoatheta_liq_cv",
                  1e-5 / jnp.maximum(z, 10.0))
        if self._moist(model):
            q_tot = model.prog(q, "moisture.rhoq_tot") / rho
            q = s.set(q, "turbconv.up_rhoaq_tot",
                      (rho * q_tot)[..., None] * a_min * ones)
            q = s.set(q, "turbconv.en_rhoaq_tot_cv",
                      1e-5 / jnp.maximum(z, 10.0))
            q = s.set(q, "turbconv.en_rhoatheta_liq_q_tot_cv",
                      1e-7 / jnp.maximum(z, 10.0))
        return q

    def update_aux(self, model, q, aux, t):
        """Cache subdomain temperatures (reference
        save_subdomain_temperature.jl)."""
        sub = self._subdomain_thermo(model, q, aux)
        aux = model.aux_spec.set(aux, "turbconv.up_T", sub.T_up)
        return model.aux_spec.set(aux, "turbconv.en_T", sub.T_en)

    def flux_first_order(self, model, q, aux, F, u):
        """Vertical advection of all turbconv variables (reference
        edmf_kernels.jl Advect fluxes)."""
        s = model.prog_spec
        khat = model._vertical_unit(aux)               # [..., 3]
        a_en, w_en = self._environment(model, q)
        rhoa_c = self._rhoa_up(model, q)
        rhoa_raw = self._tc(model, q, "up_rhoa")
        void = rhoa_raw <= _TOL
        rhoaw = self._tc(model, q, "up_rhoaw")
        w_up = self._safe_div(rhoaw, rhoa_c)

        def zflux(val):                                # val [..., K]
            return khat[..., :, None] * val[..., None, :]

        F = s.set(F, "turbconv.up_rhoa",
                  zflux(jnp.where(void, 0.0, rhoaw)))
        F = s.set(F, "turbconv.up_rhoaw",
                  zflux(jnp.where(void, 0.0, rhoaw * w_up)))
        F = s.set(F, "turbconv.up_rhoatheta_liq",
                  zflux(jnp.where(void, 0.0,
                                  w_up * self._tc(model, q,
                                                  "up_rhoatheta_liq"))))
        if self._moist(model):
            F = s.set(F, "turbconv.up_rhoaq_tot",
                      zflux(jnp.where(void, 0.0,
                                      w_up * self._tc(model, q,
                                                      "up_rhoaq_tot"))))
        for nm in ("en_rhoatke", "en_rhoatheta_liq_cv", "en_rhoaq_tot_cv",
                   "en_rhoatheta_liq_q_tot_cv"):
            if not self._moist(model) and "q_tot" in nm:
                continue
            F = s.set(F, f"turbconv.{nm}",
                      khat * (self._tc(model, q, nm) * w_en)[..., None])
        return F

    def gradient_argument(self, model, q, aux, t, out):
        ps = model.param_set
        s = model.grad_spec
        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        sub = self._subdomain_thermo(model, q, aux)
        rhoa_raw = self._tc(model, q, "up_rhoa")
        w_up = self._safe_div(self._tc(model, q, "up_rhoaw"), rhoa_raw)
        out = s.set(out, "turbconv.up_w", w_up)
        out = s.set(out, "turbconv.en_theta_liq", sub.theta_liq_en)
        out = s.set(out, "turbconv.en_w", sub.w_en)
        rhoatke = self._tc(model, q, "en_rhoatke")
        out = s.set(out, "turbconv.en_tke",
                    rhoatke / (sub.a_en * rho))
        out = s.set(out, "turbconv.en_theta_liq_cv",
                    self._tc(model, q, "en_rhoatheta_liq_cv")
                    / (sub.a_en * rho))
        out = s.set(out, "turbconv.en_thetav",
                    td.virtual_pottemp(ps, sub.T_en, sub.p_gm, sub.pp_en))
        z = model.aux_get(aux, "orientation.Phi") / ps.grav
        e_kin = 0.5 * ((rhou[..., 0] / rho) ** 2 + (rhou[..., 1] / rho) ** 2
                       + sub.w_en ** 2)
        e_tot_en = td.internal_energy(ps, sub.T_en, sub.pp_en) + e_kin \
            + ps.grav * z
        out = s.set(out, "turbconv.en_h_tot",
                    td.total_specific_enthalpy(ps, e_tot_en, sub.T_en,
                                               sub.pp_en))
        out = s.set(out, "turbconv.u", rhou[..., 0] / rho)
        out = s.set(out, "turbconv.v", rhou[..., 1] / rho)
        if self._moist(model):
            out = s.set(out, "turbconv.en_q_tot", sub.q_tot_en)
            out = s.set(out, "turbconv.en_q_tot_cv",
                        self._tc(model, q, "en_rhoaq_tot_cv")
                        / (sub.a_en * rho))
            out = s.set(out, "turbconv.en_theta_liq_q_tot_cv",
                        self._tc(model, q,
                                 "en_rhoatheta_liq_q_tot_cv")
                        / (sub.a_en * rho))
        return out

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        """Keep vertical components (reference compute_gradient_flux!;
        all consumers read ∇x[3])."""
        k = model._vertical_unit(aux)
        gs, fs = model.grad_spec, model.gf_spec

        def vert(name):
            sl = gs.index(f"turbconv.{name}")
            return jnp.einsum("...dk,...d->...k", grad_g[..., :, sl], k)

        out = fs.set(out, "turbconv.up_dwdz", vert("up_w"))
        _vert_scalar = lambda name: vert(name)[..., 0]
        pairs = [("en_theta_liq", "en_dthetadz"), ("en_w", "en_dwdz"),
                 ("en_tke", "en_dtkedz"),
                 ("en_theta_liq_cv", "en_dtheta_cvdz"),
                 ("en_thetav", "en_dthetavdz"),
                 ("en_h_tot", "en_dhtotdz"),
                 ("u", "dudz"), ("v", "dvdz")]
        if self._moist(model):
            pairs += [("en_q_tot", "en_dqtdz"),
                      ("en_q_tot_cv", "en_dqt_cvdz"),
                      ("en_theta_liq_q_tot_cv", "en_dthqt_cvdz")]
        for g_name, f_name in pairs:
            out = fs.set(out, f"turbconv.{f_name}", _vert_scalar(g_name))
        return out

    def flux_second_order(self, model, q, gf, aux, F):
        """Diffusion of environment second moments + (Coupled) SGS fluxes
        into the grid mean (reference edmf_kernels.jl Diffusion/SGSFlux)."""
        ps = model.param_set
        s = model.prog_spec
        fs = model.gf_spec
        khat = model._vertical_unit(aux)
        pc = self._precompute(model, q, gf, aux)
        sub = pc.sub
        rho = model.prog(q, "rho")
        rho_a_en = rho * sub.a_en

        def add_en_flux(name, val):        # val [...]: scalar z-flux
            return s.set(F, f"turbconv.{name}",
                         s.get(F, f"turbconv.{name}")
                         + khat * val[..., None])

        F = add_en_flux("en_rhoatke",
                        -rho_a_en * pc.K_m
                        * fs.get(gf, "turbconv.en_dtkedz"))
        F = add_en_flux("en_rhoatheta_liq_cv",
                        -rho_a_en * pc.K_h
                        * fs.get(gf, "turbconv.en_dtheta_cvdz"))
        if self._moist(model):
            F = add_en_flux("en_rhoaq_tot_cv",
                            -rho_a_en * pc.K_h
                            * fs.get(gf, "turbconv.en_dqt_cvdz"))
            F = add_en_flux("en_rhoatheta_liq_q_tot_cv",
                            -rho_a_en * pc.K_h
                            * fs.get(gf, "turbconv.en_dthqt_cvdz"))

        if not isinstance(self.coupling, Coupled):
            return F

        # --- SGS fluxes into the grid mean (reference SGSFlux fluxes) ---
        rhou = model.prog(q, "rhou")
        w_gm = rhou[..., 2] / rho
        rhoa_c = self._rhoa_up(model, q)
        rhoa_raw = self._tc(model, q, "up_rhoa")
        void = rhoa_raw <= _TOL
        rhoaw = self._tc(model, q, "up_rhoaw")
        w_up = self._safe_div(rhoaw, rhoa_c)
        z = model.aux_get(aux, "orientation.Phi") / ps.grav

        # enthalpies
        e_kin_up = 0.5 * ((rhou[..., 0] / rho)[..., None] ** 2
                          + (rhou[..., 1] / rho)[..., None] ** 2
                          + w_up ** 2)
        e_tot_up = td.internal_energy(ps, sub.T_up, sub.pp_up) + e_kin_up \
            + (ps.grav * z)[..., None]
        h_up = td.total_specific_enthalpy(ps, e_tot_up, sub.T_up,
                                          sub.pp_up)
        e_kin_en = 0.5 * ((rhou[..., 0] / rho) ** 2
                          + (rhou[..., 1] / rho) ** 2 + sub.w_en ** 2)
        e_tot_en = td.internal_energy(ps, sub.T_en, sub.pp_en) + e_kin_en \
            + ps.grav * z
        h_en = td.total_specific_enthalpy(ps, e_tot_en, sub.T_en,
                                          sub.pp_en)
        rhoe = model.prog(q, "rhoe")
        h_gm = td.total_specific_enthalpy(ps, rhoe / rho, sub.T_gm,
                                          sub.pp_gm)

        mf_h = jnp.sum(jnp.where(void, 0.0, rhoa_c
                                 * (h_gm[..., None] - h_up)
                                 * (w_gm[..., None] - w_up)), axis=-1)
        mf_h = mf_h + rho * sub.a_en * (h_gm - h_en) * (w_gm - sub.w_en)
        f_e = -rho * sub.a_en * pc.K_h \
            * fs.get(gf, "turbconv.en_dhtotdz") + mf_h
        F = s.set(F, "rhoe", s.get(F, "rhoe") + khat * f_e[..., None])

        mf_w = jnp.sum(jnp.where(void, 0.0, rhoa_c
                                 * (w_gm[..., None] - w_up) ** 2), axis=-1)
        mf_w = mf_w + rho * sub.a_en * (w_gm - sub.w_en) ** 2
        f_u = -rho * sub.a_en * pc.K_m * fs.get(gf, "turbconv.dudz")
        f_v = -rho * sub.a_en * pc.K_m * fs.get(gf, "turbconv.dvdz")
        f_w = -rho * sub.a_en * pc.K_m \
            * fs.get(gf, "turbconv.en_dwdz") + mf_w
        Fm = s.get(F, "rhou")
        Fm = Fm + khat[..., :, None] * jnp.stack([f_u, f_v, f_w],
                                                 axis=-1)[..., None, :]
        F = s.set(F, "rhou", Fm)

        if self._moist(model):
            rhoq = model.prog(q, "moisture.rhoq_tot")
            q_up = self._safe_div(self._tc(model, q, "up_rhoaq_tot"),
                                  rhoa_c)
            mf_q = jnp.sum(jnp.where(void, 0.0, rhoa_c
                                     * ((rhoq / rho)[..., None] - q_up)
                                     * (w_gm[..., None] - w_up)), axis=-1)
            mf_q = mf_q + rho * sub.a_en * (rhoq / rho - sub.q_tot_en) \
                * (w_gm - sub.w_en)
            f_q = -rho * sub.a_en * pc.K_h \
                * fs.get(gf, "turbconv.en_dqtdz") + mf_q
            F = s.set(F, "moisture.rhoq_tot",
                      s.get(F, "moisture.rhoq_tot")
                      + khat * f_q[..., None])
        return F

    def source(self, model, q, gf, aux, t):
        """All EDMF sources, returned as a full-width prognostic array
        (reference EntrDetr/Press/Buoy/Shear/Diss/GradProd sources)."""
        s = model.prog_spec
        out = jnp.zeros_like(q)
        if gf is None:
            return out
        pc = self._precompute(model, q, gf, aux)
        sub = pc.sub
        rho = model.prog(q, "rho")
        rhoa_raw = self._tc(model, q, "up_rhoa")
        void = rhoa_raw <= _TOL
        w_up = self._safe_div(self._tc(model, q, "up_rhoaw"), rhoa_raw)
        th_up = self._safe_div(self._tc(model, q, "up_rhoatheta_liq"),
                               rhoa_raw)
        E, D, Et = pc.E_dyn, pc.D_dyn, pc.E_trb
        w_en = sub.w_en
        w_gm = model.prog(q, "rhou")[..., 2] / rho
        tke_sp = pc.tke_en

        # updraft sources
        S_a = jnp.where(void, 0.0, E - D)
        S_w = jnp.where(void, 0.0,
                        (E + Et) * w_en[..., None] - (D + Et) * w_up) \
            + rhoa_raw * (pc.b_up - pc.dpdz)
        S_th = jnp.where(void, 0.0,
                         (E + Et) * sub.theta_liq_en[..., None]
                         - (D + Et) * th_up)
        out = s.set(out, "turbconv.up_rhoa", S_a)
        out = s.set(out, "turbconv.up_rhoaw", S_w)
        out = s.set(out, "turbconv.up_rhoatheta_liq", S_th)
        if self._moist(model):
            qt_up = self._safe_div(self._tc(model, q, "up_rhoaq_tot"),
                                   rhoa_raw)
            S_q = jnp.where(void, 0.0,
                            (E + Et) * sub.q_tot_en[..., None]
                            - (D + Et) * qt_up)
            out = s.set(out, "turbconv.up_rhoaq_tot", S_q)

        # environment TKE
        dw = w_up - w_en[..., None]
        ed_tke = jnp.sum(jnp.where(void, 0.0,
                                   Et * (w_en - w_gm)[..., None] * (-dw)
                                   - (E + Et) * tke_sp[..., None]
                                   + D * dw * dw / 2), axis=-1)
        rhoa_c = self._rhoa_up(model, q)
        press_tke = jnp.sum(jnp.where(void, 0.0,
                                      rhoa_c * dw * pc.dpdz), axis=-1)
        rho_a_en = rho * sub.a_en
        shear_tke = rho_a_en * pc.K_m * pc.shear2
        buoy_tke = -rho_a_en * pc.K_h * pc.dbdz
        rhoatke = self._tc(model, q, "en_rhoatke")
        diss_tke = -pc.Diss0 * rhoatke
        out = s.set(out, "turbconv.en_rhoatke",
                    ed_tke + press_tke + shear_tke + buoy_tke + diss_tke)

        # θ_liq covariance
        fs = model.gf_spec
        th_gm = sub.theta_liq_gm
        th_en = sub.theta_liq_en
        rhocv_th = self._tc(model, q, "en_rhoatheta_liq_cv")
        dthdz = fs.get(gf, "turbconv.en_dthetadz")
        ed_cv = jnp.sum(jnp.where(void, 0.0,
                                  D * (th_up - th_en[..., None]) ** 2
                                  + 2 * Et * (th_en - th_gm)[..., None]
                                  * (th_en[..., None] - th_up)
                                  - (E + Et) * rhocv_th[..., None]),
                        axis=-1)
        gp_cv = rho_a_en * 2 * pc.K_h * dthdz * dthdz
        out = s.set(out, "turbconv.en_rhoatheta_liq_cv",
                    ed_cv - pc.Diss0 * rhocv_th + gp_cv)

        if self._moist(model):
            qt_up = self._safe_div(self._tc(model, q, "up_rhoaq_tot"),
                                   rhoa_raw)
            qt_en = sub.q_tot_en
            qt_gm = sub.q_tot_gm
            dqtdz = fs.get(gf, "turbconv.en_dqtdz")
            rhocv_qt = self._tc(model, q, "en_rhoaq_tot_cv")
            ed_q = jnp.sum(jnp.where(void, 0.0,
                                     D * (qt_up - qt_en[..., None]) ** 2
                                     + 2 * Et * (qt_en - qt_gm)[..., None]
                                     * (qt_en[..., None] - qt_up)
                                     - (E + Et) * rhocv_qt[..., None]),
                           axis=-1)
            gp_q = rho_a_en * 2 * pc.K_h * dqtdz * dqtdz
            out = s.set(out, "turbconv.en_rhoaq_tot_cv",
                        ed_q - pc.Diss0 * rhocv_qt + gp_q)

            rhocv_tq = self._tc(model, q,
                                "en_rhoatheta_liq_q_tot_cv")
            ed_tq = jnp.sum(jnp.where(
                void, 0.0,
                D * (th_up - th_en[..., None])
                * (qt_up - qt_en[..., None])
                + Et * (th_en - th_gm)[..., None]
                * (qt_en[..., None] - qt_up)
                + Et * (qt_en - qt_gm)[..., None]
                * (th_en[..., None] - th_up)
                - (E + Et) * rhocv_tq[..., None]), axis=-1)
            gp_tq = rho_a_en * 2 * pc.K_h * dthdz * dqtdz
            out = s.set(out, "turbconv.en_rhoatheta_liq_q_tot_cv",
                        ed_tq - pc.Diss0 * rhocv_tq + gp_tq)
        return out

    # --- boundary conditions (reference EDMFBottomBC / EDMFTopBC) -----------
    def surface_values(self, model, qM, auxM):
        """Surface updraft/environment values (reference
        surface_functions.jl subdomain_surface_values)."""
        ps = model.param_set
        sf = self.surface
        rho = model.prog(qM, "rho")
        T, p, _, pp = model.thermo_full(qM, auxM)
        theta_liq = td.liquid_ice_pottemp(ps, T, p, pp)
        Pi = td.exner(ps, p, pp)
        cpm = td.cp_m(ps, pp)
        lv = td.latent_heat_vapor(ps, T)

        th_flux = sf.shf / Pi / cpm
        q_flux = sf.lhf / lv
        ol, ustar = sf.obukhov_length, sf.ustar
        unstable = ol < -_TOL
        zLL = sf.zLL
        if unstable:
            fact = (1.0 - sf.psi_phi_stab * zLL / ol) ** (-2.0 / 3.0)
            tke_fact = np.cbrt((zLL / ol) ** 2)
        else:
            fact, tke_fact = 1.0, 0.0
        us2 = ustar ** 2
        th_cv = 4 * th_flux * th_flux / us2 * fact
        q_cv = 4 * q_flux * q_flux / us2 * fact
        thq_cv = 4 * th_flux * q_flux / us2 * fact
        tke = us2 * (sf.kappa_star2 + tke_fact)

        std = jnp.asarray(self.upd_surface_std, dtype=qM.dtype)
        a_up = sf.a / self.N_up
        th_up = theta_liq[..., None] + std * jnp.sqrt(
            jnp.maximum(th_cv, 0.0))[..., None]
        if self._moist(model):
            q_tot = model.prog(qM, "moisture.rhoq_tot") / rho
            q_up = q_tot[..., None] + std * jnp.sqrt(
                jnp.maximum(q_cv, 0.0))[..., None]
        else:
            q_up = None
        return SimpleNamespace(a_up=a_up, th_up=th_up, q_up=q_up,
                               th_cv=th_cv, q_cv=q_cv, thq_cv=thq_cv,
                               tke=tke)

    def boundary_state(self, model, tag, nrm, qM, auxM, qP, t):
        """tag 1 = bottom (surface values), tag 2 = top (ρaw = 0)."""
        s = model.prog_spec
        rho = model.prog(qM, "rho")
        if tag == 1:
            sv = self.surface_values(model, qM, auxM)
            a_en = 1.0 - self.surface.a
            qP = s.set(qP, "turbconv.up_rhoa",
                       jnp.broadcast_to((rho * sv.a_up)[..., None],
                                        rho.shape + (self.N_up,)))
            qP = s.set(qP, "turbconv.up_rhoaw",
                       jnp.zeros(rho.shape + (self.N_up,), qM.dtype))
            qP = s.set(qP, "turbconv.up_rhoatheta_liq",
                       rho[..., None] * sv.a_up * sv.th_up)
            qP = s.set(qP, "turbconv.en_rhoatke", rho * a_en * sv.tke)
            qP = s.set(qP, "turbconv.en_rhoatheta_liq_cv",
                       rho * a_en * sv.th_cv)
            if self._moist(model):
                qP = s.set(qP, "turbconv.up_rhoaq_tot",
                           rho[..., None] * sv.a_up * sv.q_up)
                qP = s.set(qP, "turbconv.en_rhoaq_tot_cv",
                           rho * a_en * sv.q_cv)
                qP = s.set(qP, "turbconv.en_rhoatheta_liq_q_tot_cv",
                           rho * a_en * sv.thq_cv)
        else:
            qP = s.set(qP, "turbconv.up_rhoaw",
                       jnp.zeros(rho.shape + (self.N_up,), qM.dtype))
        return qP

    def filter_variables(self, model) -> Tuple[str, ...]:
        """Prognostic names to keep positive (reference
        turbconv_filters)."""
        names = ["turbconv.up_rhoa", "turbconv.up_rhoaw",
                 "turbconv.up_rhoatheta_liq", "turbconv.en_rhoatke",
                 "turbconv.en_rhoatheta_liq_cv"]
        if any("q_tot" in n for n in model.prog_spec.flattened_names()):
            names += ["turbconv.up_rhoaq_tot", "turbconv.en_rhoaq_tot_cv"]
        return tuple(names)
