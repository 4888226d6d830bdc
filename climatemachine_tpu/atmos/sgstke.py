"""Prognostic subgrid-scale TKE model (Deardorff 1980).

Scope of reference ``src/Atmos/Model/sgstke.jl`` (SGStkeModel :6,
vars_state :71-76, gradient hooks :96-125) and
``tendencies_sgstke.jl`` (advective flux :10, diffusive flux −2 K_m ρ ∇e
:21, ShearProduction :41, BuoyancyProduction :48, Dissipation :71).

Adds a prognostic SGS turbulent kinetic energy ρe_SGS advected with the
flow, diffused with 2K_m, produced by resolved shear (−ρ τ:S) and
buoyancy flux, dissipated at C e^{3/2}/l with the Deardorff stability
length l = min(0.76 √e/N_θ, Δ).  Pairs with the :class:`Deardorff`
closure (common/turbulence.py) which draws ν = 0.1 l √e from this state.
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.utils.variables import VarSpec


class SGStkeModel:
    """Prognostic ρe_SGS component plugged into AtmosPhysics.sgstke."""

    def vars_prognostic(self) -> VarSpec:
        return VarSpec(rhoe_SGS=1)

    def vars_gradient(self) -> VarSpec:
        return VarSpec(e_SGS=1, theta_li=1)

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec(d_e_SGS=3, d_theta_li=3)

    # --- helpers -----------------------------------------------------------
    @staticmethod
    def tke(model, q):
        rho = model.prog(q, "rho")
        return jnp.maximum(model.prog(q, "sgstke.rhoe_SGS") / rho, 0.0)

    @staticmethod
    def _theta_li(model, q, aux):
        ps = model.param_set
        T, p, _, pp = model.thermo_full(q, aux)
        return td.liquid_ice_pottemp(ps, T, p, pp)

    @staticmethod
    def _T_ref(model, aux):
        try:
            return model.aux_get(aux, "ref_state.T")
        except KeyError:
            return 288.0

    def stability_length(self, model, q, gf, aux):
        """l = min(0.76 √e / N_θ, Δ) (reference sgstke.jl /
        TurbulenceClosures.jl:744)."""
        ps = model.param_set
        e = self.tke(model, q)
        delta = model.aux_get(aux, "turbulence.delta")
        dth = model.gf_spec.get(gf, "sgstke.d_theta_li")
        T_ref = self._T_ref(model, aux)
        N2 = jnp.abs((ps.grav / T_ref) * dth[..., 2])
        l_s = 0.76 * jnp.sqrt(e) / jnp.sqrt(N2 + 1e-20)
        return jnp.minimum(l_s, delta), delta, e

    # --- gradient chain ----------------------------------------------------
    def gradient_argument(self, model, q, aux, t, out):
        s = model.grad_spec
        out = s.set(out, "sgstke.e_SGS", self.tke(model, q))
        out = s.set(out, "sgstke.theta_li", self._theta_li(model, q, aux))
        return out

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        gs, fs = model.grad_spec, model.gf_spec
        out = fs.set(out, "sgstke.d_e_SGS",
                     grad_g[..., :, gs.index("sgstke.e_SGS").start])
        out = fs.set(out, "sgstke.d_theta_li",
                     grad_g[..., :, gs.index("sgstke.theta_li").start])
        return out

    # --- fluxes ------------------------------------------------------------
    def flux_first_order(self, model, q, aux, F, u):
        s = model.prog_spec
        re = model.prog(q, "sgstke.rhoe_SGS")
        return s.set(F, "sgstke.rhoe_SGS", re[..., None] * u)

    def flux_second_order(self, model, q, gf, aux, nu, F):
        """−2 ρ K_m ∇e_SGS (reference tendencies_sgstke.jl:21)."""
        s = model.prog_spec
        rho = model.prog(q, "rho")
        d_e = model.gf_spec.get(gf, "sgstke.d_e_SGS")
        fe = -2.0 * rho[..., None] * nu * d_e
        return s.set(F, "sgstke.rhoe_SGS",
                     s.get(F, "sgstke.rhoe_SGS") + fe)

    # --- sources -----------------------------------------------------------
    def source(self, model, q, gf, aux, t):
        """Shear + buoyancy production and dissipation; returns the
        scalar dρe_SGS/dt (reference tendencies_sgstke.jl:41-88)."""
        from climatemachine_tpu.common.turbulence import _unpack_sym
        ps = model.param_set
        turb = model.physics.turbulence
        s = model.prog_spec
        fs = model.gf_spec
        rho = model.prog(q, "rho")
        if gf is None:
            return jnp.zeros_like(rho)

        nu, D_t = turb.viscosity(model, q, gf, aux, t)
        S = _unpack_sym(fs.get(gf, "S"))
        tau = -2.0 * nu[..., :, None] * S
        # shear production: −ρ τ:∇u (= −ρ τ:S for symmetric τ)
        shear = -rho * jnp.sum(tau * S, axis=(-2, -1))

        # buoyancy production: (g/T_ref)(A F_θli + B F_qt)[vertical]
        T_ref = self._T_ref(model, aux)
        dth = fs.get(gf, "sgstke.d_theta_li")
        Kh = D_t if D_t.ndim == rho.ndim + 1 else D_t[..., None]
        f_th = -rho[..., None] * Kh * dth
        try:
            q_tot = model.prog(q, "moisture.rhoq_tot") / rho
            d_qt = fs.get(gf, "moisture.d_q_tot")
            f_qt = -rho[..., None] * Kh * d_qt
            A = 1.0 + 0.61 * q_tot
            buoy = (ps.grav / T_ref) * (A * f_th[..., 2]
                                        + 0.61 * f_qt[..., 2])
        except KeyError:
            buoy = (ps.grav / T_ref) * f_th[..., 2]

        # dissipation: −ρ C e^{3/2} / l, C = 0.19 + 0.51 l/Δ
        l, delta, e = self.stability_length(model, q, gf, aux)
        C = 0.19 + 0.51 * (l / delta)
        diss = -rho * C * e ** 1.5 / jnp.maximum(l, 1e-10)
        return shear + buoy + diss
