"""Model-specific Riemann solvers for the dry compressible atmosphere.

Scope of reference ``src/Numerics/DGMethods/NumericalFluxes.jl``
(RoeNumericalFlux :353, HLLCNumericalFlux :373, LMARSNumericalFlux :383)
with the atmos implementations in ``src/Atmos/Model/AtmosModel.jl``
(:1245-1600: Roe with reference-pressure adjustment).

Vectorized over face-node batches; extra advected scalars (moisture,
tracers) ride the contact wave (upwinded by the normal velocity sign).
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.dg.numerical_fluxes import NumericalFluxFirstOrder
from climatemachine_tpu.physics import thermodynamics as td


def _model_normal_flux(bl, nrm, q, aux, t):
    F = bl.flux_first_order(q, aux, t)
    return jnp.einsum("...ci,...c->...i", F, nrm)


def _roe_linear(bl, nrm, qM, auxM, qP, auxP, t):
    """Roe flux for AtmosLinearModel: central flux + reference-state
    acoustic dissipation (reference linear.jl:283-343)."""
    from climatemachine_tpu.atmos.moisture import DryModel
    a = bl.atmos
    if not isinstance(a.physics.moisture, (type(None), DryModel)):
        # reference linear.jl asserts moisture_model isa DryModel: extra
        # prognostic components would get a purely central (dissipation-
        # free) flux here, which is unstable for advected jumps
        raise NotImplementedError(
            "RoeNumericalFlux on AtmosLinearModel requires DryModel "
            "moisture (reference linear.jl numerical_flux_first_order!)")
    ps = bl.param_set
    s = a.prog_spec
    FM = bl.flux_first_order(qM, auxM, t)
    FP = bl.flux_first_order(qP, auxP, t)
    out = 0.5 * jnp.einsum("...ci,...c->...i", FM + FP, nrm)

    def refs(aux):
        ref_rho = a.aux_get(aux, "ref_state.rho")
        ref_rhoe = a.aux_get(aux, "ref_state.rhoe")
        ref_p = a.aux_get(aux, "ref_state.p")
        ref_T = a.aux_get(aux, "ref_state.T")
        h = (ref_rhoe + ref_p) / ref_rho
        c = td.soundspeed_air(ps, ref_T)
        return h, c

    hM, cM = refs(auxM)
    hP, cP = refs(auxP)
    h = 0.5 * (hM + hP)
    c = 0.5 * (cM + cP)
    dpL = bl.linearized_pressure(qP, auxP) - bl.linearized_pressure(qM, auxM)
    drhou_n = jnp.einsum("...i,...i->...",
                         s.get(qP, "rhou") - s.get(qM, "rhou"), nrm)
    out = s.set(out, "rho", s.get(out, "rho") - dpL / (2.0 * c))
    out = s.set(out, "rhou",
                s.get(out, "rhou")
                - 0.5 * (c * drhou_n)[..., None] * nrm)
    out = s.set(out, "rhoe", s.get(out, "rhoe") - h * dpL / (2.0 * c))
    return out


def _is_linear(bl):
    # AtmosLinearModel shares the parent schema but has no prog_spec of
    # its own; duck-typed to avoid an import cycle with atmos.linear.
    return hasattr(bl, "linearized_pressure") and hasattr(bl, "atmos")


class RoeNumericalFlux(NumericalFluxFirstOrder):
    """Roe flux with Roe-averaged wave decomposition (reference :353 +
    AtmosModel.jl:1245); on an AtmosLinearModel reduces to central +
    reference-state acoustic dissipation (reference linear.jl:283)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        if _is_linear(bl):
            return _roe_linear(bl, nrm, qM, auxM, qP, auxP, t)
        ps = bl.param_set
        s = bl.prog_spec
        gamma = ps.cp_d / ps.cv_d

        rhoM = s.get(qM, "rho")
        rhoP = s.get(qP, "rho")
        uM = s.get(qM, "rhou") / rhoM[..., None]
        uP = s.get(qP, "rhou") / rhoP[..., None]
        TM, pM, _ = bl.recover_thermo(qM, auxM)
        TP, pP, _ = bl.recover_thermo(qP, auxP)
        hM = (s.get(qM, "rhoe") + pM) / rhoM
        hP = (s.get(qP, "rhoe") + pP) / rhoP
        cM = td.soundspeed_air(ps, TM)
        cP = td.soundspeed_air(ps, TP)
        Phi = bl.aux_get(auxM, "orientation.Phi")

        # Roe averages
        sM = jnp.sqrt(rhoM)
        sP = jnp.sqrt(rhoP)
        w = sM / (sM + sP)
        uh = w[..., None] * uM + (1 - w[..., None]) * uP
        hh = w * hM + (1 - w) * hP
        rhoh = sM * sP
        ke = 0.5 * jnp.sum(uh * uh, axis=-1)
        # Roe-average of the PER-SIDE sound speeds (reference
        # AtmosModel.jl:1071 c̃ = sqrt(roe_average(c⁻², c⁺²))).  The
        # textbook c² = (γ−1)(h − ke − Φ) assumes e_int = cv·T; this
        # framework uses the offset convention e_int = cv(T − T_0)
        # (thermodynamics.py:77), for which that formula understates c²
        # by R·T_0 ≈ 60% at tropospheric temperatures — wrong wave
        # strengths that blew up the vertical-FV Roe fluxes (caught by
        # the baroclinic_wave_fvm smoke test).
        c2 = w * cM ** 2 + (1 - w) * cP ** 2
        ch = jnp.sqrt(c2)
        un = jnp.sum(uh * nrm, axis=-1)

        drho = rhoP - rhoM
        dp = pP - pM
        du = uP - uM
        dun = jnp.sum(du * nrm, axis=-1)
        dut = du - dun[..., None] * nrm

        l1 = jnp.abs(un - ch)
        l2 = jnp.abs(un)
        l3 = jnp.abs(un + ch)

        w1 = (dp - rhoh * ch * dun) / (2 * c2)
        w3 = (dp + rhoh * ch * dun) / (2 * c2)
        w2 = drho - dp / c2

        # dissipation per conserved var
        d_rho = l1 * w1 + l2 * w2 + l3 * w3
        d_rhou = ((l1 * w1)[..., None] * (uh - ch[..., None] * nrm)
                  + l2[..., None] * (w2[..., None] * uh
                                     + rhoh[..., None] * dut)
                  + (l3 * w3)[..., None] * (uh + ch[..., None] * nrm))
        # contact-wave energy: at constant (p, u) a density jump carries
        # Δ(ρe) = Δρ·(ke + Φ − cv T_0) in the offset convention (ρT is
        # constant across the contact, so Δ(ρ e_int) = −cv T_0 Δρ)
        d_rhoe = (l1 * w1 * (hh - ch * un)
                  + l2 * (w2 * (ke + Phi - ps.cv_d * ps.T_0)
                          + rhoh * jnp.sum(uh * dut, -1))
                  + l3 * w3 * (hh + ch * un))

        central = 0.5 * (_model_normal_flux(bl, nrm, qM, auxM, t)
                         + _model_normal_flux(bl, nrm, qP, auxP, t))
        out = central
        out = s.set(out, "rho", s.get(out, "rho") - 0.5 * d_rho)
        out = s.set(out, "rhou", s.get(out, "rhou") - 0.5 * d_rhou)
        out = s.set(out, "rhoe", s.get(out, "rhoe") - 0.5 * d_rhoe)

        # passive scalars: contact-wave upwinding with Roe-averaged χ̃
        # (reference AtmosModel.jl:1102-1131: (w1+w2)χ̃ + |ũᵀn|(Δρχ −
        # χ̃Δp/c̃²) ≡ χ̃·d_ρ + |ũᵀn|(Δρχ − χ̃Δρ))
        extra = [n for n in s.names() if n not in ("rho", "rhou", "rhoe")]
        for name in extra:
            vec = s.get(qM, name).ndim == rhoM.ndim + 1
            phiM = s.get(qM, name) / (rhoM[..., None] if vec else rhoM)
            phiP = s.get(qP, name) / (rhoP[..., None] if vec else rhoP)
            phih = (w[..., None] if vec else w) * phiM \
                + ((1 - w)[..., None] if vec else (1 - w)) * phiP
            if not vec:
                diss = (l2 * (phiP * rhoP - phiM * rhoM - phih * drho)
                        + phih * d_rho)
            else:
                diss = (l2[..., None]
                        * (phiP * rhoP[..., None] - phiM * rhoM[..., None]
                           - phih * drho[..., None])
                        + phih * d_rho[..., None])
            out = s.set(out, name, s.get(out, name) - 0.5 * diss)
        return out


class HLLCNumericalFlux(NumericalFluxFirstOrder):
    """HLLC with Einfeldt wavespeed estimates (reference :373); no
    intermediate wave exists for AtmosLinearModel, so it simplifies to
    Rusanov there (reference linear.jl:345-372)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        if _is_linear(bl):
            from climatemachine_tpu.dg.numerical_fluxes import (
                RusanovNumericalFlux)
            return RusanovNumericalFlux()(bl, nrm, qM, auxM, qP, auxP, t)
        ps = bl.param_set
        s = bl.prog_spec
        rhoM = s.get(qM, "rho")
        rhoP = s.get(qP, "rho")
        uM = s.get(qM, "rhou") / rhoM[..., None]
        uP = s.get(qP, "rhou") / rhoP[..., None]
        TM, pM, _ = bl.recover_thermo(qM, auxM)
        TP, pP, _ = bl.recover_thermo(qP, auxP)
        cM = td.soundspeed_air(ps, TM)
        cP = td.soundspeed_air(ps, TP)
        unM = jnp.sum(uM * nrm, axis=-1)
        unP = jnp.sum(uP * nrm, axis=-1)

        SL = jnp.minimum(unM - cM, unP - cP)
        SR = jnp.maximum(unM + cM, unP + cP)
        num = (pP - pM + rhoM * unM * (SL - unM) - rhoP * unP * (SR - unP))
        den = rhoM * (SL - unM) - rhoP * (SR - unP)
        Ss = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)

        FM = _model_normal_flux(bl, nrm, qM, auxM, t)
        FP = _model_normal_flux(bl, nrm, qP, auxP, t)

        def star_state(q, rho, u, un, p, S):
            """HLLC star-region conserved state."""
            fac = rho * (S - un) / (S - Ss)
            out = jnp.zeros_like(q)
            out = s.set(out, "rho", fac)
            ustar = u + (Ss - un)[..., None] * nrm
            out = s.set(out, "rhou", fac[..., None] * ustar)
            E = s.get(q, "rhoe") / rho
            Estar = E + (Ss - un) * (Ss + p / (rho * (S - un)))
            out = s.set(out, "rhoe", fac * Estar)
            for name in s.names():
                if name in ("rho", "rhou", "rhoe"):
                    continue
                phi = s.get(q, name) / (rho[..., None]
                                        if s.get(q, name).ndim
                                        == rho.ndim + 1 else rho)
                if phi.ndim == rho.ndim:
                    out = s.set(out, name, fac * phi)
                else:
                    out = s.set(out, name, fac[..., None] * phi)
            return out

        qMs = star_state(qM, rhoM, uM, unM, pM, SL)
        qPs = star_state(qP, rhoP, uP, unP, pP, SR)
        FMs = FM + SL[..., None] * (qMs - qM)
        FPs = FP + SR[..., None] * (qPs - qP)

        SL_ = SL[..., None]
        SR_ = SR[..., None]
        Ss_ = Ss[..., None]
        out = jnp.where(SL_ >= 0, FM,
                        jnp.where(Ss_ >= 0, FMs,
                                  jnp.where(SR_ >= 0, FPs, FP)))
        return out


class LMARSNumericalFlux(NumericalFluxFirstOrder):
    """Low Mach number Approximate Riemann Solver (reference
    NumericalFluxes.jl:383 + AtmosModel.jl:1516; Chen et al. 2013 eqs
    46-50).  Pressure/velocity half-states from an acoustic solve, all
    advected quantities upwinded by u_half; supports Dry/EquilMoist and
    rides tracers on the contact wave.  beta = 1."""

    def __init__(self, beta: float = 1.0):
        self.beta = float(beta)

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        ps = bl.param_set
        s = bl.prog_spec

        rhoM = s.get(qM, "rho")
        rhoP = s.get(qP, "rho")
        uM = s.get(qM, "rhou") / rhoM[..., None]
        uP = s.get(qP, "rhou") / rhoP[..., None]
        TM, pM, _, ppM = bl.thermo_full(qM, auxM)
        TP, pP, _, ppP = bl.thermo_full(qP, auxP)
        # match the volume flux's reference-pressure subtraction
        if bl.ref_state is not None and bl.ref_state.subtract_off:
            pref = bl.aux_get(auxM, "ref_state.p")
            prefP = bl.aux_get(auxP, "ref_state.p")
            pM = pM - pref
            pP = pP - prefP
        # acoustic impedance scale: SYMMETRIC average sound speed.  The
        # reference uses the minus-side c (AtmosModel.jl:1567), which makes
        # the two per-side evaluations of a face inconsistent (~1e-9 mass
        # drift); the averaged c keeps LMARS exactly conservative.
        c_h = 0.5 * (td.soundspeed_air(ps, TM, ppM)
                     + td.soundspeed_air(ps, TP, ppP))
        unM = jnp.sum(uM * nrm, axis=-1)
        unP = jnp.sum(uP * nrm, axis=-1)
        hM = (s.get(qM, "rhoe") + pM) / rhoM
        hP = (s.get(qP, "rhoe") + pP) / rhoP

        b = self.beta
        u_half = 0.5 * (unP + unM) - b / (rhoM + rhoP) / c_h * (pP - pM)
        p_half = 0.5 * (pP + pM) - b * (rhoM + rhoP) * c_h / 4 * (unP - unM)

        up = u_half > 0.0
        rho_b = jnp.where(up, rhoM, rhoP)
        rhou_b = jnp.where(up[..., None], s.get(qM, "rhou"),
                           s.get(qP, "rhou"))
        rhoh_b = jnp.where(up, rhoM * hM, rhoP * hP)

        out = jnp.zeros(jnp.broadcast_shapes(qM.shape, qP.shape),
                        dtype=qM.dtype)
        out = s.set(out, "rho", rho_b * u_half)
        out = s.set(out, "rhou", rhou_b * u_half[..., None]
                    + p_half[..., None] * nrm)
        out = s.set(out, "rhoe", rhoh_b * u_half)
        # all other density-weighted scalars: upwind by u_half
        for name in s.names():
            if name in ("rho", "rhou", "rhoe"):
                continue
            xb = jnp.where(up[..., None] if s.get(qM, name).ndim
                           == rhoM.ndim + 1 else up,
                           s.get(qM, name), s.get(qP, name))
            out = s.set(out, name, xb * (u_half[..., None]
                        if xb.ndim == rhoM.ndim + 1 else u_half))
        return out


class RoeNumericalFluxMoist(NumericalFluxFirstOrder):
    """Roe flux for EquilMoist atmosphere (reference NumericalFluxes.jl:392
    + AtmosModel.jl:1276-1514): 6-wave decomposition (rho, rhou, rhoe,
    rhoq_tot) about the Roe-averaged moist state (saturation adjustment at
    the averaged e_int/rho/q_tot), optional low-Mach scaling of the
    acoustic eigenvalues (LM flag).  Dissipation solved as a batched 6x6
    linear system (M Lambda M^{-1} dq via jnp.linalg.solve)."""

    def __init__(self, LM: bool = False):
        self.LM = bool(LM)

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        ps = bl.param_set
        s = bl.prog_spec
        gamma_d = ps.cp_d / ps.cv_d

        rhoM = s.get(qM, "rho")
        rhoP = s.get(qP, "rho")
        uM = s.get(qM, "rhou") / rhoM[..., None]
        uP = s.get(qP, "rhou") / rhoP[..., None]
        TM, pM, _, ppM = bl.thermo_full(qM, auxM)
        TP, pP, _, ppP = bl.thermo_full(qP, auxP)
        hM = (s.get(qM, "rhoe") + pM) / rhoM
        hP = (s.get(qP, "rhoe") + pP) / rhoP
        qtM = s.get(qM, "moisture.rhoq_tot") / rhoM
        qtP = s.get(qP, "moisture.rhoq_tot") / rhoP
        Phi = bl.aux_get(auxM, "orientation.Phi")

        # Roe averages
        sM = jnp.sqrt(rhoM)
        sP = jnp.sqrt(rhoP)
        w = sM / (sM + sP)

        def roe(a, b):
            if a.ndim == w.ndim + 1:
                return w[..., None] * a + (1 - w[..., None]) * b
            return w * a + (1 - w) * b

        uh = roe(uM, uP)
        hh = roe(hM, hP)
        qt = roe(qtM, qtP)
        rho = sM * sP
        e_intM = td.internal_energy(ps, TM, ppM)
        e_intP = td.internal_energy(ps, TP, ppP)
        e_int = roe(e_intM, e_intP)
        # saturation adjustment at the Roe state (reference PhaseEquil)
        Troe = td.saturation_adjustment(ps, e_int, rho, qt)
        pproe = td.phase_partition_equil(ps, Troe, rho, qt)
        R_m = td.gas_constant_air(ps, pproe)
        cp_m = td.cp_m(ps, pproe)
        cv_m = td.cv_m(ps, pproe)

        ke = 0.5 * jnp.sum(uh * uh, axis=-1)
        ch = jnp.sqrt(jnp.maximum((gamma_d - 1.0) * (hh - ke), 1e-10))
        un = jnp.sum(uh * nrm, axis=-1)

        if self.LM:
            cMs = td.soundspeed_air(ps, TM, ppM)
            cPs = td.soundspeed_air(ps, TP, ppP)
            Mach = 0.5 * (jnp.linalg.norm(uM, axis=-1) / cMs
                          + jnp.linalg.norm(uP, axis=-1) / cPs)
            scale = jnp.minimum(
                Mach * jnp.sqrt(4.0 + (1.0 - Mach ** 2) ** 2)
                / (1.0 + Mach ** 2), 1.0)
            c_lm = ch * scale
        else:
            c_lm = ch

        # tangent basis from a fixed random unit vector (reference :1355)
        om, de = jnp.pi / 3, jnp.pi / 5
        rv = jnp.asarray([jnp.sin(om) * jnp.cos(de),
                          jnp.cos(om) * jnp.cos(de), jnp.sin(de)],
                         dtype=qM.dtype)
        tau1 = jnp.cross(jnp.broadcast_to(rv, nrm.shape), nrm)
        tau2 = jnp.cross(tau1, nrm)

        ucm = uh - ch[..., None] * nrm
        ucp = uh + ch[..., None] * nrm

        one = jnp.ones_like(un)
        zero = jnp.zeros_like(un)
        e_int_v0 = ps.e_int_v0
        # columns of the right-eigenvector matrix (reference :1497-1506)
        cols = [
            jnp.stack([one, ucm[..., 0], ucm[..., 1], ucm[..., 2],
                       hh - ch * un, qt], axis=-1),
            jnp.stack([zero, tau1[..., 0], tau1[..., 1], tau1[..., 2],
                       jnp.sum(tau1 * uh, -1), zero], axis=-1),
            jnp.stack([zero, tau2[..., 0], tau2[..., 1], tau2[..., 2],
                       jnp.sum(tau2 * uh, -1), zero], axis=-1),
            jnp.stack([one, uh[..., 0], uh[..., 1], uh[..., 2],
                       2 * ke + Phi - ps.T_0 * cv_m, zero], axis=-1),
            jnp.stack([one, ucp[..., 0], ucp[..., 1], ucp[..., 2],
                       hh + ch * un, qt], axis=-1),
            jnp.stack([zero, zero, zero, zero,
                       e_int_v0 * one, one], axis=-1),
        ]
        Mmat = jnp.stack(cols, axis=-1)           # [..., 6(state), 6(wave)]
        lam = jnp.stack([jnp.abs(un - c_lm), jnp.abs(un), jnp.abs(un),
                         jnp.abs(un), jnp.abs(un + c_lm), jnp.abs(un)],
                        axis=-1)

        dstate = jnp.stack(
            [rhoP - rhoM,
             (s.get(qP, "rhou") - s.get(qM, "rhou"))[..., 0],
             (s.get(qP, "rhou") - s.get(qM, "rhou"))[..., 1],
             (s.get(qP, "rhou") - s.get(qM, "rhou"))[..., 2],
             s.get(qP, "rhoe") - s.get(qM, "rhoe"),
             s.get(qP, "moisture.rhoq_tot") - s.get(qM, "moisture.rhoq_tot")],
            axis=-1)
        wamp = jnp.linalg.solve(Mmat, dstate[..., None])[..., 0]
        diss = jnp.einsum("...sw,...w->...s", Mmat, lam * wamp)

        central = 0.5 * (_model_normal_flux(bl, nrm, qM, auxM, t)
                         + _model_normal_flux(bl, nrm, qP, auxP, t))
        out = central
        idx = [s.index("rho").start, s.index("rhou").start,
               s.index("rhou").start + 1, s.index("rhou").start + 2,
               s.index("rhoe").start, s.index("moisture.rhoq_tot").start]
        for k, i in enumerate(idx):
            out = out.at[..., i].add(-0.5 * diss[..., k])
        return out
