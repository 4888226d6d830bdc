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


class RoeNumericalFlux(NumericalFluxFirstOrder):
    """Roe flux with Roe-averaged wave decomposition (reference :353 +
    AtmosModel.jl:1245)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
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
        Phi = bl.aux_get(auxM, "orientation.Phi")

        # Roe averages
        sM = jnp.sqrt(rhoM)
        sP = jnp.sqrt(rhoP)
        w = sM / (sM + sP)
        uh = w[..., None] * uM + (1 - w[..., None]) * uP
        hh = w * hM + (1 - w) * hP
        rhoh = sM * sP
        ke = 0.5 * jnp.sum(uh * uh, axis=-1)
        c2 = (gamma - 1) * jnp.maximum(hh - ke - Phi, 1e-8)
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
        d_rhoe = (l1 * w1 * (hh - ch * un)
                  + l2 * (w2 * (ke + Phi) + rhoh * jnp.sum(uh * dut, -1))
                  + l3 * w3 * (hh + ch * un))

        central = 0.5 * (_model_normal_flux(bl, nrm, qM, auxM, t)
                         + _model_normal_flux(bl, nrm, qP, auxP, t))
        out = central
        out = s.set(out, "rho", s.get(out, "rho") - 0.5 * d_rho)
        out = s.set(out, "rhou", s.get(out, "rhou") - 0.5 * d_rhou)
        out = s.set(out, "rhoe", s.get(out, "rhoe") - 0.5 * d_rhoe)

        # passive scalars: contact-wave upwinding
        extra = [n for n in s.names() if n not in ("rho", "rhou", "rhoe")]
        for name in extra:
            phiM = s.get(qM, name) / rhoM[..., None] \
                if s.get(qM, name).ndim == rhoM.ndim + 1 \
                else s.get(qM, name) / rhoM
            phiP = s.get(qP, name) / rhoP[..., None] \
                if s.get(qP, name).ndim == rhoP.ndim + 1 \
                else s.get(qP, name) / rhoP
            if phiM.ndim == rhoM.ndim:
                diss = l2 * (phiP * rhoP - phiM * rhoM
                             - (phiM + phiP) / 2 * drho) \
                    + (phiM + phiP) / 2 * d_rho
                out = s.set(out, name, s.get(out, name) - 0.5 * diss)
            else:
                diss = (l2[..., None]
                        * (phiP * rhoP[..., None] - phiM * rhoM[..., None]
                           - (phiM + phiP) / 2 * drho[..., None])
                        + (phiM + phiP) / 2 * d_rho[..., None])
                out = s.set(out, name, s.get(out, name) - 0.5 * diss)
        return out


class HLLCNumericalFlux(NumericalFluxFirstOrder):
    """HLLC with Einfeldt wavespeed estimates (reference :373)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
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
