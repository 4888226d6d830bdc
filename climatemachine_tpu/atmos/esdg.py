"""Entropy-stable dry atmosphere balance law.

Scope of reference ``test/Numerics/ESDGMethods/DryAtmos/DryAtmos.jl``:
entropy variables (:339 state_to_entropy_variables!, :375
entropy_variables_to_state!, :401 state_to_entropy), the
Chandrashekar-style entropy-conservative two-point flux with gravity
(:411 numerical_volume_conservative_flux_first_order!, :458
numerical_volume_fluctuation_flux_first_order! — Waruszewski et al.
formulation with logarithmic means), and the supporting
pressure/totalenergy/soundspeed helpers (:245-:276).

Euler equations with geopotential Φ (aux):
    ∂t ρ  + ∇·(ρu)            = 0
    ∂t ρu + ∇·(ρu⊗u + p I)    = −ρ∇Φ   (via the fluctuation flux)
    ∂t ρe + ∇·(u (ρe + p))    = 0
p = (γ−1)(ρe − |ρu|²/2ρ − ρΦ).  Entropy η = −ρ s/(γ−1), s = log(p/ρ^γ).

All hooks are vectorized over nodes; the two-point flux broadcasts its
two argument groups (the ESDG volume term passes [.., i, 1, :] vs
[.., 1, l, :]).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import (Auxiliary, BalanceLaw, Entropy,
                                             Prognostic)
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.utils.variables import VarSpec


def ave(a, b):
    return 0.5 * (a + b)


def logave(a, b):
    """Numerically stable logarithmic mean (a−b)/(log a − log b)
    (reference NumericalFluxes.jl:593, Ismail & Roe Appendix B)."""
    zeta = a / b
    f = (zeta - 1.0) / (zeta + 1.0)
    u = f * f
    poly = 1.0 + u * (1.0 / 3 + u * (1.0 / 5 + u * (1.0 / 7 + u / 9)))
    eps = jnp.finfo(u.dtype).eps
    big = jnp.log(zeta) / (2.0 * jnp.where(jnp.abs(f) < eps, 1.0, f))
    F = jnp.where(u < 1e-4, poly, big)
    return (a + b) / (2.0 * F)


class DryAtmosESDGModel(BalanceLaw):
    """Dry Euler + gravity with entropy-conservative flux differencing.

    ``init_state(model, coords, aux, t)`` supplies the IC; ``geopotential
    (coords) -> Phi`` defaults to g·z (flat); pass e.g.
    ``lambda c: g*(|c|−R)`` for spherical shells.  ``sources`` are extra
    nodal source callables ``(model, q, aux, t) -> dq`` (e.g. Coriolis,
    Held-Suarez); gravity itself enters through the fluctuation flux,
    NOT a source (reference fluctuation_gravity path).
    """

    def __init__(self, param_set=EARTH, init_state: Optional[Callable] = None,
                 geopotential: Optional[Callable] = None,
                 sources: Sequence = (), boundary_tags: Sequence[int] = (1, 2)):
        self.param_set = param_set
        self.init_state = init_state
        self.geopotential = geopotential
        self.sources = tuple(sources)
        self.boundary_tags = tuple(boundary_tags)
        self.prog_spec = self.vars_state(Prognostic())
        self.aux_spec = self.vars_state(Auxiliary())

    # --- state schema -------------------------------------------------------
    def vars_state(self, state_type) -> VarSpec:
        if isinstance(state_type, Prognostic):
            return VarSpec(rho=1, rhou=3, rhoe=1)
        if isinstance(state_type, Auxiliary):
            return VarSpec(coord=3, Phi=1)
        if isinstance(state_type, Entropy):
            # β plus the geopotential slot (reference vars_state(...,
            # ::Entropy) :320)
            return VarSpec(rho=1, rhou=3, rhoe=1, Phi=1)
        return VarSpec()

    @property
    def gamma(self):
        ps = self.param_set
        return ps.cp_d / ps.cv_d

    # --- helpers ------------------------------------------------------------
    def _unpack(self, q):
        s = self.prog_spec
        return s.get(q, "rho"), s.get(q, "rhou"), s.get(q, "rhoe")

    def pressure(self, rho, rhou, rhoe, Phi):
        """(γ−1)(ρe − |ρu|²/2ρ − ρΦ) (reference :245)."""
        return (self.gamma - 1.0) * (
            rhoe - 0.5 * jnp.sum(rhou * rhou, -1) / rho - rho * Phi)

    def soundspeed(self, rho, p):
        return jnp.sqrt(self.gamma * p / rho)

    # --- standard hooks -----------------------------------------------------
    def nodal_init_state_auxiliary(self, geom, aux):
        coords = geom["coords"]
        aux = self.aux_spec.set(aux, "coord", coords)
        if self.geopotential is not None:
            Phi = self.geopotential(coords)
        else:
            Phi = self.param_set.grav * coords[..., 2]
        return self.aux_spec.set(aux, "Phi", Phi)

    def init_state_prognostic(self, coords, aux, t):
        return self.init_state(self, coords, aux, t)

    def flux_first_order(self, q, aux, t):
        rho, rhou, rhoe = self._unpack(q)
        Phi = self.aux_spec.get(aux, "Phi")
        p = self.pressure(rho, rhou, rhoe, Phi)
        u = rhou / rho[..., None]
        F_rho = rhou                                           # [..., 3]
        F_rhou = rhou[..., :, None] * u[..., None, :] \
            + p[..., None, None] * jnp.eye(3, dtype=q.dtype)
        F_rhoe = u * (rhoe + p)[..., None]
        return jnp.concatenate([F_rho[..., :, None], F_rhou,
                                F_rhoe[..., :, None]], axis=-1)

    def wavespeed(self, nrm, q, aux, t):
        rho, rhou, rhoe = self._unpack(q)
        Phi = self.aux_spec.get(aux, "Phi")
        p = self.pressure(rho, rhou, rhoe, Phi)
        un = jnp.einsum("...c,...c->...", nrm, rhou) / rho
        return jnp.abs(un) + self.soundspeed(rho, p)

    def source(self, q, gf, aux, t):
        out = 0.0
        for src in self.sources:
            out = out + src(self, q, aux, t)
        return out if not isinstance(out, float) else jnp.zeros_like(q)

    # --- entropy structure --------------------------------------------------
    def state_to_entropy_variables(self, q, aux):
        """β = ∂η/∂q (+ Φ-slot 2ρb) (reference :339)."""
        gm = self.gamma
        rho, rhou, rhoe = self._unpack(q)
        Phi = self.aux_spec.get(aux, "Phi")
        p = self.pressure(rho, rhou, rhoe, Phi)
        s = jnp.log(p / rho ** gm)
        b = rho / (2.0 * p)
        u = rhou / rho[..., None]
        beta_rho = (gm - s) / (gm - 1.0) - (
            jnp.sum(u * u, -1) - 2.0 * Phi) * b
        spec = self.vars_state(Entropy())
        out = jnp.zeros(q.shape[:-1] + (spec.num,), dtype=q.dtype)
        out = spec.set(out, "rho", beta_rho)
        out = spec.set(out, "rhou", 2.0 * b[..., None] * u)
        out = spec.set(out, "rhoe", -2.0 * b)
        out = spec.set(out, "Phi", 2.0 * rho * b)
        return out

    def entropy_variables_to_state(self, beta):
        """Inverse map (reference :375); returns (q, Phi)."""
        gm = self.gamma
        spec = self.vars_state(Entropy())
        b = -spec.get(beta, "rhoe") / 2.0
        rho = spec.get(beta, "Phi") / (2.0 * b)
        rhou = rho[..., None] * spec.get(beta, "rhou") / (2.0 * b[..., None])
        p = rho / (2.0 * b)
        s = jnp.log(p / rho ** gm)
        Phi = jnp.sum(rhou * rhou, -1) / (2.0 * rho ** 2) - (
            (gm - s) / (gm - 1.0) - spec.get(beta, "rho")) / (2.0 * b)
        rhoe = p / (gm - 1.0) + jnp.sum(rhou * rhou, -1) / (2.0 * rho) \
            + rho * Phi
        q = self.prog_spec.pack(
            {"rho": rho, "rhou": rhou, "rhoe": rhoe},
            batch_shape=rho.shape)
        return q, Phi

    def state_from_entropy_variables_fixed_phi(self, beta5, Phi):
        """State q(β) at FIXED geopotential (β without the Φ slot).
        Used by the entropy-stable matrix dissipation: ∂q/∂β of this map
        is symmetric positive definite, so −(λ/2)(∂q/∂β)Δβ dissipates
        entropy (Barth / Chan matrix-dissipation construction)."""
        gm = self.gamma
        b = -beta5[..., 4] / 2.0
        u = beta5[..., 1:4] / (2.0 * b[..., None])
        s = gm - (gm - 1.0) * (
            beta5[..., 0] + (jnp.sum(u * u, -1) - 2.0 * Phi) * b)
        logp = (s + gm * jnp.log(2.0 * b)) / (1.0 - gm)
        p = jnp.exp(logp)
        rho = 2.0 * b * p
        rhou = rho[..., None] * u
        rhoe = p / (gm - 1.0) + 0.5 * rho * jnp.sum(u * u, -1) + rho * Phi
        return self.prog_spec.pack(
            {"rho": rho, "rhou": rhou, "rhoe": rhoe},
            batch_shape=rho.shape)

    def state_to_entropy(self, q, aux):
        """η = −ρ s/(γ−1) (reference :401)."""
        gm = self.gamma
        rho, rhou, rhoe = self._unpack(q)
        Phi = self.aux_spec.get(aux, "Phi")
        p = self.pressure(rho, rhou, rhoe, Phi)
        return -rho * jnp.log(p / rho ** gm) / (gm - 1.0)

    # --- two-point entropy-conservative flux --------------------------------
    def numerical_volume_flux_first_order(self, q1, aux1, q2, aux2):
        """Symmetric, consistent EC flux H [..., 3, ns] including the
        gravity fluctuation term (reference :411 + :458).

        NOTE the fluctuation term α(Φ1−Φ2) is NOT symmetric — it encodes
        the nonconservative ρ∇Φ product and satisfies the generalized
        Tadmor condition instead.
        """
        gm = self.gamma
        s = self.prog_spec
        rho1, rhou1, rhoe1 = self._unpack(q1)
        rho2, rhou2, rhoe2 = self._unpack(q2)
        Phi1 = self.aux_spec.get(aux1, "Phi")
        Phi2 = self.aux_spec.get(aux2, "Phi")
        u1 = rhou1 / rho1[..., None]
        u2 = rhou2 / rho2[..., None]
        p1 = self.pressure(rho1, rhou1, rhoe1, Phi1)
        p2 = self.pressure(rho2, rhou2, rhoe2, Phi2)
        b1 = rho1 / (2.0 * p1)
        b2 = rho2 / (2.0 * p2)

        rho_avg = ave(rho1, rho2)
        u_avg = ave(u1, u2)
        b_avg = ave(b1, b2)
        Phi_avg = ave(Phi1, Phi2)
        usq_avg = ave(jnp.sum(u1 * u1, -1), jnp.sum(u2 * u2, -1))
        rho_log = logave(rho1, rho2)
        b_log = logave(b1, b2)

        F_rho = u_avg * rho_log[..., None]                       # [..., 3]
        # Fρu[c, d] = u_avg[c] Fρ[d] + (ρ_avg/2b_avg) δ_cd
        F_rhou = u_avg[..., :, None] * F_rho[..., None, :] + \
            (rho_avg / (2.0 * b_avg))[..., None, None] * \
            jnp.eye(3, dtype=q1.dtype)
        F_rhoe = (1.0 / (2.0 * (gm - 1.0) * b_log) - 0.5 * usq_avg
                  + Phi_avg)[..., None] * F_rho + \
            jnp.einsum("...cd,...d->...c", F_rhou, u_avg)

        # gravity fluctuation: D.ρu −= α (Φ1 − Φ2) I, α = b_avg ρ_log / 2b1
        alpha = b_avg * rho_log / (2.0 * b1)
        F_rhou = F_rhou - (alpha * (Phi1 - Phi2))[..., None, None] * \
            jnp.eye(3, dtype=q1.dtype)

        ns = s.num
        out_shape = jnp.broadcast_shapes(q1.shape[:-1], q2.shape[:-1])
        H = jnp.zeros(out_shape + (3, ns), dtype=q1.dtype)
        sl_rho = s.index("rho")
        sl_rhou = s.index("rhou")
        sl_rhoe = s.index("rhoe")
        H = H.at[..., :, sl_rho.start].set(F_rho)
        H = H.at[..., :, sl_rhou].set(F_rhou)
        H = H.at[..., :, sl_rhoe.start].set(F_rhoe)
        return H

    # --- boundary: impenetrable free-slip wall ------------------------------
    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        """Mirror the normal momentum (reference DryAtmos boundary_state!
        :79)."""
        s = self.prog_spec
        rhou = s.get(q_minus, "rhou")
        un = jnp.einsum("...c,...c->...", nrm, rhou)
        rhou_ref = rhou - 2.0 * un[..., None] * nrm
        qP = s.set(q_minus, "rhou", rhou_ref)
        return qP, aux_minus
