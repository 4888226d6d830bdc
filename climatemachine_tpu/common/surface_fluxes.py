"""Monin-Obukhov surface fluxes.

Scope of reference ``src/Common/SurfaceFluxes/`` (surface_conditions
solving for the Obukhov length with NonlinearSolvers;
UniversalFunctions.jl: Businger :105, Gryanik :242, Grachev :325; Nishizawa
& Kitamura 2018 formulation).

TPU-first: the Obukhov-length solve is a fixed-iteration self-consistent
update (u*, θ*, L), fully vectorized over surface points — no per-point
nonlinear solver objects.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

VON_KARMAN = 0.4


# --- universal functions ----------------------------------------------------

@dataclass(frozen=True)
class Businger:
    """(reference UniversalFunctions.jl:105) Businger-Dyer."""
    a_m: float = 4.7
    a_h: float = 4.7
    Pr_0: float = 0.74

    def psi_m(self, zeta):
        x = (1.0 - 15.0 * jnp.minimum(zeta, 0.0)) ** 0.25
        unst = (2 * jnp.log((1 + x) / 2) + jnp.log((1 + x * x) / 2)
                - 2 * jnp.arctan(x) + jnp.pi / 2)
        stab = -self.a_m * zeta
        return jnp.where(zeta < 0, unst, stab)

    def psi_h(self, zeta):
        y = jnp.sqrt(1.0 - 9.0 * jnp.minimum(zeta, 0.0))
        unst = 2 * jnp.log((1 + y) / 2)
        stab = -self.a_h * zeta / self.Pr_0
        return jnp.where(zeta < 0, unst, stab)


@dataclass(frozen=True)
class Gryanik(Businger):
    """(reference :242) stable-regime refit (Gryanik et al. 2020)."""
    a_m: float = 5.0
    b_m: float = 0.3
    a_h: float = 5.0
    b_h: float = 0.4
    Pr_0: float = 0.98

    def psi_m(self, zeta):
        unst = Businger().psi_m(jnp.minimum(zeta, 0.0))
        zp = jnp.maximum(zeta, 0.0)
        stab = -3 * self.a_m / self.b_m * \
            ((1 + self.b_m * zp) ** (1.0 / 3.0) - 1)
        return jnp.where(zeta < 0, unst, stab)

    def psi_h(self, zeta):
        unst = Businger().psi_h(jnp.minimum(zeta, 0.0))
        zp = jnp.maximum(zeta, 0.0)
        stab = -self.Pr_0 * self.a_h / self.b_h * \
            jnp.log1p(self.b_h * zp)
        return jnp.where(zeta < 0, unst, stab)


@dataclass(frozen=True)
class Grachev(Businger):
    """(reference :325) SHEBA stable functions (Grachev et al. 2007)."""
    a_m: float = 5.0
    b_m: float = 0.3

    def psi_m(self, zeta):
        unst = Businger().psi_m(jnp.minimum(zeta, 0.0))
        zp = jnp.maximum(zeta, 0.0)
        x = (1 + zp) ** (1.0 / 3.0)
        B = (1.0 / self.b_m) ** (1.0 / 3.0)
        stab = (-3 * self.a_m / self.b_m * (x - 1)
                + self.a_m * B / (2 * self.b_m)
                * (2 * jnp.log((x + B) / (1 + B))
                   - jnp.log((x * x - x * B + B * B)
                             / (1 - B + B * B))
                   + 2 * jnp.sqrt(3.0)
                   * (jnp.arctan((2 * x - B) / (jnp.sqrt(3.0) * B))
                      - jnp.arctan((2 - B) / (jnp.sqrt(3.0) * B)))))
        return jnp.where(zeta < 0, unst, stab)

    def psi_h(self, zeta):
        unst = Businger().psi_h(jnp.minimum(zeta, 0.0))
        zp = jnp.maximum(zeta, 0.0)
        stab = -2.5 * jnp.log1p(3 * zp + zp * zp)  # a_h=5, b_h=5, c_h=3
        return jnp.where(zeta < 0, unst, stab)


class SurfaceFluxConditions(NamedTuple):
    """(reference SurfaceFluxConditions struct)"""
    L_MO: jnp.ndarray
    u_star: jnp.ndarray
    theta_star: jnp.ndarray
    shf: jnp.ndarray          # kinematic heat flux w'θ' = -u*θ*
    C_drag: jnp.ndarray
    C_heat: jnp.ndarray


def surface_conditions(param_set, u_in, theta_in, theta_sfc, z_in,
                       z0_m, z0_h=None, uf=Businger(), n_iter: int = 10
                       ) -> SurfaceFluxConditions:
    """Monin-Obukhov similarity solve (reference surface_conditions).

    u_in: wind speed at z_in; theta_in/theta_sfc: potential temperature at
    z_in and the surface.  All inputs broadcastable arrays.
    """
    k = VON_KARMAN
    g = param_set.grav
    z0_h = z0_m if z0_h is None else z0_h
    u = jnp.maximum(u_in, 0.01)
    dtheta = theta_in - theta_sfc

    # neutral start
    log_m = jnp.log(z_in / z0_m)
    log_h = jnp.log(z_in / z0_h)
    u_star = k * u / log_m
    th_star = k * dtheta / log_h

    for _ in range(n_iter):
        L = (u_star ** 2 * theta_in
             / (k * g * jnp.where(jnp.abs(th_star) < 1e-10,
                                  jnp.sign(th_star) * 1e-10 + 1e-10,
                                  th_star)))
        zeta = jnp.clip(z_in / L, -10.0, 10.0)
        zeta0m = jnp.clip(z0_m / L, -10.0, 10.0)
        zeta0h = jnp.clip(z0_h / L, -10.0, 10.0)
        denom_m = log_m - uf.psi_m(zeta) + uf.psi_m(zeta0m)
        denom_h = log_h - uf.psi_h(zeta) + uf.psi_h(zeta0h)
        u_star = k * u / jnp.maximum(denom_m, 1e-3)
        th_star = k * dtheta / jnp.maximum(denom_h, 1e-3)

    L = (u_star ** 2 * theta_in
         / (k * g * jnp.where(jnp.abs(th_star) < 1e-10, 1e-10, th_star)))
    C_d = (u_star / u) ** 2
    C_h = u_star * th_star / jnp.where(jnp.abs(u * dtheta) < 1e-14,
                                       1e-14, u * dtheta)
    return SurfaceFluxConditions(L_MO=L, u_star=u_star, theta_star=th_star,
                                 shf=-u_star * th_star, C_drag=C_d,
                                 C_heat=C_h)


def monin_obukhov_length(param_set, u_star, theta, flux_wtheta):
    """(reference monin_obukhov_length)"""
    k = VON_KARMAN
    return -u_star ** 3 * theta / (k * param_set.grav
                                   * jnp.where(jnp.abs(flux_wtheta) < 1e-14,
                                               1e-14, flux_wtheta))
