"""Gravity / vertical-direction geometry abstraction.

Scope of reference ``src/Common/Orientations/Orientations.jl``
(NoOrientation :138, SphericalOrientation :161, FlatOrientation :246;
helpers vertical_unit_vector, altitude, latitude, longitude,
projection_tangential).

An orientation fills the geopotential Φ and its gradient into aux at grid
build time; all helpers are pure functions of (coords or aux slices),
vectorized over nodes.
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.physics.parameters import PlanetParameterSet
from climatemachine_tpu.utils.variables import VarSpec


class Orientation:
    """Base: aux fields Φ (scalar) and ∇Φ (3-vector)."""

    def vars_aux(self) -> VarSpec:
        return VarSpec(Phi=1, grad_Phi=3)

    def geopotential(self, ps: PlanetParameterSet, coords):
        raise NotImplementedError

    def grad_geopotential(self, ps: PlanetParameterSet, coords):
        raise NotImplementedError

    # --- helpers over (Phi, grad_Phi) slices -------------------------------
    @staticmethod
    def altitude(ps: PlanetParameterSet, Phi):
        return Phi / ps.grav

    @staticmethod
    def vertical_unit_vector(ps: PlanetParameterSet, grad_Phi):
        return grad_Phi / ps.grav

    @staticmethod
    def projection_tangential(ps: PlanetParameterSet, grad_Phi, v):
        k = grad_Phi / ps.grav
        vk = jnp.sum(v * k, axis=-1, keepdims=True)
        return v - vk * k

    @staticmethod
    def projection_normal(ps: PlanetParameterSet, grad_Phi, v):
        k = grad_Phi / ps.grav
        vk = jnp.sum(v * k, axis=-1, keepdims=True)
        return vk * k


class NoOrientation(Orientation):
    """Φ = 0: no gravity geometry (reference :138); used by gravity-free
    test configurations and MMS problems."""

    def geopotential(self, ps, coords):
        return jnp.zeros_like(coords[..., -1])

    def grad_geopotential(self, ps, coords):
        return jnp.zeros_like(coords)

    @staticmethod
    def altitude(ps, Phi):
        raise ValueError("NoOrientation has no altitude")


class FlatOrientation(Orientation):
    """Φ = g z with z the last coordinate (reference :246)."""

    def geopotential(self, ps, coords):
        return ps.grav * coords[..., -1]

    def grad_geopotential(self, ps, coords):
        g = jnp.zeros_like(coords)
        return g.at[..., -1].set(ps.grav)


class SphericalOrientation(Orientation):
    """Φ = g (|x| - planet_radius) (reference :161)."""

    def geopotential(self, ps, coords):
        r = jnp.linalg.norm(coords, axis=-1)
        return ps.grav * (r - ps.planet_radius)

    def grad_geopotential(self, ps, coords):
        r = jnp.linalg.norm(coords, axis=-1, keepdims=True)
        return ps.grav * coords / r


def latitude(coords):
    """Geocentric latitude (reference Orientations.jl `latitude`).
    The ratio is clipped: pole nodes can give |z|/r = 1 + O(eps)."""
    r = jnp.linalg.norm(coords, axis=-1)
    return jnp.arcsin(jnp.clip(coords[..., 2] / r, -1.0, 1.0))


def longitude(coords):
    return jnp.arctan2(coords[..., 1], coords[..., 0])


def sphr_to_cart_vec(coords, v_sphere):
    """(zonal, meridional, radial) -> Cartesian vector at ``coords``
    (reference Orientations.jl ``sphr_to_cart_vec``)."""
    lat, lon = latitude(coords), longitude(coords)
    sinl, cosl = jnp.sin(lat), jnp.cos(lat)
    sinn, cosn = jnp.sin(lon), jnp.cos(lon)
    lam_hat = jnp.stack([-sinn, cosn, jnp.zeros_like(sinn)], axis=-1)
    phi_hat = jnp.stack([-sinl * cosn, -sinl * sinn, cosl], axis=-1)
    r_hat = jnp.stack([cosl * cosn, cosl * sinn, sinl], axis=-1)
    return (v_sphere[..., 0:1] * lam_hat + v_sphere[..., 1:2] * phi_hat
            + v_sphere[..., 2:3] * r_hat)


def cart_to_sphr_vec(coords, v_cart):
    """Cartesian -> (zonal, meridional, radial) components at ``coords``."""
    lat, lon = latitude(coords), longitude(coords)
    sinl, cosl = jnp.sin(lat), jnp.cos(lat)
    sinn, cosn = jnp.sin(lon), jnp.cos(lon)
    lam_hat = jnp.stack([-sinn, cosn, jnp.zeros_like(sinn)], axis=-1)
    phi_hat = jnp.stack([-sinl * cosn, -sinl * sinn, cosl], axis=-1)
    r_hat = jnp.stack([cosl * cosn, cosl * sinn, sinl], axis=-1)
    return jnp.stack([jnp.sum(v_cart * lam_hat, axis=-1),
                      jnp.sum(v_cart * phi_hat, axis=-1),
                      jnp.sum(v_cart * r_hat, axis=-1)], axis=-1)
