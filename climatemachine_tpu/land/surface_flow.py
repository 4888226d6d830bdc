"""Overland (surface) flow: 2-D kinematic-wave water height.

Scope of reference ``src/Land/Model/SurfaceFlow.jl`` (OverlandFlowModel
:62, calculate_velocity :87 — Manning's relation v = −∇s h^{2/3} /
(n √|∇s|), VolumeAdvection flux :123, Precip source :223).

Standalone 2-D balance law: run it on a (periodic or bounded) 2-D brick
grid.  ∂h/∂t + ∇·(h v(h)) = P(x, y, t) with the kinematic celerity
(5/3)|v| bounding the wavespeed for Rusanov fluxes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.utils.variables import VarSpec


class OverlandFlowModel(BalanceLaw):
    """Kinematic-wave overland flow (reference SurfaceFlow.jl:62).

    ``slope(x, y) -> (Sx, Sy)`` topographic slope components;
    ``mannings(x, y)`` Manning coefficient [s/m^{1/3}];
    ``precip(x, y, t)`` source rate [m/s]; ``initial_height(coords, t)``.
    """

    def __init__(self, slope: Callable, mannings: Callable = None,
                 precip: Callable = None, initial_height: Callable = None,
                 ncoord: int = 2):
        self.slope = slope
        self.mannings = mannings or (lambda x, y: 0.03)
        self.precip = precip
        self.initial_height = initial_height or \
            (lambda c, t: jnp.zeros(c.shape[:-1]))
        self.ncoord = ncoord
        self.prog_spec = VarSpec(height=1)
        self.aux_spec = VarSpec(coord=ncoord)

    def vars_state(self, state_type) -> VarSpec:
        if isinstance(state_type, st.Prognostic):
            return self.prog_spec
        if isinstance(state_type, st.Auxiliary):
            return self.aux_spec
        return VarSpec()

    def init_state_prognostic(self, coords, aux, t):
        return self.initial_height(coords, t)[..., None]

    def velocity(self, h, coords):
        """Manning kinematic velocity (reference calculate_velocity
        :87): v = −S h^{2/3} / (n √|S|)."""
        x, y = coords[..., 0], coords[..., 1]
        Sx, Sy = self.slope(x, y)
        n = self.mannings(x, y)
        mag = jnp.sqrt(Sx ** 2 + Sy ** 2)
        fac = jnp.maximum(h, 0.0) ** (2.0 / 3.0) / \
            (n * jnp.sqrt(jnp.maximum(mag, 1e-12)))
        v = jnp.stack([-Sx * fac, -Sy * fac], axis=-1)
        if self.ncoord == 3:
            v = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
        return v

    def flux_first_order(self, q, aux, t):
        h = q[..., 0]
        coords = self.aux_spec.get(aux, "coord")
        v = self.velocity(h, coords)
        return (jnp.maximum(h, 0.0)[..., None] * v)[..., :, None]

    def wavespeed(self, nrm, q, aux, t):
        h = q[..., 0]
        coords = self.aux_spec.get(aux, "coord")
        v = self.velocity(h, coords)
        vn = jnp.einsum("...c,...c->...", v[..., :nrm.shape[-1]], nrm)
        # kinematic wave celerity d(hv)/dh = (5/3) v
        return (5.0 / 3.0) * jnp.abs(vn)

    def source(self, q, gf, aux, t):
        if self.precip is None:
            return jnp.zeros_like(q)
        coords = self.aux_spec.get(aux, "coord")
        P = self.precip(coords[..., 0], coords[..., 1], t)
        return P[..., None] * jnp.ones_like(q)

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        """Outflow: zero-height ghost state (water leaves freely)."""
        return jnp.zeros_like(q_minus), aux_minus
