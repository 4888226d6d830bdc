"""Held-Suarez dry GCM — the north-star benchmark configuration.

Scope of reference ``experiments/AtmosGCM/heldsuarez.jl``: forcing
coefficients (:117-155), Energy/Momentum sources (:157-172), initial
condition ``init_heldsuarez!`` (:31-90), configuration (:190-217).

The forcing relaxes temperature to the Held-Suarez (1994) equilibrium
profile and Rayleigh-damps low-level winds; everything is a pointwise
vectorized source term.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Coriolis,
                                      Gravity, HydrostaticState)
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.sources import Source
from climatemachine_tpu.common.orientations import (SphericalOrientation,
                                                    latitude, longitude,
                                                    sphr_to_cart_vec)
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_cubed_sphere_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH, PlanetParameterSet
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile)


class HeldSuarezForcing(Source):
    """HS94 relaxation (reference heldsuarez.jl:112-172)."""

    T_ref = 255.0
    dT_y = 60.0
    dtheta_z = 10.0
    T_equator = 315.0
    T_min = 200.0
    sigma_b = 7.0 / 10.0

    def contributions(self, model, q, gf, aux, t):
        ps = model.param_set
        day = ps.day
        k_a, k_f, k_s = 1 / (40 * day), 1 / day, 1 / (4 * day)

        rho = model.prog(q, "rho")
        rhou = model.prog(q, "rhou")
        coords = model.aux_get(aux, "coord")
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        T, p, _ = model.recover_thermo(q, aux)

        phi = latitude(coords)
        sigma = p / ps.MSLP
        exner_p = sigma ** (ps.R_d / ps.cp_d)
        height_factor = jnp.maximum(
            0.0, (sigma - self.sigma_b) / (1 - self.sigma_b))
        cosphi2 = jnp.cos(phi) ** 2
        T_equil = (self.T_equator - self.dT_y * jnp.sin(phi) ** 2
                   - self.dtheta_z * jnp.log(sigma) * cosphi2) * exner_p
        T_equil = jnp.maximum(self.T_min, T_equil)
        k_T = k_a + (k_s - k_a) * height_factor * cosphi2 ** 2
        k_v = k_f * height_factor

        # tangential projection of momentum (reference :171)
        k = grad_Phi / ps.grav
        rhou_tan = rhou - jnp.sum(rhou * k, axis=-1, keepdims=True) * k
        return {
            "rhou": -k_v[..., None] * rhou_tan,
            "rhoe": -k_T * rho * ps.cv_d * (T - T_equil),
        }

    def contributions_vm(self, model, ctx, t):
        """Var-major form (dg/fast_rhs.py): same formulas on [E, Np] /
        [E, 3, Np] arrays with the vector axis at position 1; T and p are
        the RHS's once-per-evaluation thermo fields."""
        ps = model.param_set
        day = ps.day
        k_a, k_f, k_s = 1 / (40 * day), 1 / day, 1 / (4 * day)
        rho, rhou, T, p = ctx.rho, ctx.rhou, ctx.T, ctx.p
        coords = ctx.coords                             # [E, 3, Np]
        r = jnp.sqrt(jnp.sum(coords * coords, axis=1))
        phi = jnp.arcsin(jnp.clip(coords[:, 2] / r, -1.0, 1.0))
        sigma = p / ps.MSLP
        exner_p = sigma ** (ps.R_d / ps.cp_d)
        height_factor = jnp.maximum(
            0.0, (sigma - self.sigma_b) / (1 - self.sigma_b))
        cosphi2 = jnp.cos(phi) ** 2
        T_equil = (self.T_equator - self.dT_y * jnp.sin(phi) ** 2
                   - self.dtheta_z * jnp.log(sigma) * cosphi2) * exner_p
        T_equil = jnp.maximum(self.T_min, T_equil)
        k_T = k_a + (k_s - k_a) * height_factor * cosphi2 ** 2
        k_v = k_f * height_factor
        k = ctx.grad_Phi / ps.grav
        rhou_tan = rhou - jnp.sum(rhou * k, axis=1, keepdims=True) * k
        return {
            "rhou": -k_v[:, None, :] * rhou_tan,
            "rhoe": -k_T * rho * ps.cv_d * (T - T_equil),
        }


def held_suarez_init(model, coords, aux, t):
    """Reference-state start + deterministic velocity perturbation
    (reference init_heldsuarez!, heldsuarez.jl:31-90)."""
    ps = model.param_set
    a = ps.planet_radius
    z_t, V_p = 15e3, 10.0
    lam_c, phi_c = np.pi / 9, 2 * np.pi / 9
    d_0 = a / 6

    phi, lam = latitude(coords), longitude(coords)
    z = model.aux_get(aux, "orientation.Phi") / ps.grav

    zr = jnp.clip(z / z_t, 0.0, 1.0)
    F_z = jnp.where(z > z_t, 0.0, 1 - 3 * zr ** 2 + 2 * zr ** 3)
    cosarg = jnp.clip(jnp.sin(phi) * np.sin(phi_c)
                      + jnp.cos(phi) * np.cos(phi_c) * jnp.cos(lam - lam_c),
                      -1.0, 1.0)
    d = a * jnp.arccos(cosarg)
    c3 = jnp.cos(np.pi * d / 2 / d_0) ** 3
    s1 = jnp.sin(np.pi * d / 2 / d_0)
    sin_d_a = jnp.sin(d / a)
    safe = jnp.where(jnp.abs(sin_d_a) < 1e-12, 1.0, sin_d_a)
    coeff = 16 * V_p / (3 * np.sqrt(3.0)) * F_z * c3 * s1 / safe
    u_p = -coeff * (-np.sin(phi_c) * jnp.cos(phi)
                    + np.cos(phi_c) * jnp.sin(phi) * jnp.cos(lam - lam_c))
    v_p = coeff * np.cos(phi_c) * jnp.sin(lam - lam_c)
    active = (d > 0) & (d < d_0) & (jnp.abs(sin_d_a) > 1e-12)
    u_p = jnp.where(active, u_p, 0.0)
    v_p = jnp.where(active, v_p, 0.0)

    u_sphere = jnp.stack([u_p, v_p, jnp.zeros_like(u_p)], axis=-1)
    u_cart = sphr_to_cart_vec(coords, u_sphere)

    rho = model.aux_get(aux, "ref_state.rho")
    rhoe_ref = model.aux_get(aux, "ref_state.rhoe")
    e_kin = 0.5 * jnp.sum(u_cart * u_cart, axis=-1)

    q = model.prog_spec.pack({"rho": rho, "rhoe": rhoe_ref + rho * e_kin},
                             batch_shape=rho.shape)
    return model.prog_spec.set(q, "rhou", rho[..., None] * u_cart)


@dataclass
class HeldSuarezConfig:
    model: AtmosModel
    grid: object


def held_suarez_config(n_horz: int = 8, n_vert: int = 4, poly_order: int = 5,
                       domain_height: float = 30e3, dtype=None,
                       param_set: PlanetParameterSet = EARTH,
                       hyperdiffusion_tau: float = 8 * 3600.0):
    """Build (model, grid) for Held-Suarez (reference config_heldsuarez,
    heldsuarez.jl:190-217: DecayingTemperatureProfile(290,220,8e3) reference
    state, Gravity+Coriolis+HS sources; default script n_horz=8, n_vert=4,
    poly 5 at :222-224)."""
    a = param_set.planet_radius
    vert_range = a + np.linspace(0.0, domain_height, n_vert + 1)
    topo = stacked_cubed_sphere_topology(n_horz, vert_range)
    grid = make_grid(topo, poly_order, dtype=dtype)

    from climatemachine_tpu.atmos.hyperdiffusion import DryBiharmonic
    physics = AtmosPhysics(
        param_set=param_set,
        orientation=SphericalOrientation(),
        ref_state=HydrostaticState(
            DecayingTemperatureProfile(290.0, 220.0, 8e3)),
        # reference config_heldsuarez: DryBiharmonic(8h) horizontal
        # hyperdiffusion (heldsuarez.jl:211); the zero-viscosity
        # ConstantKinematicViscosity(0) is intentionally omitted — it only
        # pays gradient-machinery cost without physics
        hyperdiffusion=(DryBiharmonic(hyperdiffusion_tau)
                        if hyperdiffusion_tau else None))
    problem = AtmosProblem(init_state=held_suarez_init,
                           boundary_conditions=(AtmosBC(), AtmosBC()))
    model = AtmosModel(physics, problem,
                       sources=(Gravity(), Coriolis(), HeldSuarezForcing()))
    return HeldSuarezConfig(model=model, grid=grid)


class HeldSuarezStepFilter:
    """Every-step exponential filter on perturbations about the
    reference state — part of the reference's Held-Suarez configuration
    (heldsuarez.jl:261-273: ``ExponentialFilter(grid, 0, 20)`` applied
    through ``AtmosFilterPerturbations`` by an every-step callback).
    Without it the aliasing instability of the unfiltered DG advection
    terminates coarse runs within ~1500 simulated seconds (measured) and
    eventually any resolution.

    ``apply(q, aux)`` is the node-major form; ``apply_vm(qv, auxv)``
    rides the var-major fast path (one [Np, Np] nodal-operator matmul),
    suitable as a ``solver.post_step`` hook inside the jitted step.
    """

    def __init__(self, grid, model, order: int = 20):
        from climatemachine_tpu.mesh.filters import (
            AtmosFilterPerturbations, ExponentialFilter)
        self.grid = grid
        self.model = model
        self.filt = ExponentialFilter(grid, 0, order)
        self.target = AtmosFilterPerturbations(model)
        self.i_rho = model.prog_spec.index("rho").start
        self.i_rhoe = model.prog_spec.index("rhoe").start
        self.i_rho_ref = model.aux_spec.index("ref_state.rho").start
        self.i_rhoe_ref = model.aux_spec.index("ref_state.rhoe").start

    def apply(self, q, aux):
        from climatemachine_tpu.mesh.filters import apply_filter
        return apply_filter(self.grid, q, self.filt, target=self.target,
                            aux=aux)

    def apply_vm(self, qv, auxv):
        import jax.numpy as jnp
        ref = jnp.zeros_like(qv)
        ref = ref.at[:, self.i_rho, :].set(auxv[:, self.i_rho_ref, :])
        ref = ref.at[:, self.i_rhoe, :].set(auxv[:, self.i_rhoe_ref, :])
        return self.filt.apply_vm(qv - ref) + ref
