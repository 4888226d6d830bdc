"""Generalized GCM experiment driver — mix-and-match initial/boundary
conditions (reference experiments/AtmosGCM/GCMDriver/: GCMDriver.jl,
gcm_base_states.jl, gcm_perturbations.jl, gcm_moisture_profiles.jl,
gcm_bcs.jl, gcm_sources.jl, baroclinicwave_problem.jl,
heldsuarez_problem.jl).

A GCM problem = base state x perturbation x moisture profile x surface
flux, composed into one ``init_gcm_experiment`` initial condition
(reference GCMDriver.jl:67-120) plus per-problem default sources.
Every option is selectable by name, mirroring the reference CLI flags
``--init-base-state / --init-perturbation / --init-moisture-profile /
--surface-flux / --experiment``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Coriolis,
                                      Gravity, HydrostaticState)
from climatemachine_tpu.atmos.boundaryconditions import (
    AtmosBC, BulkFormulaEnergy, BulkFormulaMoisture)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.moisture import DryModel, EquilMoist
from climatemachine_tpu.common.orientations import (SphericalOrientation,
                                                    latitude, longitude,
                                                    sphr_to_cart_vec)
from climatemachine_tpu.experiments.baroclinic_wave import (
    bcwave_base_state, bcwave_perturbation, moist_low_tropics_q)
from climatemachine_tpu.experiments.held_suarez import HeldSuarezForcing
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_cubed_sphere_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile)


# --- base states (reference gcm_base_states.jl) -----------------------------

class ZeroBaseState:
    """Isothermal 255 K rest atmosphere (reference :27-42)."""

    def __call__(self, model, phi, lam, z, aux):
        ps = model.param_set
        T = 255.0 * jnp.ones_like(z)
        p = ps.MSLP * jnp.exp(-z * ps.grav / (ps.R_d * 255.0))
        return T, p, jnp.zeros_like(z)


class HeldSuarezBaseState:
    """Rest state consistent with the model reference state
    (reference :45-54: T_v/p from aux.ref_state)."""

    def __call__(self, model, phi, lam, z, aux):
        T_v = model.aux_get(aux, "ref_state.T")
        p = model.aux_get(aux, "ref_state.p")
        return T_v, p, jnp.zeros_like(z)


class BCWaveBaseState:
    """Ullrich et al. 2016 deep-atmosphere balanced jet
    (reference :58-124)."""

    def __call__(self, model, phi, lam, z, aux):
        return bcwave_base_state(model.param_set, phi, z)


# --- perturbations (reference gcm_perturbations.jl) -------------------------

class NoPerturbation:
    def __call__(self, model, phi, lam, z):
        zero = jnp.zeros_like(z)
        return zero, zero, 1.0


class DeterministicPerturbation:
    """DCMIP2016 localized velocity dipole (reference :42-93, V_p=10)."""

    def __init__(self, V_p: float = 10.0):
        self.V_p = V_p

    def __call__(self, model, phi, lam, z):
        u_p, v_p = bcwave_perturbation(model.param_set, phi, lam, z,
                                       V_p=self.V_p)
        return u_p, v_p, 1.0


class RandomPerturbation:
    """Multiplicative U(1±1e-3) noise on total energy (reference
    :95-101); fixed seed for reproducibility (reference fix_rng_seed)."""

    def __init__(self, seed: int = 0, amplitude: float = 1e-3):
        self.seed, self.amplitude = seed, amplitude

    def __call__(self, model, phi, lam, z):
        import jax
        zero = jnp.zeros_like(z)
        u = jax.random.uniform(jax.random.PRNGKey(self.seed), z.shape,
                               dtype=z.dtype, minval=-1.0, maxval=1.0)
        return zero, zero, 1.0 + self.amplitude * u


# --- moisture profiles (reference gcm_moisture_profiles.jl) -----------------

class NoMoistureProfile:
    def __call__(self, model, phi, p):
        return jnp.zeros_like(p)


class ZeroMoistureProfile(NoMoistureProfile):
    pass


class MoistLowTropicsMoistureProfile:
    """DCMIP2016 low-tropics humidity (reference :56-88)."""

    def __call__(self, model, phi, p):
        return moist_low_tropics_q(model.param_set, phi, p)


# --- surface fluxes (reference gcm_bcs.jl) ----------------------------------

class VaryingSSTTJ16:
    """Thatcher & Jablonowski 2016 analytic SST + saturation q_sfc
    (reference gcm_bcs.jl:52-94)."""

    def T_sfc(self, model, q, aux, t):
        phi = latitude(model.aux_get(aux, "coord"))
        dphi = 26.0 * np.pi / 180.0
        return 29.0 * jnp.exp(-phi ** 2 / (2 * dphi ** 2)) + 271.0

    def q_sfc(self, model, q, aux, t):
        ps = model.param_set
        T_sfc = self.T_sfc(model, q, aux, t)
        T, p, _ = model.recover_thermo(q, aux)
        eps = 0.622
        return (eps / p * ps.press_triple
                * jnp.exp(-ps.LH_v0 / ps.R_v
                          * (1.0 / T_sfc - 1.0 / ps.T_triple)))


def parse_surface_flux(arg: Optional[str], moist: bool,
                       C_drag: float = EARTH.C_drag):
    """(reference gcm_bcs.jl parse_surface_flux_arg; the bulk-transfer
    coefficient comes from the planet parameter set — reference takes
    C_drag(param_set) = 0.0044, not a hardcoded value)"""
    if arg in (None, "default"):
        return (AtmosBC(), AtmosBC())
    if arg == "bulk":
        if not moist:
            raise ValueError("need a moisture model for surface-flux: bulk")
        sst = VaryingSSTTJ16()
        bottom = AtmosBC(
            energy=BulkFormulaEnergy(C_h=C_drag, T_sfc=sst.T_sfc),
            moisture=BulkFormulaMoisture(C_q=C_drag, q_tot_sfc=sst.q_sfc))
        return (bottom, AtmosBC())
    raise ValueError(f"unknown surface flux: {arg}")


# --- composed initial condition (reference GCMDriver.jl:67-120) -------------

def make_gcm_init(base_state, perturbation, moisture_profile):
    def init(model, coords, aux, t):
        ps = model.param_set
        phi, lam = latitude(coords), longitude(coords)
        Phi = model.aux_get(aux, "orientation.Phi")
        z = Phi / ps.grav

        u_p, v_p, rand_pert = perturbation(model, phi, lam, z)
        T_v, p, u_ref = base_state(model, phi, lam, z, aux)

        moist = isinstance(model.physics.moisture, EquilMoist)
        q_tot = moisture_profile(model, phi, p) if moist \
            else jnp.zeros_like(p)

        u_sphere = jnp.stack([u_ref + u_p, v_p, jnp.zeros_like(u_p)],
                             axis=-1)
        u_cart = sphr_to_cart_vec(coords, u_sphere)

        M_v = ps.molmass_ratio - 1.0
        T = T_v / (1 + M_v * q_tot)
        pp = td.PhasePartition.vapor(q_tot)
        rho = p / (td.gas_constant_air(ps, pp) * T)
        ke = 0.5 * jnp.sum(u_cart * u_cart, axis=-1)
        e_tot = td.internal_energy(ps, T, pp) + ke + Phi

        fields = {"rho": rho, "rhoe": rho * e_tot * rand_pert}
        if moist:
            fields["moisture.rhoq_tot"] = rho * q_tot
        q = model.prog_spec.pack(fields, batch_shape=rho.shape)
        return model.prog_spec.set(q, "rhou", rho[..., None] * u_cart)
    return init


# --- problems (reference *_problem.jl) --------------------------------------

_BASE_STATES = {"zero": ZeroBaseState, "heldsuarez": HeldSuarezBaseState,
                "bc_wave": BCWaveBaseState}
_PERTURBATIONS = {"zero": NoPerturbation,
                  "deterministic": DeterministicPerturbation,
                  "random": RandomPerturbation}
_MOISTURE_PROFILES = {"zero": ZeroMoistureProfile,
                      "moist_low_tropics": MoistLowTropicsMoistureProfile}

_PROBLEMS = {
    # name -> (default base state, default sources builder)
    "baroclinic_wave": ("bc_wave", lambda: (Gravity(), Coriolis())),
    "heldsuarez": ("heldsuarez",
                   lambda: (Gravity(), Coriolis(), HeldSuarezForcing())),
}


@dataclass
class GCMDriverConfig:
    model: AtmosModel
    grid: object
    name: str


def gcm_driver_config(experiment: str = "heldsuarez",
                      init_base_state: Optional[str] = None,
                      init_perturbation: str = "deterministic",
                      init_moisture_profile: str = "moist_low_tropics",
                      surface_flux: str = "default",
                      moist: bool = True,
                      n_horz: int = 8, n_vert: int = 4, poly_order: int = 4,
                      domain_height: float = 30e3,
                      hyperdiffusion_tau: Optional[float] = 8 * 3600.0,
                      dtype=None, param_set=EARTH) -> GCMDriverConfig:
    """Build a GCM experiment from named pieces (reference GCMDriver.jl
    CLI: --experiment/--init-base-state/--init-perturbation/
    --init-moisture-profile/--surface-flux)."""
    from climatemachine_tpu.atmos.hyperdiffusion import (
        DryBiharmonic, EquilMoistBiharmonic)
    if experiment not in _PROBLEMS:
        raise ValueError(f"unknown experiment: {experiment}")
    default_base, sources_fn = _PROBLEMS[experiment]
    base = _BASE_STATES[init_base_state or default_base]()
    pert = _PERTURBATIONS[init_perturbation]()
    mp = _MOISTURE_PROFILES[init_moisture_profile]()

    hyper = None
    if hyperdiffusion_tau:
        hyper = (EquilMoistBiharmonic(hyperdiffusion_tau) if moist
                 else DryBiharmonic(hyperdiffusion_tau))
    from climatemachine_tpu.common.turbulence import ConstantKinematicViscosity
    physics = AtmosPhysics(
        param_set=param_set,
        orientation=SphericalOrientation(),
        ref_state=HydrostaticState(
            DecayingTemperatureProfile(290.0, 220.0, 8e3)),
        moisture=EquilMoist() if moist else DryModel(),
        # zero-viscosity closure so second-order boundary fluxes (bulk
        # surface fluxes) take effect (reference GCMDriver.jl:180 sets
        # turbulence=ConstantKinematicViscosity(0) for exactly this)
        turbulence=ConstantKinematicViscosity(0.0),
        hyperdiffusion=hyper)

    problem = AtmosProblem(
        init_state=make_gcm_init(base, pert, mp),
        boundary_conditions=parse_surface_flux(
            surface_flux, moist, C_drag=param_set.C_drag))
    model = AtmosModel(physics, problem, sources=sources_fn())

    a = param_set.planet_radius
    vert_range = a + np.linspace(0.0, domain_height, n_vert + 1)
    topo = stacked_cubed_sphere_topology(n_horz, vert_range)
    grid = make_grid(topo, poly_order, dtype=dtype)
    return GCMDriverConfig(model=model, grid=grid, name=experiment)
