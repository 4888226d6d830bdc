"""The atmosphere balance law (dry compressible Euler + physics hooks).

Scope of reference ``src/Atmos/Model/AtmosModel.jl`` (AtmosPhysics :158,
AtmosModel :250, LES/GCM constructors :363/:378, vars_state composition,
update_auxiliary_state! :831) and the tendency definitions
(``atmos_tendencies.jl``: Mass ← Advect; Momentum ← Advect,
PressureGradient; Energy ← Advect, Pressure; plus Source singletons).

TPU-first redesign:
- No tendency DSL at runtime: the active flux/source set is composed here
  at configuration time and traces to straight-line tensor code.
- Thermodynamic quantities (T, p, soundspeed) are *recomputed* where
  needed instead of being cached in aux — on TPU the few extra VPU flops
  are cheaper than the HBM round-trip the reference's thermo-in-aux
  caching implies.
- All hooks are batched over nodes ([..., nvars] arrays).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp

from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.ref_state import (HydrostaticState,
                                                NoReferenceState,
                                                ReferenceState)
from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.common.orientations import (FlatOrientation,
                                                    Orientation)
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH, PlanetParameterSet
from climatemachine_tpu.utils.variables import VarSpec


@dataclass(frozen=True)
class AtmosPhysics:
    """Physics bundle (reference AtmosModel.jl:158 AtmosPhysics)."""
    param_set: PlanetParameterSet = EARTH
    orientation: Orientation = field(default_factory=FlatOrientation)
    ref_state: ReferenceState = field(default_factory=NoReferenceState)
    turbulence: Optional[object] = None     # TurbulenceClosure or None
    moisture: Optional[object] = None       # DryModel == None for now


@dataclass(frozen=True)
class AtmosProblem:
    """Initial condition + per-boundary-tag BCs (reference problem.jl)."""
    init_state: Callable = None   # (model, coords, aux, t) -> q
    boundary_conditions: Tuple[AtmosBC, ...] = (AtmosBC(), AtmosBC())


class AtmosModel(BalanceLaw):
    """Dry compressible atmosphere (reference AtmosModel.jl:250).

    Prognostic: ρ, ρu(3), ρe.  Auxiliary: coord, orientation (Φ, ∇Φ),
    reference state.  Sources are composed callables (see sources.py).
    """

    def __init__(self, physics: AtmosPhysics, problem: AtmosProblem,
                 sources: Sequence = ()):
        self.physics = physics
        self.problem = problem
        self.sources = tuple(sources)

        self.prog_spec = VarSpec(rho=1, rhou=3, rhoe=1)
        aux_fields = dict(coord=3,
                          orientation=physics.orientation.vars_aux())
        rs_spec = physics.ref_state.vars_aux()
        if rs_spec.num:
            aux_fields["ref_state"] = rs_spec
        if physics.turbulence is not None:
            tspec = physics.turbulence.vars_aux()
            if tspec.num:
                aux_fields["turbulence"] = tspec
        self.aux_spec = VarSpec(**aux_fields)

        if physics.turbulence is not None:
            self.grad_spec = physics.turbulence.vars_gradient()
            self.gf_spec = physics.turbulence.vars_gradient_flux()
        else:
            self.grad_spec = VarSpec()
            self.gf_spec = VarSpec()

    # --- conveniences -------------------------------------------------------
    @property
    def param_set(self) -> PlanetParameterSet:
        return self.physics.param_set

    @property
    def ref_state(self) -> ReferenceState:
        return self.physics.ref_state

    def prog(self, q, name):
        return self.prog_spec.get(q, name)

    def aux_get(self, aux, name):
        return self.aux_spec.get(aux, name)

    # --- schemas ------------------------------------------------------------
    def vars_state(self, state_type) -> VarSpec:
        if isinstance(state_type, st.Prognostic):
            return self.prog_spec
        if isinstance(state_type, st.Auxiliary):
            return self.aux_spec
        if isinstance(state_type, st.Gradient):
            return self.grad_spec
        if isinstance(state_type, st.GradientFlux):
            return self.gf_spec
        return VarSpec()

    # --- thermodynamics -----------------------------------------------------
    def recover_thermo(self, q, aux):
        """(T, p, u) recomputed from conserved state (dry)."""
        ps = self.param_set
        rho = self.prog(q, "rho")
        rhou = self.prog(q, "rhou")
        rhoe = self.prog(q, "rhoe")
        Phi = self.aux_get(aux, "orientation.Phi")
        e_int = td.internal_energy_from_state(rho, rhoe, rhou, Phi)
        T = td.air_temperature(ps, e_int)
        p = td.air_pressure(ps, T, rho)
        return T, p, rhou / rho[..., None]

    # --- initialization -----------------------------------------------------
    def nodal_init_state_auxiliary(self, geom, aux):
        coords = geom["coords"]
        ps = self.param_set
        ori = self.physics.orientation
        Phi = ori.geopotential(ps, coords)
        aux = self.aux_spec.set(aux, "orientation.Phi", Phi)
        aux = self.aux_spec.set(aux, "orientation.grad_Phi",
                                ori.grad_geopotential(ps, coords))
        if isinstance(self.ref_state, HydrostaticState):
            z = Phi / ps.grav
            for name, val in self.ref_state.fields(ps, z, Phi).items():
                aux = self.aux_spec.set(aux, f"ref_state.{name}", val)
        if self.physics.turbulence is not None:
            aux = self.physics.turbulence.init_aux(self, geom, aux)
        return aux

    def init_state_prognostic(self, coords, aux, t):
        return self.problem.init_state(self, coords, aux, t)

    # --- first-order --------------------------------------------------------
    def flux_first_order(self, q, aux, t):
        """Advect + PressureGradient (momentum) + Pressure (energy)
        (reference atmos_tendencies.jl:18-35, tendencies_momentum.jl:13-29,
        tendencies_energy.jl)."""
        rho = self.prog(q, "rho")
        rhou = self.prog(q, "rhou")
        rhoe = self.prog(q, "rhoe")
        T, p, u = self.recover_thermo(q, aux)

        p_eff = p
        if self.ref_state.subtract_off:
            p_eff = p - self.aux_get(aux, "ref_state.p")

        n = self.prog_spec.num
        F = jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)
        s = self.prog_spec
        F = s.set(F, "rho", rhou)
        # ρu ⊗ u + p' I
        Fm = rhou[..., :, None] * u[..., None, :]
        eye = jnp.eye(3, dtype=q.dtype)
        Fm = Fm + p_eff[..., None, None] * eye
        F = s.set(F, "rhou", Fm)
        F = s.set(F, "rhoe", (rhoe + p)[..., None] * u)
        return F

    def wavespeed(self, nrm, q, aux, t):
        rho = self.prog(q, "rho")
        T, p, u = self.recover_thermo(q, aux)
        un = jnp.abs(jnp.sum(u * nrm, axis=-1))
        return un + td.soundspeed_air(self.param_set, T)

    # --- second-order (delegated to turbulence closure) ---------------------
    def compute_gradient_argument(self, q, aux, t):
        turb = self.physics.turbulence
        if turb is None:
            return super().compute_gradient_argument(q, aux, t)
        return turb.gradient_argument(self, q, aux, t)

    def compute_gradient_flux(self, grad_g, q, aux, t):
        turb = self.physics.turbulence
        if turb is None:
            return super().compute_gradient_flux(grad_g, q, aux, t)
        return turb.gradient_flux(self, grad_g, q, aux, t)

    def flux_second_order(self, q, gf, hyper, aux, t):
        turb = self.physics.turbulence
        if turb is None:
            return super().flux_second_order(q, gf, hyper, aux, t)
        return turb.flux(self, q, gf, aux, t)

    # --- sources ------------------------------------------------------------
    def source(self, q, gf, aux, t):
        out = jnp.zeros_like(q)
        for src in self.sources:
            for name, val in src.contributions(self, q, gf, aux, t).items():
                sl = self.prog_spec.index(name)
                out = out.at[..., sl].add(
                    val if val.ndim == out[..., sl].ndim else val[..., None])
        return out

    # --- boundary conditions ------------------------------------------------
    def boundary_conditions(self):
        return self.problem.boundary_conditions

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        bc = self.problem.boundary_conditions[tag - 1]
        return bc.ghost_state(self, nrm, q_minus, aux_minus, t)
