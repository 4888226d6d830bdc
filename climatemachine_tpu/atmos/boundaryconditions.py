"""Atmosphere boundary conditions.

Scope of reference ``src/Atmos/Model/boundaryconditions.jl`` + ``bc_*.jl``:
``AtmosBC`` composed of per-equation BCs — momentum
``Impenetrable(FreeSlip()/NoSlip()/DragLaw)``, energy
``Insulating()/PrescribedTemperature/BulkFormulaEnergy``, moisture, etc.

TPU-first: a BC produces the exterior ("ghost") state for the numerical
flux, vectorized over all boundary face nodes of a given tag at once
(the reference's atmos_boundary_state! pattern).  First-order ghost
construction:
- FreeSlip momentum: mirror the normal momentum component.
- NoSlip momentum: negate momentum.
- Insulating energy: copy ρe.
Second-order (diffusive-flux) BCs adjust the gradient-flux ghost.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp


# --- momentum ---------------------------------------------------------------

class MomentumBC:
    def ghost_rhou(self, model, nrm, rhou, aux, t):
        raise NotImplementedError


class FreeSlip(MomentumBC):
    def ghost_rhou(self, model, nrm, rhou, aux, t):
        un = jnp.sum(rhou * nrm, axis=-1, keepdims=True)
        return rhou - 2 * un * nrm


class NoSlip(MomentumBC):
    def ghost_rhou(self, model, nrm, rhou, aux, t):
        return -rhou


@dataclass(frozen=True)
class DragLaw(MomentumBC):
    """Bulk-drag momentum flux with coefficient C_drag (reference
    bc_momentum.jl DragLaw); first-order ghost is free-slip, the drag
    enters through the diffusive flux (second-order path)."""
    C_drag: float

    def ghost_rhou(self, model, nrm, rhou, aux, t):
        return FreeSlip().ghost_rhou(model, nrm, rhou, aux, t)


@dataclass(frozen=True)
class Impenetrable(MomentumBC):
    """No normal flow; tangential behavior from the inner BC
    (reference bc_momentum.jl Impenetrable)."""
    bc: MomentumBC = field(default_factory=FreeSlip)

    def ghost_rhou(self, model, nrm, rhou, aux, t):
        return self.bc.ghost_rhou(model, nrm, rhou, aux, t)


# --- energy -----------------------------------------------------------------

class EnergyBC:
    def ghost_rhoe(self, model, nrm, q, aux, rhou_ghost, t):
        """Default: copy (insulating first-order)."""
        return model.prog(q, "rhoe")


class Insulating(EnergyBC):
    pass


@dataclass(frozen=True)
class BulkFormulaEnergy(EnergyBC):
    """Bulk aerodynamic surface energy flux C_h |u| (h − h_sfc)
    (reference bc_energy.jl BulkFormulaEnergy): fn_C_h and fn_T_sfc may be
    callables of t."""
    C_h: float = 1e-3
    T_sfc: float = 300.0


@dataclass(frozen=True)
class PrescribedEnergyFlux(EnergyBC):
    """Prescribed net inward energy flux fn(model, q, aux, t) [W/m^2]
    (reference bc_energy.jl PrescribedEnergyFlux); first-order ghost is
    insulating, the flux enters through the diffusive path."""
    fn: object = 0.0


@dataclass(frozen=True)
class PrescribedTemperature(EnergyBC):
    """Dirichlet surface temperature T_sfc (constant or callable of t,
    reference bc_energy.jl PrescribedTemperature with a time-varying
    surface, e.g. stable_bl_model.jl surface_temperature_variation)."""
    T_sfc: object

    def ghost_rhoe(self, model, nrm, q, aux, rhou_ghost, t):
        ps = model.param_set
        rho = model.prog(q, "rho")
        Phi = model.aux_get(aux, "orientation.Phi")
        T = self.T_sfc(t) if callable(self.T_sfc) else self.T_sfc
        e_int = ps.cv_d * (T - ps.T_0)
        ke = 0.5 * jnp.sum(rhou_ghost ** 2, axis=-1) / rho ** 2
        return rho * (e_int + ke + Phi)


# --- moisture ---------------------------------------------------------------

class MoistureBC:
    pass


class Impermeable(MoistureBC):
    """No moisture wall flux (reference bc_moisture.jl Impermeable)."""


@dataclass(frozen=True)
class PrescribedMoistureFlux(MoistureBC):
    """Net inward moisture flux fn(model, q, aux, t) [kg/m^2/s]
    (reference bc_moisture.jl PrescribedMoistureFlux)."""
    fn: object


@dataclass(frozen=True)
class BulkFormulaMoisture(MoistureBC):
    """Bulk aerodynamic moisture flux C_q rho |u_t| (q_sfc - q_int)
    (reference bc_moisture.jl BulkFormulaMoisture); q_tot_sfc may be a
    callable of t."""
    C_q: float = 1e-3
    q_tot_sfc: object = 0.0


# --- composed ---------------------------------------------------------------

@dataclass(frozen=True)
class AtmosBC:
    """Per-equation BC bundle (reference boundaryconditions.jl AtmosBC)."""
    momentum: MomentumBC = field(default_factory=lambda: Impenetrable(FreeSlip()))
    energy: EnergyBC = field(default_factory=Insulating)
    moisture: MoistureBC = field(default_factory=Impermeable)

    def ghost_state(self, model, nrm, q, aux, t):
        """(q_ghost, aux_ghost) for the first-order numerical flux."""
        rhou_g = self.momentum.ghost_rhou(model, nrm, model.prog(q, "rhou"),
                                          aux, t)
        rhoe_g = self.energy.ghost_rhoe(model, nrm, q, aux, rhou_g, t)
        qg = model.prog_spec.set(q, "rhou", rhou_g)
        qg = model.prog_spec.set(qg, "rhoe", rhoe_g)
        return qg, aux


@dataclass(frozen=True)
class InitStateBC:
    """Ghost state = the problem's ``init_state`` evaluated at the wall
    (reference bc_initstate.jl InitStateBC): for problems with an
    explicit/analytic solution (MMS tests, exact-solution benchmarks).
    The gradient-flux ghost stays the minus side (reference second-order
    branch copies diff⁻)."""

    def ghost_state(self, model, nrm, q, aux, t):
        coords = model.aux_get(aux, "coord")
        qg = model.problem.init_state(model, coords, aux, t)
        return qg, aux
