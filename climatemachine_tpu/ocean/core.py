"""Ocean model vocabulary: coupling modes and boundary conditions.

Scope of reference ``src/Ocean/Ocean.jl`` (:17-33) and ``OceanBC.jl``:
OceanBC(velocity, temperature) with velocity ∈ {Impenetrable, Penetrable}
× {NoSlip, FreeSlip, KinematicStress} and temperature ∈ {Insulating,
TemperatureFlux}.

Ghost-state rules follow reference ``HydrostaticBoussinesq/bc_velocity.jl``
/ ``bc_temperature.jl``; the second-order ghost is chosen so the central
flux equals the prescribed boundary flux (the reference evaluates the
boundary flux from the plus state alone — 2·target − minus reproduces it
under a central average).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp


class Uncoupled:
    pass


class Coupled:
    pass


# --- velocity drag/wall BCs -------------------------------------------------

class NoSlip:
    pass


class FreeSlip:
    pass


@dataclass
class KinematicStress:
    """stress(problem, y, t) -> (τx, τy) net inward kinematic stress."""
    stress: Optional[Callable] = None


@dataclass
class Impenetrable:
    drag: object = field(default_factory=NoSlip)


@dataclass
class Penetrable:
    drag: object = field(default_factory=FreeSlip)


# --- temperature BCs --------------------------------------------------------

class Insulating:
    pass


@dataclass
class TemperatureFlux:
    """flux(problem, y, θ, t) -> kinematic temperature flux."""
    flux: Optional[Callable] = None


@dataclass
class OceanBC:
    velocity: object = field(default_factory=lambda: Impenetrable(NoSlip()))
    temperature: object = field(default_factory=Insulating)


def velocity_ghost(bc, nrm_h, uM):
    """First-order ghost horizontal velocity (reference bc_velocity.jl):
    uM, returns uP; nrm_h = horizontal normal components [..., 2]."""
    if isinstance(bc, Impenetrable) and isinstance(bc.drag, NoSlip):
        return -uM
    if isinstance(bc, Impenetrable) and isinstance(bc.drag,
                                                   (FreeSlip,
                                                    KinematicStress)):
        un = jnp.sum(uM * nrm_h, axis=-1, keepdims=True)
        n2 = jnp.sum(nrm_h * nrm_h, axis=-1, keepdims=True)
        return uM - 2 * un * nrm_h / jnp.maximum(n2, 1e-14)
    # Penetrable: copy
    return uM
