"""Passive tracers.

Scope of reference ``src/Atmos/Model/tracers.jl`` (NoTracers, NTracers{N}
:122): N advected scalars ρχ with per-tracer diffusivity scaling δ_χ.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp

from climatemachine_tpu.utils.variables import VarSpec


class NoTracers:
    N = 0

    def vars_prognostic(self) -> VarSpec:
        return VarSpec()

    def vars_gradient(self) -> VarSpec:
        return VarSpec()

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec()

    def gradient_argument(self, model, q, aux, t, out):
        return out

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        return out

    def flux_second_order(self, model, q, gf, aux, D_t, F):
        return F


@dataclass
class NTracers(NoTracers):
    """(reference tracers.jl:122) δ_χ: per-tracer diffusivity ratios."""
    delta_chi: Tuple[float, ...] = (1.0,)

    @property
    def N(self):
        return len(self.delta_chi)

    def vars_prognostic(self) -> VarSpec:
        # (self.N,) not self.N: an int 1 would declare a SCALAR slot and
        # break the [..., N]-shaped tracer math for a single tracer (the
        # reference is SVector{N} even at N=1, tracers.jl:122)
        return VarSpec(rhochi=(self.N,))

    def vars_gradient(self) -> VarSpec:
        return VarSpec(chi=(self.N,))

    def vars_gradient_flux(self) -> VarSpec:
        return VarSpec(d_chi=(3, self.N))

    def gradient_argument(self, model, q, aux, t, out):
        rho = model.prog(q, "rho")
        chi = model.prog(q, "tracers.rhochi") / rho[..., None]
        return model.grad_spec.set(out, "tracers.chi", chi)

    def gradient_flux(self, model, grad_g, q, aux, t, out):
        sl = model.grad_spec.index("tracers.chi")
        return model.gf_spec.set(out, "tracers.d_chi",
                                 grad_g[..., :, sl])

    def flux_second_order(self, model, q, gf, aux, D_t, F):
        rho = model.prog(q, "rho")
        d_chi = model.gf_spec.get(gf, "tracers.d_chi")    # [..., 3, N]
        delta = jnp.asarray(self.delta_chi, dtype=q.dtype)
        f = -rho[..., None, None] * D_t[..., :, None] * delta * d_chi
        s = model.prog_spec
        return s.set(F, "tracers.rhochi", s.get(F, "tracers.rhochi") + f)
