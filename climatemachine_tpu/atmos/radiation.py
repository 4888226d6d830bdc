"""Radiation models.

Scope of reference ``src/Atmos/Model/radiation.jl`` (NoRadiation) and the
DYCOMS-II RF01 longwave model defined with the reference's dycoms
experiment (``experiments/AtmosLES/dycoms.jl:68-150`` DYCOMSRadiationModel:
Stevens et al. 2005 Eq. 3): an energy flux

    F_rad(z) = F₀ exp(−Q(z, z_top)) + F₁ exp(−Q(0, z))
             + ρ_i c_p D ∂α_z ∛Δz_i (Δz_i/4 + z_i)

with Q(a, b) = ∫_a^b κ ρ q_liq dz the liquid-water attenuation path.
TPU-native: the two path integrals are one upward and one downward
column cumulative integral (dg/columns.py), refreshed in
``update_auxiliary_state`` each RHS call (reference UpwardIntegrals /
DownwardIntegrals machinery, dycoms.jl:123-150)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from climatemachine_tpu.utils.variables import VarSpec


class NoRadiation:
    """Reference radiation.jl NoRadiation."""

    def vars_aux(self) -> VarSpec:
        return VarSpec()


@dataclass
class DYCOMSRadiationModel:
    """DYCOMS-II RF01 longwave radiation (reference dycoms.jl:76)."""
    kappa: float = 85.0          # mass absorption coefficient [m^2/kg]
    alpha_z: float = 1.0         # troposphere cooling parameter [m^-4/3]
    z_i: float = 840.0           # inversion height [m]
    rho_i: float = 1.13          # density at z_i [kg/m^3]
    D_subsidence: float = 3.75e-6  # large-scale divergence [1/s]
    F_0: float = 70.0            # cloud-top flux [W/m^2]
    F_1: float = 22.0            # surface flux [W/m^2]

    def vars_aux(self) -> VarSpec:
        # Q(0, z) and Q(z, z_top) attenuation paths
        return VarSpec(int_att=1, int_att_rev=1)

    def _integrand(self, model, q, aux):
        rho = model.prog(q, "rho")
        moist = model.physics.moisture
        if hasattr(moist, "vars_prognostic") and \
                "rhoq_liq" in moist.vars_prognostic().names():
            q_liq = model.prog(q, "moisture.rhoq_liq") / rho
        else:
            q_liq = model.aux_get(aux, "moisture.q_liq")
        return rho * self.kappa * q_liq

    def update_aux_integrals(self, model, grid, q, aux):
        """Refresh the attenuation-path integrals (reference
        indefinite_stack_integral! on UpwardIntegrals)."""
        ops = model.column_ops(grid)
        f = self._integrand(model, q, aux)[..., None]
        up = ops.indefinite_integral(f)[..., 0]
        dn = ops.reverse_indefinite_integral(f)[..., 0]
        aux = model.aux_spec.set(aux, "radiation.int_att", up)
        return model.aux_spec.set(aux, "radiation.int_att_rev", dn)

    def energy_flux(self, model, q, aux):
        """F_rad ẑ [..., 3] added to the energy first-order flux
        (reference dycoms.jl flux(::Energy, ::DYCOMSRadiation,...))."""
        ps = model.param_set
        ori = model.physics.orientation
        Phi = model.aux_get(aux, "orientation.Phi")
        grad_Phi = model.aux_get(aux, "orientation.grad_Phi")
        z = ori.altitude(ps, Phi)
        dz_i = jnp.maximum(z - self.z_i, 0.0)
        up = model.aux_get(aux, "radiation.int_att")
        dn = model.aux_get(aux, "radiation.int_att_rev")
        F_rad = (self.F_1 * jnp.exp(-up) + self.F_0 * jnp.exp(-dn)
                 + (self.rho_i * ps.cp_d * self.D_subsidence * self.alpha_z
                    * jnp.cbrt(dz_i) * (dz_i / 4 + self.z_i)))
        zhat = ori.vertical_unit_vector(ps, grad_Phi)
        return F_rad[..., None] * zhat
