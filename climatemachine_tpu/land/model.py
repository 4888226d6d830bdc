"""Land model: soil water (Richards) + soil heat.

Scope of reference ``src/Land/Model/LandModel.jl`` (:58 LandModel,
vars_state composition :112-140), ``soil_model.jl`` (:168 SoilModel),
``soil_water.jl`` (:64 SoilWaterModel — prognostic ϑ_l, θ_i; aux h, K;
gradient h; flux -K∇h) and ``soil_heat.jl`` (:37 SoilHeatModel —
prognostic ρe_int; flux -κ∇T).

Also: freeze/thaw phase change (reference source.jl PhaseChange :18-120,
SoilHeatParameterizations.jl T(ρe_int, θ_i) recovery), moisture-dependent
thermal properties (SoilHeatModel(coupled_properties=True)), surface
runoff BCs (Runoff.jl NoRunoff/CoarseGridRunoff via
:class:`SurfaceRunoffBC`) and radiative energy BCs
(RadiativeEnergyFlux.jl via :class:`RadiativeEnergyFlux`).  BCs:
Dirichlet (prescribed state) or Neumann (prescribed flux; values may be
``fn(q_minus, aux_minus, t)``) per boundary tag.  Overland flow lives in
land/surface_flow.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.land import soil_params as sp
from climatemachine_tpu.utils.variables import VarSpec


@dataclass
class Dirichlet:
    """Prescribed boundary state value(s): fn(coords_or_None, t) or const."""
    value: object


@dataclass
class Neumann:
    """Prescribed boundary normal flux: fn or const (positive = inward)."""
    value: object


@dataclass
class LandBC:
    water: object = None     # Dirichlet(ϑ) | Neumann(flux) | None (no flux)
    heat: object = None


@dataclass
class SoilWaterModel:
    """(reference soil_water.jl:64)"""
    hydraulics: object = field(default_factory=sp.vanGenuchten)
    initial_vartheta: Callable = None


@dataclass
class SoilHeatModel:
    """(reference soil_heat.jl:37).  ``coupled_properties``: use
    moisture/ice-dependent ρc_s, κ and the ice latent term in T(ρe_int)
    (reference SoilHeatParameterizations.jl); otherwise constant
    rho_c_soil/kappa_soil."""
    initial_T: Callable = None
    T_ref: float = 288.0
    coupled_properties: bool = False


@dataclass
class SoilModel:
    params: sp.SoilParams = field(default_factory=sp.SoilParams)
    water: Optional[SoilWaterModel] = field(default_factory=SoilWaterModel)
    heat: Optional[SoilHeatModel] = None


class LandModel(BalanceLaw):
    """(reference LandModel.jl:58)"""

    def __init__(self, soil: SoilModel, boundary_conditions=(LandBC(),
                                                             LandBC()),
                 sources=()):
        self.soil = soil
        self.bcs = tuple(boundary_conditions)
        self.sources = tuple(sources)

        prog, aux, grad, gf = {}, dict(coord=3, z=1), {}, {}
        if soil.water is not None:
            prog["vartheta_l"] = 1
            prog["theta_i"] = 1
            aux["h"] = 1
            aux["K"] = 1
            grad["h"] = 1
            gf["K_grad_h"] = 3
        if soil.heat is not None:
            prog["rho_e_int"] = 1
            aux["T"] = 1
            grad["T"] = 1
            gf["kappa_grad_T"] = 3
        self.prog_spec = VarSpec(**prog)
        self.aux_spec = VarSpec(**aux)
        self.grad_spec = VarSpec(**grad)
        self.gf_spec = VarSpec(**gf)

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

    def prog(self, q, name):
        return self.prog_spec.get(q, name)

    def aux_get(self, aux, name):
        return self.aux_spec.get(aux, name)

    # --- thermal recovery ---------------------------------------------------
    def _water_content(self, q):
        if self.soil.water is None:
            z = self.prog(q, "rho_e_int")
            return jnp.zeros_like(z), jnp.zeros_like(z)
        return self.prog(q, "vartheta_l"), self.prog(q, "theta_i")

    def heat_capacity(self, q):
        p = self.soil.params
        if not self.soil.heat.coupled_properties:
            return p.rho_c_soil
        th_l, th_i = self._water_content(q)
        return sp.volumetric_heat_capacity(p, th_l, th_i)

    def thermal_conductivity(self, q):
        p = self.soil.params
        if not self.soil.heat.coupled_properties:
            return p.kappa_soil
        th_l, th_i = self._water_content(q)
        return sp.thermal_conductivity(p, th_l, th_i)

    def temperature(self, q):
        """T(ρe_int, θ_i) (reference temperature_from_ρe_int,
        SoilHeatParameterizations.jl:41)."""
        p = self.soil.params
        heat = self.soil.heat
        if not heat.coupled_properties:
            return heat.T_ref + self.prog(q, "rho_e_int") / p.rho_c_soil
        _, th_i = self._water_content(q)
        return sp.temperature_from_rho_e_int(
            p, self.prog(q, "rho_e_int"), th_i, self.heat_capacity(q),
            heat.T_ref)

    def rho_e_int_from_T(self, q_like, T, theta_i):
        p = self.soil.params
        heat = self.soil.heat
        if not heat.coupled_properties:
            return p.rho_c_soil * (T - heat.T_ref)
        rc = self.heat_capacity(q_like)
        return sp.volumetric_internal_energy(p, T, theta_i, rc, heat.T_ref)

    # --- init ----------------------------------------------------------------
    def nodal_init_state_auxiliary(self, geom, aux):
        coords = geom["coords"]
        return self.aux_spec.set(aux, "z", coords[..., 2])

    def init_state_prognostic(self, coords, aux, t):
        q = jnp.zeros(coords.shape[:-1] + (self.prog_spec.num,),
                      dtype=coords.dtype)
        if self.soil.water is not None:
            v = self.soil.water.initial_vartheta(coords, t)
            q = self.prog_spec.set(q, "vartheta_l", v)
        if self.soil.heat is not None:
            T = self.soil.heat.initial_T(coords, t)
            _, th_i = self._water_content(q)
            q = self.prog_spec.set(q, "rho_e_int",
                                   self.rho_e_int_from_T(q, T, th_i))
        return q

    # --- aux update: h and K (reference land_nodal_update_auxiliary_state!)
    def nodal_update_auxiliary_state(self, q, aux, t):
        p = self.soil.params
        if self.soil.water is not None:
            w = self.soil.water
            vt = self.prog(q, "vartheta_l")
            ti = self.prog(q, "theta_i")
            z = self.aux_get(aux, "z")
            psi = sp.pressure_head(w.hydraulics, p.porosity, p.S_s,
                                   p.theta_r, vt, ti)
            S_l = sp.effective_saturation(p.porosity, vt, p.theta_r)
            K = sp.hydraulic_conductivity(p.Ksat, w.hydraulics, S_l)
            aux = self.aux_spec.set(aux, "h", psi + z)
            aux = self.aux_spec.set(aux, "K", K)
        if self.soil.heat is not None:
            aux = self.aux_spec.set(aux, "T", self.temperature(q))
        return aux

    # --- gradient pass ------------------------------------------------------
    def compute_gradient_argument(self, q, aux, t):
        out = jnp.zeros(q.shape[:-1] + (self.grad_spec.num,), dtype=q.dtype)
        if self.soil.water is not None:
            out = self.grad_spec.set(out, "h", self.aux_get(aux, "h"))
        if self.soil.heat is not None:
            out = self.grad_spec.set(out, "T", self.temperature(q))
        return out

    def compute_gradient_flux(self, grad_g, q, aux, t):
        out = jnp.zeros(q.shape[:-1] + (self.gf_spec.num,), dtype=q.dtype)
        if self.soil.water is not None:
            gh = grad_g[..., :, self.grad_spec.index("h").start]
            K = self.aux_get(aux, "K")
            out = self.gf_spec.set(out, "K_grad_h", K[..., None] * gh)
        if self.soil.heat is not None:
            gT = grad_g[..., :, self.grad_spec.index("T").start]
            kappa = self.thermal_conductivity(q)
            if not jnp.isscalar(kappa) and getattr(kappa, "ndim", 0):
                kappa = kappa[..., None]
            out = self.gf_spec.set(out, "kappa_grad_T", kappa * gT)
        return out

    def flux_second_order(self, q, gf, hyper, aux, t):
        s = self.prog_spec
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        if self.soil.water is not None:
            F = s.set(F, "vartheta_l", -self.gf_spec.get(gf, "K_grad_h"))
        if self.soil.heat is not None:
            F = s.set(F, "rho_e_int", -self.gf_spec.get(gf, "kappa_grad_T"))
        return F

    # --- sources ------------------------------------------------------------
    def source(self, q, gf, aux, t):
        out = jnp.zeros_like(q)
        for src_ in self.sources:
            for name, val in src_.contributions(self, q, gf, aux, t).items():
                sl = self.prog_spec.index(name)
                out = out.at[..., sl.start].add(val)
        return out

    # --- boundary conditions ------------------------------------------------
    def boundary_conditions(self):
        return self.bcs

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        bc = self.bcs[tag - 1]
        qP, auxP = q_minus, aux_minus
        if self.soil.water is not None and isinstance(bc.water, Dirichlet):
            val = bc.water.value(t) if callable(bc.water.value) else \
                bc.water.value
            vt = self.prog(q_minus, "vartheta_l")
            qP = self.prog_spec.set(qP, "vartheta_l",
                                    2.0 * val - vt)
            # aux h must reflect the Dirichlet value for the gradient pass
            p = self.soil.params
            z = self.aux_get(aux_minus, "z")
            psi = sp.pressure_head(self.soil.water.hydraulics, p.porosity,
                                   p.S_s, p.theta_r,
                                   jnp.full_like(vt, val),
                                   jnp.zeros_like(vt))
            hM = self.aux_get(aux_minus, "h")
            auxP = self.aux_spec.set(auxP, "h", 2.0 * (psi + z) - hM)
        if self.soil.heat is not None and isinstance(bc.heat, Dirichlet):
            val = bc.heat.value(t) if callable(bc.heat.value) else \
                bc.heat.value
            # target ρe_int consistent with the minus-side water content
            # (with coupled_properties the heat capacity and ice latent
            # term depend on θ; using the minus-side θ makes the
            # reconstructed ghost temperature mirror the Dirichlet value)
            _, th_i = self._water_content(q_minus)
            re_m = self.prog(q_minus, "rho_e_int")
            re = self.rho_e_int_from_T(q_minus, jnp.full_like(re_m, val),
                                       th_i)
            qP = self.prog_spec.set(qP, "rho_e_int", 2.0 * re - re_m)
        return qP, auxP

    def boundary_state_gradient_flux(self, tag, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        bc = self.bcs[tag - 1]
        fs = self.gf_spec
        gfP = gf_minus
        def _neumann_value(v):
            if not callable(v):
                return v
            import inspect
            try:
                nparams = len(inspect.signature(v).parameters)
            except (TypeError, ValueError):
                nparams = 1
            val = v(q_minus, aux_minus, t) if nparams >= 3 else v(t)
            if getattr(val, "ndim", 0):
                val = val[..., None]          # broadcast against nrm
            return val

        if self.soil.water is not None:
            if isinstance(bc.water, Neumann):
                val = _neumann_value(bc.water.value)
                # inward water flux val>0: F·n = (−K∇h)·n = −val, i.e.
                # the K∇h ghost target is +n·val
                target = nrm * val
                gfP = fs.set(gfP, "K_grad_h",
                             2.0 * target - fs.get(gf_minus, "K_grad_h"))
            elif not isinstance(bc.water, Dirichlet):
                # no-flux default
                gfP = fs.set(gfP, "K_grad_h",
                             -fs.get(gf_minus, "K_grad_h"))
        if self.soil.heat is not None:
            if isinstance(bc.heat, Neumann):
                val = _neumann_value(bc.heat.value)
                target = nrm * val             # inward heat flux val>0
                gfP = fs.set(gfP, "kappa_grad_T",
                             2.0 * target - fs.get(gf_minus,
                                                   "kappa_grad_T"))
            elif not isinstance(bc.heat, Dirichlet):
                gfP = fs.set(gfP, "kappa_grad_T",
                             -fs.get(gf_minus, "kappa_grad_T"))
        return gfP
