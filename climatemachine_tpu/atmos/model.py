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


def _bc_value(v, model, q, aux, t, speed=None):
    """Resolve a bulk-BC coefficient: constants pass through; callables
    may be f(t), f(model, q, aux, t), or f(model, q, aux, t, speed) —
    the reference's fn_C_h(bl, state, aux, t, normPu_int) / varying-SST
    surface functions (gcm_bcs.jl Varying_SST_TJ16)."""
    if not callable(v):
        return v
    import inspect
    try:
        params = list(inspect.signature(v).parameters.values())
        # count only positional parameters without defaults; *args or
        # defaulted extras must not change the dispatch arity
        n = sum(1 for p in params
                if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                and p.default is p.empty)
        if any(p.kind is p.VAR_POSITIONAL for p in params):
            n = 5
    except (TypeError, ValueError):
        n = None
    if n is not None:
        if n >= 5:
            return v(model, q, aux, t, speed)
        if n >= 4:
            return v(model, q, aux, t)
        if n <= 1:
            return v(t)
    # uninspectable or ambiguous arity: try decreasing arity
    for args in ((model, q, aux, t, speed), (model, q, aux, t), (t,)):
        try:
            return v(*args)
        except TypeError:
            continue
    raise TypeError(
        f"bulk-BC coefficient {v!r} must accept (t), (model, q, aux, t) "
        "or (model, q, aux, t, speed)")


@dataclass(frozen=True)
class AtmosPhysics:
    """Physics bundle (reference AtmosModel.jl:158 AtmosPhysics)."""
    param_set: PlanetParameterSet = EARTH
    orientation: Orientation = field(default_factory=FlatOrientation)
    ref_state: ReferenceState = field(default_factory=NoReferenceState)
    turbulence: Optional[object] = None     # TurbulenceClosure or None
    moisture: Optional[object] = None       # MoistureModel; None -> DryModel
    tracers: Optional[object] = None        # NTracers or None
    hyperdiffusion: Optional[object] = None  # DryBiharmonic etc.
    precipitation: Optional[object] = None   # RainModel or None
    viscoussponge: Optional[object] = None   # UpperAtmosSponge or None
    sgstke: Optional[object] = None          # SGStkeModel or None
    energy: Optional[object] = None          # TotalEnergyModel (default)
                                             # or ThetaModel (rhoe slot
                                             # holds rho*theta_li)
    compressibility: Optional[object] = None  # Compressible (default) or
                                              # Anelastic1D
    lsforcing: Optional[object] = None       # HadGEMVertical or None
    turbconv: Optional[object] = None        # EDMF or None
    radiation: Optional[object] = None       # DYCOMSRadiationModel or None


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
        from climatemachine_tpu.atmos.moisture import DryModel
        from climatemachine_tpu.atmos.tracers import NoTracers

        from climatemachine_tpu.atmos.compressibility import Compressible
        from climatemachine_tpu.atmos.energy import TotalEnergyModel
        updates = {}
        if physics.moisture is None:
            updates["moisture"] = DryModel()
        if physics.energy is None:
            updates["energy"] = TotalEnergyModel()
        if physics.compressibility is None:
            updates["compressibility"] = Compressible()
        if updates:
            physics = AtmosPhysics(**{**physics.__dict__, **updates})
        if physics.energy.is_theta:
            assert physics.moisture is None or \
                isinstance(physics.moisture, DryModel), \
                "ThetaModel energy is dry-only in this build"
        if physics.compressibility.is_anelastic:
            assert not physics.energy.is_theta, \
                "Anelastic1D requires TotalEnergyModel"
            assert isinstance(physics.ref_state, HydrostaticState), \
                "Anelastic1D needs a hydrostatic reference state " \
                "(reference thermo_states_anelastic.jl uses aux.ref_state)"
        self.physics = physics
        self.problem = problem
        self.sources = tuple(sources)
        moist = physics.moisture
        tracers = physics.tracers or NoTracers()
        self.tracers = tracers

        prog_fields = dict(rho=1, rhou=3, rhoe=1)
        if moist.vars_prognostic().num:
            prog_fields["moisture"] = moist.vars_prognostic()
        if (physics.precipitation is not None
                and physics.precipitation.vars_prognostic().num):
            prog_fields["precipitation"] = \
                physics.precipitation.vars_prognostic()
        if tracers.vars_prognostic().num:
            prog_fields["tracers"] = tracers.vars_prognostic()
        if physics.sgstke is not None:
            assert physics.turbulence is not None, \
                "SGStkeModel needs a turbulence closure"
            prog_fields["sgstke"] = physics.sgstke.vars_prognostic()
        if physics.turbconv is not None:
            assert physics.turbulence is not None, \
                "EDMF needs the gradient chain (pair with a turbulence " \
                "closure, e.g. ConstantKinematicViscosity(0.0) as the " \
                "reference EDMF configs do)"
            from climatemachine_tpu.atmos.moisture import EquilMoist
            tc_moist = isinstance(physics.moisture, EquilMoist)
            prog_fields["turbconv"] = \
                physics.turbconv.vars_prognostic(tc_moist)
        self.prog_spec = VarSpec(**prog_fields)

        aux_fields = dict(coord=3,
                          orientation=physics.orientation.vars_aux())
        rs_spec = physics.ref_state.vars_aux()
        if rs_spec.num:
            aux_fields["ref_state"] = rs_spec
        if physics.turbulence is not None:
            tspec = physics.turbulence.vars_aux()
            if tspec.num:
                aux_fields["turbulence"] = tspec
        if moist.vars_aux().num:
            aux_fields["moisture"] = moist.vars_aux()
        hyper = physics.hyperdiffusion
        if hyper is not None and hyper.vars_aux().num:
            aux_fields["hyperdiffusion"] = hyper.vars_aux()
        if physics.lsforcing is not None and \
                physics.lsforcing.vars_aux().num:
            assert physics.turbulence is not None, \
                "lsforcing needs the gradient chain (pair with a " \
                "turbulence closure, as the reference AMIP configs do)"
            aux_fields["lsforcing"] = physics.lsforcing.vars_aux()
        if physics.turbconv is not None:
            aux_fields["turbconv"] = physics.turbconv.vars_aux()
        if physics.radiation is not None and \
                physics.radiation.vars_aux().num:
            aux_fields["radiation"] = physics.radiation.vars_aux()
        self.aux_spec = VarSpec(**aux_fields)
        self._column_ops_cache = {}

        self.gradlap_spec = (hyper.vars_gradient_laplacian()
                             if hyper is not None else VarSpec())
        self.hyper_spec = (hyper.vars_hyperdiffusive()
                           if hyper is not None else VarSpec())
        self.hyperdiffusion_direction = (getattr(hyper, "direction", None)
                                         if hyper is not None else None)

        # gradient machinery is active iff a turbulence closure provides
        # the diffusivity (reference: D_t from turbulence_tensors)
        if physics.turbulence is not None:
            gfields = physics.turbulence.vars_gradient().field_dict()
            gffields = physics.turbulence.vars_gradient_flux().field_dict()
            if moist.vars_gradient().num:
                gfields["moisture"] = moist.vars_gradient()
                gffields["moisture"] = moist.vars_gradient_flux()
            if tracers.vars_gradient().num:
                gfields["tracers"] = tracers.vars_gradient()
                gffields["tracers"] = tracers.vars_gradient_flux()
            if physics.sgstke is not None:
                gfields["sgstke"] = physics.sgstke.vars_gradient()
                gffields["sgstke"] = physics.sgstke.vars_gradient_flux()
            if physics.lsforcing is not None and \
                    physics.lsforcing.vars_gradient().num:
                gfields["lsforcing"] = physics.lsforcing.vars_gradient()
                gffields["lsforcing"] = \
                    physics.lsforcing.vars_gradient_flux()
            if physics.turbconv is not None:
                gfields["turbconv"] = \
                    physics.turbconv.vars_gradient(tc_moist)
                gffields["turbconv"] = \
                    physics.turbconv.vars_gradient_flux(tc_moist)
            self.grad_spec = VarSpec(**gfields)
            self.gf_spec = VarSpec(**gffields)
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
        if isinstance(state_type, st.GradientLaplacian):
            return self.gradlap_spec
        if isinstance(state_type, st.Hyperdiffusive):
            return self.hyper_spec
        return VarSpec()

    # --- thermodynamics -----------------------------------------------------
    def recover_thermo(self, q, aux):
        """(T, p, u) from conserved state via the moisture model (cached
        saturation adjustment for EquilMoist)."""
        T, p, _ = self.physics.moisture.thermo(self, q, aux)
        rho = self.prog(q, "rho")
        return T, p, self.prog(q, "rhou") / rho[..., None]

    def thermo_full(self, q, aux):
        """(T, p, u, PhasePartition-or-None)."""
        T, p, pp = self.physics.moisture.thermo(self, q, aux)
        rho = self.prog(q, "rho")
        return T, p, self.prog(q, "rhou") / rho[..., None], pp

    # --- prognostic <-> primitive (reference prog_prim_conversion.jl) -------
    def prognostic_to_primitive(self, q, aux):
        """Primitive state with the SAME layout/width as the prognostic
        spec: (ρ, u, p) in the (ρ, ρu, ρe) slots and specific scalars
        q_*/χ in the density-weighted slots (reference
        src/Atmos/Model/prog_prim_conversion.jl prognostic_to_primitive!).
        Used by the DGFV vertical reconstruction."""
        s = self.prog_spec
        rho = self.prog(q, "rho")
        _, p, _, _ = self.thermo_full(q, aux)
        prim = q / rho[..., None]       # density-weighted -> specific
        prim = s.set(prim, "rho", rho)
        prim = s.set(prim, "rhou", self.prog(q, "rhou") / rho[..., None])
        prim = s.set(prim, "rhoe", p)
        return prim

    def primitive_to_prognostic(self, prim, aux):
        """Inverse of :meth:`prognostic_to_primitive` (reference
        primitive_to_prognostic!).  For EquilMoist the temperature given
        (ρ, p, q_tot) is recovered by a short fixed-point on the moist gas
        constant (reference uses PhaseEquil_ρpq)."""
        from climatemachine_tpu.atmos.moisture import (EquilMoist,
                                                       NonEquilMoist)
        ps = self.param_set
        s = self.prog_spec
        rho = s.get(prim, "rho")
        u = s.get(prim, "rhou")
        p = s.get(prim, "rhoe")
        Phi = self.aux_get(aux, "orientation.Phi")
        moist = self.physics.moisture
        if isinstance(moist, EquilMoist):
            q_tot = s.get(prim, "moisture.rhoq_tot")
            T = p / (rho * td.gas_constant_air(ps))
            for _ in range(3):
                pp = td.phase_partition_equil(ps, T, rho, q_tot)
                T = p / (rho * td.gas_constant_air(ps, pp))
            pp = td.phase_partition_equil(ps, T, rho, q_tot)
        elif isinstance(moist, NonEquilMoist):
            pp = td.PhasePartition(s.get(prim, "moisture.rhoq_tot"),
                                   s.get(prim, "moisture.rhoq_liq"),
                                   s.get(prim, "moisture.rhoq_ice"))
            T = p / (rho * td.gas_constant_air(ps, pp))
        else:
            pp = None
            T = p / (rho * td.gas_constant_air(ps))
        e_int = td.internal_energy(ps, T, pp)
        e_kin = 0.5 * jnp.sum(u * u, axis=-1)
        q = prim * rho[..., None]       # specific -> density-weighted
        q = s.set(q, "rho", rho)
        q = s.set(q, "rhou", rho[..., None] * u)
        q = s.set(q, "rhoe", rho * (e_int + e_kin + Phi))
        return q

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
        if self.physics.hyperdiffusion is not None:
            aux = self.physics.hyperdiffusion.init_aux(self, geom, aux)
        if self.physics.lsforcing is not None:
            aux = self.physics.lsforcing.init_aux(self, Phi / ps.grav, aux)
        return aux

    def init_state_prognostic(self, coords, aux, t):
        q = self.problem.init_state(self, coords, aux, t)
        if self.physics.turbconv is not None:
            q = self.physics.turbconv.init_state(self, q, aux)
        if self.physics.compressibility.is_anelastic:
            # state density is the reference density for all time
            # (reference AtmosModel.jl:307-312)
            q = self.prog_spec.set(q, "rho",
                                   self.aux_get(aux, "ref_state.rho"))
        return q

    def _vertical_unit(self, aux):
        """k-hat from the cached geopotential gradient."""
        gPhi = self.aux_get(aux, "orientation.grad_Phi")
        return self.physics.orientation.vertical_unit_vector(self.param_set,
                                                             gPhi)

    # --- first-order --------------------------------------------------------
    def flux_first_order(self, q, aux, t):
        """Advect + PressureGradient (momentum) + Pressure (energy)
        (reference atmos_tendencies.jl:18-35, tendencies_momentum.jl:13-29,
        tendencies_energy.jl)."""
        rho = self.prog(q, "rho")
        rhou = self.prog(q, "rhou")
        rhoe = self.prog(q, "rhoe")
        T, p, u, pp = self.thermo_full(q, aux)

        p_eff = p
        if self.ref_state.subtract_off:
            p_eff = p - self.aux_get(aux, "ref_state.p")

        n = self.prog_spec.num
        F = jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)
        s = self.prog_spec
        F = s.set(F, "rho", rhou)
        if self.physics.energy.is_theta:
            # theta equation: pure advection, no pressure-work term
            # (reference tendencies_energy.jl theta branch)
            Fm = rhou[..., :, None] * u[..., None, :]
            Fm = Fm + p_eff[..., None, None] * jnp.eye(3, dtype=q.dtype)
            F = s.set(F, "rhou", Fm)
            F = s.set(F, "rhoe", rhoe[..., None] * u)
            if self.tracers.N:
                chi = s.get(q, "tracers.rhochi")
                F = s.set(F, "tracers.rhochi",
                          u[..., :, None] * chi[..., None, :])
            return F
        if self.physics.compressibility.is_anelastic:
            # Anelastic1D: no mass flux, momentum advects without the
            # pressure-gradient term, vertical momentum flux removed
            # (reference atmos_tendencies.jl:16,:28; projections.jl:8-17)
            F = s.set(F, "rho", jnp.zeros_like(rhou))
            Fm = rhou[..., :, None] * u[..., None, :]
            khat = self._vertical_unit(aux)
            Fm = Fm - jnp.einsum("...dc,...c->...d", Fm,
                                 khat)[..., :, None] * khat[..., None, :]
            F = s.set(F, "rhou", Fm)
            F = s.set(F, "rhoe", (rhoe + p)[..., None] * u)
        else:
            # ρu ⊗ u + p' I
            Fm = rhou[..., :, None] * u[..., None, :]
            eye = jnp.eye(3, dtype=q.dtype)
            Fm = Fm + p_eff[..., None, None] * eye
            F = s.set(F, "rhou", Fm)
            F = s.set(F, "rhoe", (rhoe + p)[..., None] * u)
        # advected moisture / tracer scalars (reference
        # tendencies_moisture.jl:9, tendencies_tracers.jl Advect)
        if self.physics.moisture.vars_prognostic().num:
            rq = s.get(q, "moisture.rhoq_tot")
            F = s.set(F, "moisture.rhoq_tot", rq[..., None] * u)
            names = self.physics.moisture.vars_prognostic().names()
            for nm in names:
                if nm == "rhoq_tot":
                    continue
                v = s.get(q, f"moisture.{nm}")
                F = s.set(F, f"moisture.{nm}", v[..., None] * u)
        if self.tracers.N:
            chi = s.get(q, "tracers.rhochi")        # [..., N]
            F = s.set(F, "tracers.rhochi", u[..., :, None] * chi[..., None, :])
        if self.physics.precipitation is not None and \
                self.physics.precipitation.vars_prognostic().num:
            F = self.physics.precipitation.flux_first_order(self, q, aux,
                                                            F, u)
        if self.physics.sgstke is not None:
            F = self.physics.sgstke.flux_first_order(self, q, aux, F, u)
        if self.physics.turbconv is not None:
            F = self.physics.turbconv.flux_first_order(self, q, aux, F, u)
        rad = self.physics.radiation
        if rad is not None and hasattr(rad, "energy_flux"):
            # radiative energy flux F_rad ẑ (reference dycoms.jl:100-121
            # eq_tends(Energy, DYCOMSRadiationModel, Flux{FirstOrder}))
            F = s.set(F, "rhoe",
                      s.get(F, "rhoe") + rad.energy_flux(self, q, aux))
        return F

    def wavespeed(self, nrm, q, aux, t):
        T, p, u, pp = self.thermo_full(q, aux)
        un = jnp.abs(jnp.sum(u * nrm, axis=-1))
        if self.physics.compressibility.is_anelastic:
            # no acoustic modes (reference AtmosModel.jl:806
            # soundspeed_air(ts, ::Anelastic1D) = 0)
            return un
        return un + td.soundspeed_air(self.param_set, T, pp)

    def show_tendencies(self) -> str:
        """Equation table of fluxes/sources per prognostic variable
        (reference BalanceLaws show_tendencies)."""
        from climatemachine_tpu.balance_laws.show_tendencies import \
            show_tendencies
        return show_tendencies(self)

    def column_ops(self, grid):
        """Cached per-grid ColumnOps (stack integrals).  Keyed by id but
        validated against a weakref so a recycled address for a new grid
        never returns a stale operator."""
        import weakref
        ent = self._column_ops_cache.get(id(grid))
        if ent is not None and ent[0]() is grid:
            return ent[1]
        from climatemachine_tpu.dg.columns import ColumnOps
        ops = ColumnOps(grid)
        try:
            ref = weakref.ref(grid)
        except TypeError:
            ref = lambda: grid
        self._column_ops_cache[id(grid)] = (ref, ops)
        return ops

    def update_auxiliary_state(self, grid, q, aux, t):
        """Nodal thermo refresh + column integrals (reference
        update_auxiliary_state! AtmosModel.jl:831: stack integrals when
        UpwardIntegrals > 0, then nodal update)."""
        aux = self.nodal_update_auxiliary_state(q, aux, t)
        rad = self.physics.radiation
        if rad is not None and hasattr(rad, "update_aux_integrals"):
            aux = rad.update_aux_integrals(self, grid, q, aux)
        return aux

    # --- auxiliary update ---------------------------------------------------
    def nodal_update_auxiliary_state(self, q, aux, t):
        """Thermo cache refresh (reference update_auxiliary_state!
        AtmosModel.jl:859-877 nodal thermo/moisture update)."""
        aux = self.physics.moisture.update_aux(self, q, aux, t)
        if self.physics.turbconv is not None:
            aux = self.physics.turbconv.update_aux(self, q, aux, t)
        return aux

    # --- second-order (turbulence + moisture + tracers) ---------------------
    def compute_gradient_argument(self, q, aux, t):
        turb = self.physics.turbulence
        if turb is None:
            return super().compute_gradient_argument(q, aux, t)
        out = turb.gradient_argument(self, q, aux, t)
        out = self.physics.moisture.gradient_argument(self, q, aux, t, out)
        out = self.tracers.gradient_argument(self, q, aux, t, out)
        if self.physics.sgstke is not None:
            out = self.physics.sgstke.gradient_argument(self, q, aux, t,
                                                        out)
        if self.physics.lsforcing is not None:
            out = self.physics.lsforcing.gradient_argument(self, q, aux,
                                                           t, out)
        if self.physics.turbconv is not None:
            out = self.physics.turbconv.gradient_argument(self, q, aux, t,
                                                          out)
        return out

    def compute_gradient_flux(self, grad_g, q, aux, t):
        turb = self.physics.turbulence
        if turb is None:
            return super().compute_gradient_flux(grad_g, q, aux, t)
        out = turb.gradient_flux(self, grad_g, q, aux, t)
        out = self.physics.moisture.gradient_flux(self, grad_g, q, aux, t,
                                                  out)
        out = self.tracers.gradient_flux(self, grad_g, q, aux, t, out)
        if self.physics.sgstke is not None:
            out = self.physics.sgstke.gradient_flux(self, grad_g, q, aux,
                                                    t, out)
        if self.physics.lsforcing is not None:
            out = self.physics.lsforcing.gradient_flux(self, grad_g, q,
                                                       aux, t, out)
        if self.physics.turbconv is not None:
            out = self.physics.turbconv.gradient_flux(self, grad_g, q,
                                                      aux, t, out)
        return out

    def compute_gradient_laplacian_argument(self, q, aux, t):
        hd = self.physics.hyperdiffusion
        if hd is None:
            return super().compute_gradient_laplacian_argument(q, aux, t)
        return hd.gradient_laplacian_argument(self, q, aux, t)

    def transform_post_gradient_laplacian(self, grad_lap, q, aux, t):
        hd = self.physics.hyperdiffusion
        if hd is None:
            return super().transform_post_gradient_laplacian(
                grad_lap, q, aux, t)
        return hd.transform(self, grad_lap, q, aux, t)

    def flux_second_order(self, q, gf, hyper, aux, t):
        turb = self.physics.turbulence
        n = self.prog_spec.num
        F = jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)
        if turb is not None and gf is not None:
            F = F + turb.flux(self, q, gf, aux, t)
            _, D_t = turb.viscosity(self, q, gf, aux, t)
            F = self.physics.moisture.flux_second_order(self, q, gf, aux,
                                                        D_t, F)
            F = self.tracers.flux_second_order(self, q, gf, aux, D_t, F)
            if self.physics.sgstke is not None:
                nu, _ = turb.viscosity(self, q, gf, aux, t)
                F = self.physics.sgstke.flux_second_order(self, q, gf,
                                                          aux, nu, F)
        if self.physics.hyperdiffusion is not None and hyper is not None:
            F = self.physics.hyperdiffusion.flux(self, q, hyper, aux, F)
        if self.physics.turbconv is not None and gf is not None:
            F = self.physics.turbconv.flux_second_order(self, q, gf, aux,
                                                        F)
        if self.physics.compressibility.is_anelastic:
            # projection applies to every flux order (reference
            # projections.jl:9-17 TendencyDef{Flux{O}} where {O})
            s = self.prog_spec
            khat = self._vertical_unit(aux)
            Fm = s.get(F, "rhou")
            Fm = Fm - jnp.einsum("...dc,...c->...d", Fm,
                                 khat)[..., :, None] * khat[..., None, :]
            F = s.set(F, "rhou", Fm)
        return F

    # --- sources ------------------------------------------------------------
    def source(self, q, gf, aux, t):
        out = jnp.zeros_like(q)
        if self.physics.sgstke is not None:
            sl = self.prog_spec.index("sgstke.rhoe_SGS")
            out = out.at[..., sl.start].add(
                self.physics.sgstke.source(self, q, gf, aux, t))
        if self.physics.turbconv is not None:
            out = out + self.physics.turbconv.source(self, q, gf, aux, t)
        for src in self.sources:
            for name, val in src.contributions(self, q, gf, aux, t).items():
                sl = self.prog_spec.index(name)
                out = out.at[..., sl].add(
                    val if val.ndim == out[..., sl].ndim else val[..., None])
        if self.physics.compressibility.is_anelastic:
            # remove vertical momentum sources and any mass source
            # (reference projections.jl:20-22)
            s = self.prog_spec
            khat = self._vertical_unit(aux)
            Sm = s.get(out, "rhou")
            Sm = Sm - jnp.sum(Sm * khat, axis=-1, keepdims=True) * khat
            out = s.set(out, "rhou", Sm)
            out = s.set(out, "rho", jnp.zeros_like(s.get(out, "rho")))
        return out

    # --- boundary conditions ------------------------------------------------
    def boundary_conditions(self):
        return self.problem.boundary_conditions

    def boundary_state(self, tag, nrm, q_minus, aux_minus, t):
        bc = self.problem.boundary_conditions[tag - 1]
        qP, auxP = bc.ghost_state(self, nrm, q_minus, aux_minus, t)
        if self.physics.turbconv is not None:
            qP = self.physics.turbconv.boundary_state(self, tag, nrm,
                                                      q_minus, aux_minus,
                                                      qP, t)
        return qP, auxP

    @property
    def has_boundary_flux_second_order(self):
        """True when walls may prescribe diffusive fluxes (DragLaw /
        BulkFormula need the turbulence closure); gates the fast scalar
        n·F₂ hyperdiffusion exchange in DGModel."""
        return self.physics.turbulence is not None

    def boundary_flux_second_order(self, tag, nrm, qM, gfM, auxM, t):
        """Surface diffusive fluxes at walls (reference bc_momentum.jl
        DragLaw, bc_energy.jl Insulating/BulkFormulaEnergy):
        - Impenetrable(FreeSlip/NoSlip) + Insulating: zero wall flux
        - DragLaw: F·n[ρu] = ρ C_d |u_t| u_t
        - BulkFormulaEnergy: F·n[ρe] = ρ C_h |u_t| (h − h_sfc)
        Returns the prescribed normal flux [..., n_prog]."""
        from climatemachine_tpu.atmos import boundaryconditions as abc
        if self.physics.turbulence is None:
            return None
        bc = self.problem.boundary_conditions[tag - 1]
        if not isinstance(bc, abc.AtmosBC):
            return None     # e.g. InitStateBC: no prescribed wall flux
        s = self.prog_spec
        rho = self.prog(qM, "rho")
        out = jnp.zeros(qM.shape[:-1] + (s.num,), dtype=qM.dtype)

        T, p, u = self.recover_thermo(qM, auxM)
        un = jnp.sum(u * nrm, axis=-1, keepdims=True)
        u_t = u - un * nrm
        speed = jnp.linalg.norm(u_t, axis=-1)

        mom = bc.momentum
        drag = getattr(mom, "bc", mom)
        if isinstance(drag, abc.DragLaw):
            # C_drag may be a callable (reference DragLaw fn(state, aux,
            # t, normPu_int), e.g. (u_star/|u|)^2 in stable_bl_model.jl)
            C_d = _bc_value(drag.C_drag, self, qM, auxM, t, speed)
            Fm = (rho * C_d * speed)[..., None] * u_t
            out = s.set(out, "rhou", Fm)
        mo = getattr(bc, "moisture", None)
        if self.physics.moisture.vars_prognostic().num and mo is not None \
                and not isinstance(mo, abc.Impermeable):
            # moisture wall flux also carries mass and momentum
            # (reference bc_moisture.jl:48-52, :93-96)
            if isinstance(mo, abc.PrescribedMoistureFlux):
                f_in = mo.fn(self, qM, auxM, t) * jnp.ones_like(rho)
            else:
                q_sfc = _bc_value(mo.q_tot_sfc, self, qM, auxM, t)
                C_q = _bc_value(mo.C_q, self, qM, auxM, t, speed)
                q_int = self.prog(qM, "moisture.rhoq_tot") / rho
                f_in = C_q * rho * speed * (q_sfc - q_int)
            out = s.set(out, "moisture.rhoq_tot",
                        s.get(out, "moisture.rhoq_tot") - f_in)
            out = s.set(out, "rho", s.get(out, "rho") - f_in)
            out = s.set(out, "rhou",
                        s.get(out, "rhou")
                        - f_in[..., None] * u)
        en = bc.energy
        if isinstance(en, abc.BulkFormulaEnergy):
            ps = self.param_set
            rhoe = self.prog(qM, "rhoe")
            h = (rhoe + p) / rho
            Phi = self.aux_get(auxM, "orientation.Phi")
            T_sfc = _bc_value(en.T_sfc, self, qM, auxM, t)
            C_h = _bc_value(en.C_h, self, qM, auxM, t, speed)
            h_sfc = (td.internal_energy(ps, T_sfc) + ps.R_d * T_sfc
                     + Phi)
            out = s.set(out, "rhoe",
                        rho * C_h * speed * (h - h_sfc))
        elif isinstance(en, abc.PrescribedEnergyFlux):
            # net inward flux (reference bc_energy.jl:58-64: −fn on the
            # outward normal)
            f_in = en.fn(self, qM, auxM, t) if callable(en.fn) else en.fn
            out = s.set(out, "rhoe",
                        s.get(out, "rhoe") - f_in
                        * jnp.ones_like(self.prog(qM, "rho")))
        return out
