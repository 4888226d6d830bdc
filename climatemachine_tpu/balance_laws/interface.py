"""The balance-law model ABI: dq/dt = -div F1(q) - div F2(q, grad g) + S.

Scope of reference ``src/BalanceLaws/interface.jl`` (BalanceLaw :38,
vars_state :63, init_state_prognostic! :77, flux/source/gradient/BC hooks).

TPU-first redesign: every hook is *vectorized over nodes* — it receives
batched arrays of shape ``[..., nvars]`` (not per-point structs) and
returns batched arrays, so the traced program is pure tensor algebra with
no per-node Python.  Model composition (which tendencies are active, which
boundary conditions exist) is resolved at configuration time; under
``jit`` nothing dynamic remains.

Conventions:
- q:    [..., n_prognostic]
- aux:  [..., n_auxiliary]
- F:    [..., ncoord, n_prognostic]  (physical flux, one vector per var)
- g:    [..., n_gradient], grad_g: [..., ncoord, n_gradient]
- gf:   [..., n_gradient_flux]
- Named access through ``self.vars_state(Type()).get(arr, "name")``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.utils.variables import VarSpec


class BalanceLaw:
    """Abstract PDE in balance-law form. Subclasses are *configuration*
    objects: plain Python attributes fixed before tracing."""

    # ------ schemas --------------------------------------------------------
    def vars_state(self, state_type) -> VarSpec:
        """VarSpec for a state category (reference vars_state, interface.jl:63)."""
        return VarSpec()

    def num_state(self, state_type) -> int:
        return self.vars_state(state_type).num

    # ------ initialization -------------------------------------------------
    def nodal_init_state_auxiliary(self, geom, aux):
        """Fill model aux fields given local geometry; aux arrives with the
        ``coord`` entries already set. Returns updated aux.

        ``geom`` is a dict with at least ``coords`` [E, Np, ncoord], ``J``
        (Jacobian determinant per node) and ``Nq`` (reference LocalGeometry,
        Geometry.jl:53)."""
        return aux

    def init_state_prognostic(self, coords, aux, t):
        """Initial condition; returns q [..., n_prognostic]."""
        raise NotImplementedError

    # ------ first-order (inviscid) terms ------------------------------------
    def flux_first_order(self, q, aux, t):
        """Return F1 [..., ncoord, n_prognostic]."""
        n = self.num_state(st.Prognostic())
        return jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)

    def source(self, q, gf, aux, t):
        """Return S [..., n_prognostic]."""
        return jnp.zeros_like(q)

    def wavespeed(self, nrm, q, aux, t):
        """Max signal speed along unit normal ``nrm`` [..., ncoord] -> [...]."""
        return jnp.zeros(q.shape[:-1], dtype=q.dtype)

    # ------ second-order (viscous) terms ------------------------------------
    def compute_gradient_argument(self, q, aux, t):
        """Variables g to differentiate [..., n_gradient]."""
        n = self.num_state(st.Gradient())
        return jnp.zeros(q.shape[:-1] + (n,), dtype=q.dtype)

    def compute_gradient_flux(self, grad_g, q, aux, t):
        """sigma(grad g) [..., n_gradient_flux]."""
        n = self.num_state(st.GradientFlux())
        return jnp.zeros(q.shape[:-1] + (n,), dtype=q.dtype)

    def flux_second_order(self, q, gf, hyper, aux, t):
        """Return F2 [..., ncoord, n_prognostic]."""
        n = self.num_state(st.Prognostic())
        return jnp.zeros(q.shape[:-1] + (3, n), dtype=q.dtype)

    # ------ hyperdiffusion ---------------------------------------------------
    def compute_gradient_laplacian_argument(self, q, aux, t):
        """Fields whose Laplacian feeds the hyperdiffusion chain
        [..., n_gradlap]."""
        n = self.num_state(st.GradientLaplacian())
        return jnp.zeros(q.shape[:-1] + (n,), dtype=q.dtype)

    def transform_post_gradient_laplacian(self, grad_lap, q, aux, t):
        """Map grad(Laplacian) [..., ncoord, n_gradlap] to hyperdiffusive
        state [..., n_hyper]."""
        n = self.num_state(st.Hyperdiffusive())
        return jnp.zeros(q.shape[:-1] + (n,), dtype=q.dtype)

    # ------ boundary conditions ---------------------------------------------
    def boundary_conditions(self) -> Tuple:
        """Tuple of BC objects; ``face_bctag`` k selects the k-th entry
        (1-based, matching the reference convention)."""
        return ()

    def boundary_state(self, tag: int, nrm, q_minus, aux_minus, t):
        """Ghost (exterior) prognostic/aux state for boundary tag ``tag``.
        Default: reflective no-op (q+, aux+) = (q-, aux-)."""
        return q_minus, aux_minus

    def boundary_state_gradient_flux(self, tag: int, nrm, gf_minus, q_minus,
                                     aux_minus, t):
        """Ghost gradient-flux state at boundaries (for F2*)."""
        return gf_minus

    # ------ auxiliary update -------------------------------------------------
    def nodal_update_auxiliary_state(self, q, aux, t):
        """Pointwise aux refresh each RHS call (thermodynamics etc.)."""
        return aux

    def preprocess_state(self, dg, q, aux, t):
        """State transform applied at the start of every RHS evaluation
        (reference: the ocean's per-RHS vertical filters on Q,
        hydrostatic_boussinesq_model.jl:646-657).  Default: identity."""
        return q

    def update_auxiliary_state(self, grid, q, aux, t):
        """Whole-grid aux update: default = nodal update; models override to
        add column integrals (reference update_auxiliary_state!)."""
        return self.nodal_update_auxiliary_state(q, aux, t)

    def update_auxiliary_state_gradient(self, dg, gf, q, aux, t):
        """Aux update that needs gradient-flux values (reference
        update_auxiliary_state_gradient!, e.g. ocean w/pkin integrals,
        hydrostatic_boussinesq_model.jl:668).  Called after the gradient
        pass, before tendency assembly.  Returns (aux, q) — models may
        also filter the state here (the reference mutates Q)."""
        return aux, q

    # ------ column integrals (reference integral_load_auxiliary_state!) ------
    def integral_load_auxiliary_state(self, q, aux, t):
        """Integrand(s) for upward column integrals [..., n_upint]."""
        n = self.num_state(st.UpwardIntegrals())
        return jnp.zeros(q.shape[:-1] + (n,), dtype=q.dtype)

    def integral_set_auxiliary_state(self, aux, integrals):
        """Store computed upward integrals into aux."""
        return aux

    def reverse_integral_load_auxiliary_state(self, q, aux, t):
        n = self.num_state(st.DownwardIntegrals())
        return jnp.zeros(q.shape[:-1] + (n,), dtype=q.dtype)

    def reverse_integral_set_auxiliary_state(self, aux, integrals):
        return aux
