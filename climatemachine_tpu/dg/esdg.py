"""Entropy-stable DGSEM (flux-differencing) discretization.

Scope of reference ``src/Numerics/DGMethods/ESDGModel.jl`` (struct :48,
RHS functor :103) and ``ESDGModel_kernels.jl`` (esdg_volume_tendency!
:33: per-direction two-point flux differencing with the split
``D_il (G_i·H_il) − (H_il·G_l) D_li`` form), plus the EntropyConservative
surface flux (``NumericalFluxes.jl:414,:541``).

First-order flux derivatives are evaluated by flux differencing:
``∂x f(q(x)) = 2 ∂y F(q(x), q(y))|_{y=x}`` with a symmetric two-point flux
``H`` that is consistent (``H(q,q) = f(q)``) and satisfies the Tadmor
shuffle, making the semi-discretization entropy conservative/stable.
Nonconservative terms (gravity fluctuation) ride the same ``H``.

TPU-first realization: instead of the reference's per-element
one-thread-per-node kernel with an inner l-loop, each reference direction
builds the full pairwise tensor ``H[e, line, i, l, c, s]`` by broadcasting
the vectorized two-point flux over the (i, l) node pair axes, then
contracts with the 1-D derivative matrix in two einsums.  The pair tensor
is O(Nd×) larger than the state but stays in registers/VMEM under XLA
fusion; both contractions are MXU matmuls over the line axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.dg.spatial import (DGModel, _to_block, _to_flat,
                                           direction_dims, direction_faces)


class EntropyConservativeSurfaceFlux:
    """n · H(q⁻, q⁺): the two-point volume flux used as an interface flux
    (reference numerical_flux_first_order!(::EntropyConservative, ...),
    NumericalFluxes.jl:541)."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        H = bl.numerical_volume_flux_first_order(qM, auxM, qP, auxP)
        return jnp.einsum("...cs,...c->...s", H, nrm)


class EntropyStableRusanov(EntropyConservativeSurfaceFlux):
    """EC flux plus Rusanov-type matrix dissipation in ENTROPY variables:
    −(λ/2)(∂q/∂β)|_{β̄} (β⁺ − β⁻).  Because ∂q/∂β at fixed Φ is
    symmetric positive definite, the interface entropy production
    −(λ/2) Δβᵀ(∂q/∂β)Δβ ≤ 0 — provably entropy stable (the reference's
    matrix-flux construction; ∂q/∂β is taken by forward-mode autodiff of
    the balance law's ``state_from_entropy_variables_fixed_phi``).
    Falls back to a conservative-variable jump if the balance law lacks
    the entropy maps."""

    def __call__(self, bl, nrm, qM, auxM, qP, auxP, t):
        import jax

        ec = super().__call__(bl, nrm, qM, auxM, qP, auxP, t)
        c = jnp.maximum(bl.wavespeed(nrm, qM, auxM, t),
                        bl.wavespeed(nrm, qP, auxP, t))
        if not hasattr(bl, "state_from_entropy_variables_fixed_phi"):
            return ec - 0.5 * c[..., None] * (qP - qM)
        ns = qM.shape[-1]
        betaM = bl.state_to_entropy_variables(qM, auxM)[..., :ns]
        betaP = bl.state_to_entropy_variables(qP, auxP)[..., :ns]
        bavg = 0.5 * (betaM + betaP)
        Phi = bl.aux_spec.get(auxM, "Phi")
        shape = bavg.shape

        def qmap(b, phi):
            return bl.state_from_entropy_variables_fixed_phi(b[None],
                                                             phi[None])[0]

        A = jax.vmap(jax.jacfwd(qmap))(bavg.reshape(-1, ns),
                                       Phi.reshape(-1))
        dq = jnp.einsum("nij,nj->ni", A,
                        (betaP - betaM).reshape(-1, ns)).reshape(shape)
        return ec - 0.5 * c[..., None] * dq


class ESDGModel(DGModel):
    """Entropy-stable space discretization (reference ESDGModel.jl:48).

    The balance law must provide
    ``numerical_volume_flux_first_order(q1, aux1, q2, aux2) -> H``
    with broadcastable inputs ``[..., ns]``/``[..., naux]`` and output
    ``[..., 3, ns]`` (symmetric, consistent two-point flux including any
    nonconservative fluctuation), plus the standard wavespeed/BC hooks.
    No gradient/hyperdiffusive states are supported (reference asserts the
    same, ESDGModel.jl:120).
    """

    def __init__(self, balance_law, grid,
                 volume_numerical_flux=None,
                 surface_numerical_flux=None, direction="every",
                 update_aux: bool = True):
        super().__init__(balance_law, grid, direction=direction,
                         update_aux=update_aux)
        assert self.n_gradient == 0 and \
            balance_law.num_state(st.Hyperdiffusive()) == 0, \
            "ESDG supports first-order balance laws only"
        self.surface_flux = surface_numerical_flux or \
            EntropyConservativeSurfaceFlux()
        # volume flux override (defaults to the balance law's two-point
        # flux; reference volume_numerical_flux_first_order)
        self.volume_flux = volume_numerical_flux

    # --- flux-differencing volume term --------------------------------------
    def _volume_fluxdiff(self, q, aux, dims):
        bl, g = self.balance_law, self.grid
        E, ns = q.shape[0], q.shape[-1]
        MI = g.MI

        qb = _to_block(g, q)                   # [E, nk, nj, ni, ns]
        auxb = _to_block(g, aux)
        out = jnp.zeros_like(q)
        for a in dims:
            axis = g.dim - a                   # block axis of refdim a
            Nd = g.Nq[a]
            D = g.D[a]
            # move the direction axis next-to-last, flatten other node axes
            qa = jnp.moveaxis(qb, axis, -2).reshape(E, -1, Nd, ns)
            aa = jnp.moveaxis(auxb, axis, -2).reshape(E, -1, Nd,
                                                      aux.shape[-1])
            Ga = g.M[..., None] * g.xi_x[:, :, a, :]      # [E, Np, 3]
            Ga = jnp.moveaxis(_to_block(g, Ga), axis, -2).reshape(
                E, -1, Nd, 3)

            flux = self.volume_flux
            if flux is None:
                H = bl.numerical_volume_flux_first_order(
                    qa[:, :, :, None, :], aa[:, :, :, None, :],
                    qa[:, :, None, :, :], aa[:, :, None, :, :])
            else:
                H = flux(bl, qa[:, :, :, None, :], aa[:, :, :, None, :],
                         qa[:, :, None, :, :], aa[:, :, None, :, :])
            # H: [E, L, i, l, c, s]
            term1 = jnp.einsum("il,eLic,eLilcs->eLis", D, Ga, H)
            term2 = jnp.einsum("li,eLlc,eLilcs->eLis", D, Ga, H)
            dlt = term1 - term2                # [E, L, Nd, ns]
            # restore block layout then flatten to [E, Np, ns]
            shape = list(qb.shape)
            blk = jnp.moveaxis(
                dlt.reshape([E] + [s for i, s in enumerate(shape[1:-1])
                                   if i + 1 != axis] + [Nd, ns]),
                -2, axis)
            out = out + _to_flat(g, blk)
        return -MI[..., None] * out

    # --- full RHS -----------------------------------------------------------
    def __call__(self, q, aux, t):
        bl, g = self.balance_law, self.grid
        if self.update_aux:
            aux = bl.update_auxiliary_state(g, q, aux, t)

        dims = direction_dims(self.direction, g.dim)
        faces = direction_faces(self.direction, g.dim)

        tendency = self._volume_fluxdiff(q, aux, dims)

        nq = q.shape[-1]
        bM, bP = self._gather_faces(jnp.concatenate([q, aux], axis=-1),
                                    faces)
        qM, auxM = bM[..., :nq], bM[..., nq:]
        qP, auxP = bP[..., :nq], bP[..., nq:]
        nrm = g.normals[:, faces, :, :]

        def ghost(tag):
            return bl.boundary_state(tag, nrm, qM, auxM, t)

        qP, auxP = self._boundary_plus(ghost, faces, nrm, qM, auxM, qP,
                                       auxP, t)
        fstar = self.surface_flux(bl, nrm, qM, auxM, qP, auxP, t)
        sM = g.sM[:, faces, :, None]
        tendency = tendency - self._lift(sM * fstar, faces)

        tendency = tendency + bl.source(q, None, aux, t)
        return tendency, aux
