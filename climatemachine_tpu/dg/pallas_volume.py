"""Pallas TPU kernel: fused dry-Euler DG volume tendency.

Scope of reference ``DGModel_kernels.jl volume_tendency!`` (:64): the
dominant-FLOPs kernel computing M⁻¹ Σ_a D_aᵀ (M ξ_a,ᵢ F_i(q)) with the
flux staged in shared memory.  The XLA path (dg/spatial.py) materializes
the physical flux F [E, Np, 3, n] in HBM and pays layout-conversion
copies around the weak-divergence matmul (measured 46% of Held-Suarez
step time in pure data formatting); this kernel keeps F and every
intermediate in VMEM:

- grid over element blocks; per block the packed state is read once,
- thermodynamics + fluxes evaluated as [TE, Np] vector ops (Np minor —
  natural (8, 128) tiles),
- the weak divergence is one [TE, 3·Np] × [3·Np, Np] MXU matmul per
  variable at float32 precision,
- only the tendency returns to HBM.

Specialized to the dry compressible AtmosModel hot path (ρ, ρu, ρe;
TotalEnergy, Compressible, optional reference-pressure subtraction) —
the generic XLA path remains for every other balance law.  Gravity and
generic sources stay outside (they are cheap and model-composed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, phi_ref, pref_ref, ref3_ref, xi_ref, m_ref, mi_ref,
            w_ref, out_ref, *, R_d, cv_d, T_0, subtract_ref, lin_dims,
            lin_gravity):
    # blocks are var-major [TE, nvar, Np]: VMEM tiles pad (nvar->8,
    # Np->128) instead of the catastrophic trailing-variable padding
    rho = q_ref[:, 0, :]                 # [TE, Np]
    ru1, ru2, ru3 = q_ref[:, 1, :], q_ref[:, 2, :], q_ref[:, 3, :]
    rhoe = q_ref[:, 4, :]
    phi = phi_ref[...]
    inv_rho = 1.0 / rho
    u1, u2, u3 = ru1 * inv_rho, ru2 * inv_rho, ru3 * inv_rho

    e_int = (rhoe - 0.5 * (ru1 * u1 + ru2 * u2 + ru3 * u3)) * inv_rho - phi
    T = T_0 + e_int / cv_d
    p = rho * R_d * T
    p_eff = p - pref_ref[...] if subtract_ref else p

    # physical flux F[i][v], i = coordinate direction, v = variable
    h = rhoe + p
    F = ((ru1, ru1 * u1 + p_eff, ru2 * u1, ru3 * u1, h * u1),
         (ru2, ru1 * u2, ru2 * u2 + p_eff, ru3 * u2, h * u2),
         (ru3, ru1 * u3, ru2 * u3, ru3 * u3 + p_eff, h * u3))

    # fused remainder (reference remainder.jl:37): the linear
    # acoustic(-gravity) flux is subtracted on its direction slots only
    # — zero extra HBM traffic, all intermediates stay in VMEM
    Flin = None
    if lin_dims:
        pL = rho * R_d * T_0 + (R_d / cv_d) * (rhoe - rho * phi)
        rhoe_r = ref3_ref[:, 0, :]
        rho_r = ref3_ref[:, 1, :]
        p_r = ref3_ref[:, 2, :]
        coeff = (rhoe_r + p_r) / rho_r
        if not lin_gravity:
            coeff = coeff - phi
        zero = jnp.zeros_like(pL)
        Flin = ((ru1, pL, zero, zero, coeff * ru1),
                (ru2, zero, pL, zero, coeff * ru2),
                (ru3, zero, zero, pL, coeff * ru3))

    m = m_ref[...]
    w = w_ref[...]                       # [Np, 3*Np]
    mi = mi_ref[...]
    for v in range(5):
        # MF concatenated over the reference-direction axis: [TE, 3*Np]
        parts = []
        for a in range(3):
            acc = xi_ref[:, 3 * a, :] * F[0][v]
            acc += xi_ref[:, 3 * a + 1, :] * F[1][v]
            acc += xi_ref[:, 3 * a + 2, :] * F[2][v]
            if Flin is not None and a in lin_dims:
                for i in range(3):
                    if not (v in (1, 2, 3) and i != v - 1):
                        acc -= xi_ref[:, 3 * a + i, :] * Flin[i][v]
            parts.append(m * acc)
        mf = jnp.concatenate(parts, axis=-1)
        div = jax.lax.dot_general(
            mf, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)    # [TE, Np]
        out_ref[:, v, :] = mi * div


@functools.partial(jax.jit, static_argnames=("R_d", "cv_d", "T_0",
                                             "block_e", "subtract_ref",
                                             "lin_dims", "lin_gravity",
                                             "interpret"))
def dry_volume_tendency(q, phi, p_ref, ref3, xi_x, M, MI, Wdiv,
                        R_d: float, cv_d: float, T_0: float,
                        block_e: int = 32, subtract_ref: bool = True,
                        lin_dims: tuple = (), lin_gravity: bool = True,
                        interpret: bool = False):
    """Fused volume tendency for the dry-Euler balance law.

    q [E, Np, 5], phi/p_ref/M/MI [E, Np], ref3 [E, 3, Np] (ref rhoe/rho/p,
    only read when lin_dims is non-empty), xi_x [E, Np, 9] (ξ_a,ᵢ at
    a*3+i), Wdiv [Np, 3*Np].  Returns tendency [E, Np, 5]
    == MI · weak_divergence(M · ξ·(F(q) − F_lin(q) on lin_dims)).
    """
    E, Np, n = q.shape
    assert n == 5
    assert E % block_e == 0, (E, block_e)
    grid = (E // block_e,)

    # var-major kernel operands (padding nvar->8 instead of ->128)
    qt = q.transpose(0, 2, 1)            # [E, 5, Np]
    xit = xi_x.transpose(0, 2, 1)        # [E, 9, Np]

    def be(i):
        return (i, 0, 0)

    def be2(i):
        return (i, 0)

    kernel = functools.partial(_kernel, R_d=R_d, cv_d=cv_d, T_0=T_0,
                               subtract_ref=subtract_ref,
                               lin_dims=lin_dims, lin_gravity=lin_gravity)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e, 5, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 3, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 9, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 3 * Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, 5, Np), be,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 5, Np), q.dtype),
        interpret=interpret,
    )(qt, phi, p_ref, ref3, xit, M, MI, Wdiv)
    return out.transpose(0, 2, 1)


def _kernel_vm(q_ref, p_ref, phi_ref, pref_ref, ref3_ref, gl2_ref, nu_ref,
               xi_ref, m_ref, mi_ref, w_ref, out_ref, *, nq, ngl, R_d,
               cv_d, T_0, subtract_ref, has_f2, lin_dims, lin_gravity):
    """Var-major fused volume kernel (round 4): first-order flux from the
    PRECOMPUTED pressure (thermo runs once per RHS, outside), the
    hyperdiffusive second-order flux built IN VMEM from the chain output
    gl2 (= ∇Δ of (u_h, h_tot[, q_tot])) and folded into the same
    weak-divergence matmul (the materialized [E, 3, nq, Np] F2 tensor
    measured 3.9 ms of pure HBM assembly at bench scale), and an
    optional fused-remainder linear-flux subtraction.  Generic over the
    prognostic width: variables are (rho, rhou(3), rhoe, extras...) where
    every extra (rhoq_tot, tracers) advects with u."""
    rho = q_ref[:, 0, :]
    ru = (q_ref[:, 1, :], q_ref[:, 2, :], q_ref[:, 3, :])
    rhoe = q_ref[:, 4, :]
    p = p_ref[...]
    inv_rho = 1.0 / rho
    u = (ru[0] * inv_rho, ru[1] * inv_rho, ru[2] * inv_rho)
    p_eff = p - pref_ref[...] if subtract_ref else p
    h = rhoe + p

    def F(i, v):
        """Physical flux component F_i[v]."""
        if v == 0:
            return ru[i]
        if v in (1, 2, 3):
            f = ru[v - 1] * u[i]
            return f + p_eff if v - 1 == i else f
        if v == 4:
            return h * u[i]
        return q_ref[:, v, :] * u[i]          # advected scalars

    F2 = None
    if has_f2:
        nu4 = nu_ref[:, 0, :]
        rnu = rho * nu4

        def F2(i, v):
            """Hyperdiffusive flux (DryBiharmonic/EquilMoistBiharmonic
            .flux): F2[i][rhou_j] = ρ ν₄ gl2[i,j]; F2[i][rhoe] =
            ν₄ Σ_j gl2[i,j] ρu_j + ρ ν₄ gl2[i,3]; F2[i][rhoq] =
            ρ ν₄q gl2[i,4]."""
            def g(j):
                return gl2_ref[:, i * ngl + j, :]
            if v == 0:
                return None
            if v in (1, 2, 3):
                return rnu * g(v - 1)
            if v == 4:
                return nu4 * (ru[0] * g(0) + ru[1] * g(1)
                              + ru[2] * g(2)) + rnu * g(3)
            if v == 5 and ngl >= 5:
                return rho * nu_ref[:, 1, :] * g(4)
            return None

    Flin = None
    if lin_dims:
        phi = phi_ref[...]
        pL = rho * R_d * T_0 + (R_d / cv_d) * (rhoe - rho * phi)
        rhoe_r = ref3_ref[:, 0, :]
        rho_r = ref3_ref[:, 1, :]
        p_r = ref3_ref[:, 2, :]
        coeff = (rhoe_r + p_r) / rho_r
        if not lin_gravity:
            coeff = coeff - phi
        zero = jnp.zeros_like(pL)

        def _flin(i, v):
            if v == 0:
                return ru[i]
            if v in (1, 2, 3):
                return pL if v - 1 == i else zero
            if v == 4:
                return coeff * ru[i]
            return zero                        # scalars: no linear flux
        Flin = _flin

    m = m_ref[...]
    w = w_ref[...]
    mi = mi_ref[...]
    for v in range(nq):
        parts = []
        for a in range(3):
            acc = xi_ref[:, 3 * a, :] * F(0, v)
            acc += xi_ref[:, 3 * a + 1, :] * F(1, v)
            acc += xi_ref[:, 3 * a + 2, :] * F(2, v)
            if Flin is not None and a in lin_dims:
                for i in range(3):
                    if not (v in (1, 2, 3) and i != v - 1):
                        fl = Flin(i, v)
                        if fl is not None:
                            acc -= xi_ref[:, 3 * a + i, :] * fl
            if F2 is not None:
                for i in range(3):
                    f2 = F2(i, v)
                    if f2 is not None:
                        acc += xi_ref[:, 3 * a + i, :] * f2
            parts.append(m * acc)
        mf = jnp.concatenate(parts, axis=-1)
        div = jax.lax.dot_general(
            mf, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=mf.dtype,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:, v, :] = mi * div


@functools.partial(jax.jit, static_argnames=("nq", "ngl", "R_d", "cv_d",
                                             "T_0", "block_e",
                                             "subtract_ref", "has_f2",
                                             "lin_dims", "lin_gravity",
                                             "interpret"))
def fused_volume_tendency_vm(qv, p, phi, p_ref, ref3, gl2, nu, xiv, M, MI,
                             Wdiv, nq: int, ngl: int, R_d: float,
                             cv_d: float, T_0: float,
                             block_e: int = 32, subtract_ref: bool = True,
                             has_f2: bool = False, lin_dims: tuple = (),
                             lin_gravity: bool = True,
                             interpret: bool = False):
    """Var-major fused volume tendency: qv [E, nq, Np] (rho, rhou(3),
    rhoe, advected scalars...), p/phi/p_ref/M/MI [E, Np], ref3 [E, 3, Np]
    (ref rhoe/rho/p; read when lin_dims non-empty), gl2 [E, 3*ngl, Np]
    (coordinate-major chain output; read when has_f2) with nu [E, 2, Np]
    (ν₄, ν₄_q), xiv [E, 9, Np] (ξ_a,ᵢ at a*3+i), Wdiv [Np, 3*Np].
    Returns var-major tendency [E, nq, Np]
    == MI·weak_div(M·ξ·(F₁(q,p) + F₂(gl2,ν₄) − F_lin))."""
    E, _, Np = qv.shape
    assert E % block_e == 0, (E, block_e)
    grid = (E // block_e,)

    def be(i):
        return (i, 0, 0)

    def be2(i):
        return (i, 0)

    kernel = functools.partial(_kernel_vm, nq=nq, ngl=ngl, R_d=R_d,
                               cv_d=cv_d, T_0=T_0,
                               subtract_ref=subtract_ref,
                               has_f2=has_f2, lin_dims=lin_dims,
                               lin_gravity=lin_gravity)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e, nq, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 3, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 3 * ngl, Np), be,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 2, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 9, Np), be, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 3 * Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, nq, Np), be,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nq, Np), qv.dtype),
        interpret=interpret,
    )(qv, p, phi, p_ref, ref3, gl2, nu, xiv, M, MI, Wdiv)


def supports(balance_law, grid, direction, remainder=None) -> bool:
    """True when the fused kernel covers this configuration."""
    from climatemachine_tpu.atmos.model import AtmosModel
    from climatemachine_tpu.atmos.moisture import DryModel
    if not isinstance(balance_law, AtmosModel):
        return False
    if remainder is not None:
        from climatemachine_tpu.atmos.linear import (
            AtmosAcousticGravityLinearModel, AtmosAcousticLinearModel)
        lin, ldir = remainder
        if type(lin) not in (AtmosAcousticGravityLinearModel,
                             AtmosAcousticLinearModel):
            return False
        if ldir not in ("vertical", "every", "horizontal"):
            return False
        if balance_law.ref_state is None:
            return False
    ph = balance_law.physics
    return (grid.dim == 3 and direction == "every"
            and balance_law.prog_spec.num == 5
            and isinstance(ph.moisture, DryModel)
            and not ph.energy.is_theta
            and not ph.compressibility.is_anelastic
            and ph.radiation is None
            and grid.Wdiv is not None)


def volume_tendency_from_grid(dg, q, aux, interpret: bool = False,
                              block_e: int = 32):
    """Adapter: pull the grid/metric fields and model constants out of a
    DGModel and call the kernel (same contract as the XLA volume path)."""
    bl, g = dg.balance_law, dg.grid
    ps = bl.param_set
    phi = bl.aux_get(aux, "orientation.Phi")
    subtract = bl.ref_state.subtract_off
    rem = dg.remainder
    if subtract or rem is not None:
        p_ref = bl.aux_get(aux, "ref_state.p")
    else:
        p_ref = jnp.zeros_like(phi)
    lin_dims, lin_gravity = (), True
    if rem is not None:
        from climatemachine_tpu.atmos.linear import \
            AtmosAcousticGravityLinearModel
        from climatemachine_tpu.dg.spatial import direction_dims
        lin, ldir = rem
        lin_dims = direction_dims(ldir, 3)
        lin_gravity = isinstance(lin, AtmosAcousticGravityLinearModel)
        ref3 = jnp.stack([bl.aux_get(aux, "ref_state.rhoe"),
                          bl.aux_get(aux, "ref_state.rho"), p_ref], axis=1)
    else:
        ref3 = jnp.zeros((g.nelem, 3, g.Np), dtype=q.dtype)
    E = g.nelem
    be = block_e
    while E % be != 0:
        be //= 2
    xi = g.xi_x.reshape(E, g.Np, 9)
    return dry_volume_tendency(q, phi, p_ref, ref3, xi, g.M, g.MI, g.Wdiv,
                               R_d=ps.R_d, cv_d=ps.cv_d, T_0=ps.T_0,
                               block_e=be, subtract_ref=subtract,
                               lin_dims=lin_dims, lin_gravity=lin_gravity,
                               interpret=interpret)
