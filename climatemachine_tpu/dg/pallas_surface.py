"""Pallas TPU kernel: fused surface flux + lift for the var-major RHS.

Scope of reference ``dgsem_interface_tendency!`` (DGModel_kernels.jl:588)
after the neighbor gather: the XLA surface pass (dg/fast_rhs._surface)
materializes ~a dozen [E, ~40, X] intermediates in HBM between the face
gather and the lift (ghost reflection, two one-sided fluxes, Rusanov
dissipation, fused hyper trace correction, fused-remainder linear-flux
subtraction, sM scaling) — ~25-35 MB each at the benchmark grid.  This
kernel takes the gathered bundles and produces the lifted tendency
contribution directly: everything between stays in VMEM, only
(Bf, BP, geometry) are read and only the [E, nq, Np] result is written.

Bundle lane layout (built by fast_rhs._surface, which owns the
contract):  0..nq-1 = prognostic state; nq = p; nq+1 = c (sound speed);
nq+2 = p_ref (when subtract_ref or remainder); then for the fused
remainder 3 lanes (phi, linear energy coeff, linear soundspeed); the
LAST nq lanes are the hyperdiffusive n·F₂ traces when hyper is on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=a.dtype,
                               precision=_HI)


def _k_extract(q_ref, p_ref, c_ref, aux_ref, gl2_ref, nu_ref, lift_ref,
               nrm_ref, out_ref, *, nq, na, ngl, has_hyper):
    """Volume state -> 16-lane face bundle, all in VMEM: the face
    extraction matmuls, the n·F₂ hyper trace build and the lane packing
    that the XLA path materializes as ~5 separate [E, *, X] HBM arrays
    (B concat, Bx, gl2f, G, s-stack)."""
    Eb, _, Np = q_ref.shape
    L = lift_ref[...]
    qx = _dot(q_ref[...].reshape(Eb * nq, Np), L)
    X = L.shape[1]
    qx = qx.reshape(Eb, nq, X)
    px = _dot(p_ref[...], L)
    cx = _dot(c_ref[...], L)
    parts = [qx, px[:, None, :], cx[:, None, :]]
    if na:
        ax = _dot(aux_ref[...].reshape(Eb * na, Np), L).reshape(Eb, na, X)
        parts.append(ax)
    if has_hyper:
        g2 = _dot(gl2_ref[...].reshape(Eb * 3 * ngl, Np), L)
        g2 = g2.reshape(Eb, 3, ngl, X)
        nux = _dot(nu_ref[...].reshape(Eb * 2, Np), L).reshape(Eb, 2, X)
        nrm = nrm_ref[...]
        G = [nrm[:, 0, :] * g2[:, 0, j] + nrm[:, 1, :] * g2[:, 1, j]
             + nrm[:, 2, :] * g2[:, 2, j] for j in range(ngl)]
        rho = qx[:, 0]
        rnu = rho * nux[:, 0]
        s = [jnp.zeros_like(rho)]
        for j in range(3):
            s.append(rnu * G[j])
        s.append(nux[:, 0] * (qx[:, 1] * G[0] + qx[:, 2] * G[1]
                              + qx[:, 3] * G[2]) + rnu * G[3])
        if nq > 5:
            s.append(rho * nux[:, 1] * G[4])
        parts.append(jnp.stack(s, axis=1))
    out_ref[...] = jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "nq", "na", "ngl", "has_hyper", "block_e", "interpret"))
def extract_trace_vm(qv, p, c_s, aux4, gl2k, nu, lift, nrm, *, nq, na,
                     ngl, has_hyper, block_e: int = 32,
                     interpret: bool = False):
    """qv [E, nq, Np], p/c_s [E, Np], aux4 [E, na, Np], gl2k
    [E, 3·ngl, Np], nu [E, 2, Np], lift [Np, X], nrm [E, 3, X] ->
    face bundle [E, nvb, X] with the fast_rhs._surface lane contract:
    q(nq), p, c, aux(na), then nq hyper n·F₂ trace lanes."""
    E, _, Np = qv.shape
    X = lift.shape[1]
    nvb = nq + 2 + na + (nq if has_hyper else 0)
    while E % block_e != 0:
        block_e //= 2
    grid = (E // block_e,)

    def be2(i):
        return (i, 0)

    def be3(i):
        return (i, 0, 0)

    kernel = functools.partial(_k_extract, nq=nq, na=na, ngl=ngl,
                               has_hyper=has_hyper)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e, nq, Np), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), be2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, max(na, 1), Np), be3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 3 * ngl, Np), be3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 2, Np), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, X), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 3, X), be3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, nvb, X), be3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nvb, X), qv.dtype),
        interpret=interpret,
    )(qv, p, c_s, aux4, gl2k, nu, lift, nrm)


def _kernel(bf_ref, bp_ref, nrm_ref, sm_ref, bmask_ref, liftT_ref, mi_ref,
            out_ref, *, nq, nvb, subtract, i_pref, has_hyper, rem_lanes,
            sl_lo, sl_hi, R_d_T0, R_over_cv):
    Eb = bf_ref.shape[0]
    X = bf_ref.shape[2]
    Bf = bf_ref[...]
    BP = bp_ref[...]
    nrm = nrm_ref[...]                      # [Eb, 3, X]
    bmask = bmask_ref[...]                  # [Eb, 1, X] (1.0 on walls)

    # boundary ghost: reflect normal momentum, copy everything else
    # (Impenetrable(FreeSlip) + Insulating + Impermeable)
    run = (BP[:, 1, :] * nrm[:, 0, :] + BP[:, 2, :] * nrm[:, 1, :]
           + BP[:, 3, :] * nrm[:, 2, :])
    bm = bmask[:, 0, :]
    ghost_mom = [BP[:, 1 + c, :] - 2.0 * run * nrm[:, c, :]
                 for c in range(3)]
    P = [BP[:, v, :] for v in range(nvb)]
    for c in range(3):
        P[1 + c] = bm * ghost_mom[c] + (1.0 - bm) * P[1 + c]

    M = [Bf[:, v, :] for v in range(nvb)]

    def flux_n(S):
        rho = S[0]
        inv = 1.0 / rho
        un = ((S[1] * nrm[:, 0, :] + S[2] * nrm[:, 1, :]
               + S[3] * nrm[:, 2, :]) * inv)
        pv = S[nq]
        p_eff = pv - S[i_pref] if subtract else pv
        Fn = [rho * un]
        for c in range(3):
            Fn.append(S[1 + c] * un + p_eff * nrm[:, c, :])
        Fn.append((S[4] + pv) * un)
        for v in range(5, nq):
            Fn.append(S[v] * un)
        return Fn, jnp.abs(un) + S[nq + 1]

    FnM, cM = flux_n(M)
    FnP, cP = flux_n(P)
    c = jnp.maximum(cM, cP)
    fstar = [0.5 * (FnM[v] + FnP[v]) - 0.5 * c * (P[v] - M[v])
             for v in range(nq)]

    if has_hyper:
        # +0.5(s⁻ − s⁺) on interior faces (wall faces: no transport)
        base = nvb - nq
        for v in range(nq):
            d2 = 0.5 * (M[base + v] - P[base + v])
            fstar[v] = fstar[v] + (1.0 - bm) * d2

    if rem_lanes:
        i_lphi, i_lco, i_lcl = rem_lanes
        # full-width evaluation with a static lane mask for the linear
        # model's face range (unaligned lane slices upset Mosaic; the
        # extra VPU work is free against the saved HBM round-trips)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Eb, X), 1)
        m_lin = jnp.where((lane >= sl_lo) & (lane < sl_hi),
                          jnp.float32(1.0), jnp.float32(0.0)
                          ).astype(Bf.dtype)

        def flux_lin(S):
            rho, rhoe, phi = S[0], S[4], S[i_lphi]
            pL = rho * R_d_T0 + R_over_cv * (rhoe - rho * phi)
            un = (S[1] * nrm[:, 0, :] + S[2] * nrm[:, 1, :]
                  + S[3] * nrm[:, 2, :])
            Fn = [un, pL * nrm[:, 0, :], pL * nrm[:, 1, :],
                  pL * nrm[:, 2, :], S[i_lco] * un]
            Fn += [jnp.zeros_like(un)] * (nq - 5)
            return Fn, S[i_lcl]

        FnLM, cLM = flux_lin(M)
        FnLP, cLP = flux_lin(P)
        cl = jnp.maximum(cLM, cLP)
        for v in range(nq):
            sub = (0.5 * (FnLM[v] + FnLP[v])
                   - 0.5 * cl * (P[v] - M[v]))
            fstar[v] = fstar[v] - m_lin * sub

    sM = sm_ref[...][:, 0, :]
    smf = jnp.stack([sM * f for f in fstar], axis=1)     # [Eb, nq, X]
    lifted = jax.lax.dot_general(
        smf.reshape(Eb * nq, X), liftT_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=smf.dtype,
        precision=_HI)                                   # [Eb·nq, Np]
    Np = liftT_ref.shape[1]
    out_ref[...] = -(mi_ref[...][:, None, :]
                     * lifted.reshape(Eb, nq, Np))


@functools.partial(jax.jit, static_argnames=(
    "nq", "nvb", "subtract", "i_pref", "has_hyper", "rem_lanes",
    "sl_lo", "sl_hi", "R_d_T0", "R_over_cv", "block_e", "interpret"))
def fused_surface_lift_vm(Bf, BP, nrm, sM, bmask, liftT, MI, *, nq, nvb,
                          subtract, i_pref, has_hyper, rem_lanes,
                          sl_lo, sl_hi, R_d_T0, R_over_cv,
                          block_e: int = 32, interpret: bool = False):
    """Bf/BP [E, nvb, X], nrm [E, 3, X], sM/bmask [E, 1, X],
    liftT [X, Np], MI [E, Np] -> -(MI · lift(sM · f*)) [E, nq, Np]."""
    E, _, X = Bf.shape
    Np = liftT.shape[1]
    while E % block_e != 0:
        block_e //= 2
    grid = (E // block_e,)

    def be3(i):
        return (i, 0, 0)

    kernel = functools.partial(
        _kernel, nq=nq, nvb=nvb, subtract=subtract, i_pref=i_pref,
        has_hyper=has_hyper, rem_lanes=rem_lanes, sl_lo=sl_lo,
        sl_hi=sl_hi, R_d_T0=R_d_T0, R_over_cv=R_over_cv)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e, nvb, X), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, nvb, X), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 3, X), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 1, X), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, 1, X), be3, memory_space=pltpu.VMEM),
            pl.BlockSpec((X, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, nq, Np), be3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nq, Np), Bf.dtype),
        interpret=interpret,
    )(Bf, BP, nrm, sM, bmask, liftT, MI)
