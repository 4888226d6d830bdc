"""Pallas TPU kernels: fused hyperdiffusion LDG chain (grad → div → grad).

Scope of reference ``DGModel_kernels.jl`` volume/interface gradient and
divergence-of-gradient kernels (:934, :1365, :2132-2859), chain structure
``DGModel.jl:226-310``.

The var-major XLA chain (dg/ldg_varmajor.py) already rides MXU matmuls,
but every pass materializes its intermediates in HBM: the fused
derivative+extraction product ``cat`` (~80 MB/pass at the benchmark
grid), the lift operand ``prod``, and the pass-to-pass states ``grad``/
``lap``.  These four kernels keep all of that in VMEM:

- **K1** state → (volume gradient, minus-side face rows)
- **K2** (vol₁, face jumps) → grad in VMEM → (volume divergence, n·v
  face scalars)  — pass-1 lift fused with pass-2 volume
- **K3** (div, scalar jumps) → lap in VMEM → (volume gradient, rows)
  — pass-2 lift fused with pass-3 volume
- **K4** (vol₃, face jumps) → final grad-of-laplacian

Only the three face-row exchanges (a global row gather over elements —
inherently cross-block) and the cheap jump arithmetic stay in XLA.
Matmuls run at float32 Precision.HIGHEST (see dg/spatial.py).

Supported exactly where the var-major chain is (identity orientation,
uniform Nfp, no halo exchange hook); opt-in via
``DGModel(ldg_kernel="pallas")`` until hardware-validated, parity-tested
in interpret mode off-TPU.
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


def _grad_part(x2, xi, wd, sel, nd, F):
    """x2 [R, Np] (R = Eb·n rows), xi [Eb, nd*3, Np] → (vol [Eb,3,n,Np]
    list-of-c, rows [R, F]).  One dot per derivative axis + one for the
    face extraction: Mosaic rejects reshapes that split the lane axis
    (the fused [Np, nd*Np+F] operator needed cat[:, :nd*Np].reshape(...,
    nd, Np)), and inside VMEM the fusion saves nothing."""
    Eb = xi.shape[0]
    n = x2.shape[0] // Eb
    Np = x2.shape[1]
    rows = _dot(x2, sel)
    d = [_dot(x2, wd[ai]).reshape(Eb, n, Np) for ai in range(nd)]
    vol = []
    for c in range(3):
        acc = xi[:, c, :][:, None, :] * d[0]
        for ai in range(1, nd):
            acc += xi[:, ai * 3 + c, :][:, None, :] * d[ai]
        vol.append(acc)
    return vol, rows


def _k_first(x_ref, xi_ref, wd_ref, sel_ref, vol_ref, rows_ref, *, nd, F):
    Eb, n, Np = x_ref.shape
    vol, rows = _grad_part(x_ref[...].reshape(Eb * n, Np), xi_ref[...],
                           wd_ref[...], sel_ref[...], nd, F)
    for c in range(3):
        vol_ref[:, c] = vol[c]
    rows_ref[...] = rows.reshape(Eb, n, F)


def _k_grad_to_div(vol_ref, dj_ref, w3_ref, nrm_ref, mi_ref, lt_ref,
                   xi_ref, wd_ref, sel_ref, div_ref, s_ref, *, nd, F):
    Eb, _, n, Np = vol_ref.shape
    # pass-1 lift: grad_c = vol_c + MI · (w3_c ⊙ dj) @ LT, all in VMEM
    prod = w3_ref[...][:, :, None, :] * dj_ref[...][:, None, :, :]
    corr = _dot(prod.reshape(Eb * 3 * n, F), lt_ref[...])
    grad = (vol_ref[...].reshape(Eb, 3 * n, Np)
            + mi_ref[...][:, None, :] * corr.reshape(Eb, 3 * n, Np))
    # pass-2 volume: divergence + n·v face scalars
    g2 = grad.reshape(Eb * 3 * n, Np)
    xi = xi_ref[...]
    div = jnp.zeros((Eb, n, Np), grad.dtype)
    for ai in range(nd):
        dv = _dot(g2, wd_ref[ai]).reshape(Eb, 3, n, Np)
        for c in range(3):
            div += xi[:, ai * 3 + c, :][:, None, :] * dv[:, c]
    div_ref[...] = div
    rows3 = _dot(g2, sel_ref[...]).reshape(Eb, 3, n, F)
    nrm = nrm_ref[...]
    s_ref[...] = (nrm[:, 0][:, None, :] * rows3[:, 0]
                  + nrm[:, 1][:, None, :] * rows3[:, 1]
                  + nrm[:, 2][:, None, :] * rows3[:, 2])


def _k_div_to_grad(div_ref, dj2_ref, sm_ref, mi_ref, lt_ref, xi_ref,
                   wd_ref, sel_ref, vol_ref, rows_ref, *, nd, F):
    Eb, n, Np = div_ref.shape
    # pass-2 lift: lap = div + MI · (sM ⊙ dj₂) @ LT
    prod = sm_ref[...][:, None, :] * dj2_ref[...]
    corr = _dot(prod.reshape(Eb * n, F), lt_ref[...])
    lap = div_ref[...] + mi_ref[...][:, None, :] * corr.reshape(Eb, n, Np)
    vol, rows = _grad_part(lap.reshape(Eb * n, Np), xi_ref[...],
                           wd_ref[...], sel_ref[...], nd, F)
    for c in range(3):
        vol_ref[:, c] = vol[c]
    rows_ref[...] = rows.reshape(Eb, n, F)


def _k_last(vol_ref, dj_ref, w3_ref, mi_ref, lt_ref, out_ref, *, F):
    Eb, _, n, Np = vol_ref.shape
    prod = w3_ref[...][:, :, None, :] * dj_ref[...][:, None, :, :]
    corr = _dot(prod.reshape(Eb * 3 * n, F), lt_ref[...])
    out_ref[...] = (vol_ref[...].reshape(Eb, 3 * n, Np)
                    + mi_ref[...][:, None, :]
                    * corr.reshape(Eb, 3 * n, Np)).reshape(Eb, 3, n, Np)


def _specs(block_e, shapes, statics):
    """BlockSpecs: per-element arrays block over E; static operator
    matrices load whole."""
    out = []
    for s in shapes:
        nl = len(s)
        out.append(pl.BlockSpec((block_e,) + s,
                                lambda i, nl=nl: (i,) + (0,) * nl,
                                memory_space=pltpu.VMEM))
    for s in statics:
        out.append(pl.BlockSpec(s, lambda i, r=len(s): (0,) * r,
                                memory_space=pltpu.VMEM))
    return out


def supports(dg) -> bool:
    from climatemachine_tpu.dg import ldg_varmajor as _lvm
    return _lvm.supports(dg)


def hyper_chain(dg, q, aux, t, direction, interpret: bool = False,
                block_e: int = 16):
    """Fused-kernel chain; same contract/result as
    ldg_varmajor.hyper_chain (parity-tested to round-off)."""
    from climatemachine_tpu.dg import ldg_varmajor as _lvm
    from climatemachine_tpu.dg.spatial import (direction_dims,
                                               direction_faces)
    bl, g = dg.balance_law, dg.grid
    dims = direction_dims(direction, g.dim)
    faces = direction_faces(direction, g.dim)

    gl = bl.compute_gradient_laplacian_argument(q, aux, t)  # [E, Np, n]
    n = gl.shape[-1]
    tab = _lvm._tables(dg, faces, n)
    if tab is None:
        return None
    grad_lap = chain_vm(dg, gl.transpose(0, 2, 1), dims, faces,
                        interpret=interpret, block_e=block_e)
    out = grad_lap.transpose(0, 3, 1, 2)                 # [E, Np, 3, n]
    return bl.transform_post_gradient_laplacian(out, q, aux, t)


def chain_vm(dg, xv, dims, faces, interpret: bool = False,
             block_e: int = 16):
    """Var-major fused chain core: xv [E, n, Np] -> grad-of-laplacian
    [E, 3, n, Np] (the whole grad -> div -> grad with per-pass volume,
    lift and extraction fused in VMEM; only the three face-row
    exchanges stay in XLA)."""
    from climatemachine_tpu.dg import ldg_varmajor as _lvm
    g = dg.grid
    n = xv.shape[1]
    tab = _lvm._tables(dg, faces, n)
    E, Np, Nfp = g.nelem, g.Np, g.Nfp_max
    nfa, F = tab["nfa"], tab["F"]
    nd = len(dims)
    be = block_e
    while E % be != 0:
        be //= 2
    grid_spec = (E // be,)
    dt = xv.dtype

    # geometry (constant-folded when the grid is concrete)
    sMf, nrm, xi4, _ = _lvm._geom(dg, faces, dims)       # see ldg_varmajor
    sM = sMf.reshape(E, F)
    w3 = sMf * nrm                                       # [E, 3, F]
    xi = xi4.reshape(E, nd * 3, Np)                      # slot ai*3+c
    MI = g.MI                                            # [E, Np]
    W = _lvm._W_for(dg, dims)                            # [nd*Np, Np]
    Wd = jnp.swapaxes(W.reshape(nd, Np, Np), 1, 2)       # [nd, Np, Np]
    Sel = jnp.asarray(tab["SelT"])                       # [Np, F]
    LT = jnp.asarray(tab["LT"])                          # [F, Np]
    sign = jnp.asarray(tab["sign"])[:, None, :]          # [E, 1, F]

    k1 = pl.pallas_call(
        functools.partial(_k_first, nd=nd, F=F),
        grid=grid_spec,
        in_specs=_specs(be, [(n, Np), (nd * 3, Np)],
                        [(nd, Np, Np), (Np, F)]),
        out_specs=[pl.BlockSpec((be, 3, n, Np), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((be, n, F), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((E, 3, n, Np), dt),
                   jax.ShapeDtypeStruct((E, n, F), dt)],
        interpret=interpret)
    vol1, rows1 = k1(xv, xi, Wd, Sel)

    rows1P = _lvm._exchange(rows1, tab, E, n, nfa, Nfp)
    dj1 = 0.5 * (rows1P - rows1)

    k2 = pl.pallas_call(
        functools.partial(_k_grad_to_div, nd=nd, F=F),
        grid=grid_spec,
        in_specs=_specs(be, [(3, n, Np), (n, F), (3, F), (3, F), (Np,)],
                        [(F, Np)]) + _specs(be, [(nd * 3, Np)],
                                            [(nd, Np, Np), (Np, F)]),
        out_specs=[pl.BlockSpec((be, n, Np), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((be, n, F), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((E, n, Np), dt),
                   jax.ShapeDtypeStruct((E, n, F), dt)],
        interpret=interpret)
    div, s = k2(vol1, dj1, w3, nrm, MI, LT, xi, Wd, Sel)

    sP = _lvm._exchange(s, tab, E, n, nfa, Nfp)
    dj2 = 0.5 * (sign * sP - s)

    k3 = pl.pallas_call(
        functools.partial(_k_div_to_grad, nd=nd, F=F),
        grid=grid_spec,
        in_specs=_specs(be, [(n, Np), (n, F), (F,), (Np,)], [(F, Np)])
        + _specs(be, [(nd * 3, Np)], [(nd, Np, Np), (Np, F)]),
        out_specs=[pl.BlockSpec((be, 3, n, Np), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((be, n, F), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((E, 3, n, Np), dt),
                   jax.ShapeDtypeStruct((E, n, F), dt)],
        interpret=interpret)
    vol3, rows3 = k3(div, dj2, sM, MI, LT, xi, Wd, Sel)

    rows3P = _lvm._exchange(rows3, tab, E, n, nfa, Nfp)
    dj3 = 0.5 * (rows3P - rows3)

    k4 = pl.pallas_call(
        functools.partial(_k_last, F=F),
        grid=grid_spec,
        in_specs=_specs(be, [(3, n, Np), (n, F), (3, F), (Np,)], [(F, Np)]),
        out_specs=pl.BlockSpec((be, 3, n, Np), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 3, n, Np), dt),
        interpret=interpret)
    return k4(vol3, dj3, w3, MI, LT)
