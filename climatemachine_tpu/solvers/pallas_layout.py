"""Pallas TPU kernels: var-major grid state <-> columnwise block layout.

The IMEX stage loop (ode/ark.py ``_step_blocks``) converts between the
var-major grid layout ``[E, nvars, Np]`` and the columnwise solver's
lanes-major block layout ``[nv, (k, var), (Eh, j, i)]`` ~5 times per
step.  In isolation XLA does one such conversion in ~0.8 ms at bench
scale, but inside the compiled step its layout assignment expands each
into chains of bitcast-copy + copy + relayout-reshape totalling
~15-25 ms/step (round-5 trace, scripts/tpu_imex_trace.py).  These
kernels pin the conversion to one pass of dense ~B·100-byte DMA runs:
the E -> (Eh, nv) and Np -> (k, ji) splits and the (Eh, ji) / (k, var)
merges happen in free XLA reshapes outside the kernel, so the lane axis
(ji = Nq2·Nq1) is never split inside Mosaic.

Semantics match ``columnwise.VMColumnLayout`` exactly (parity-tested in
tests/test_fast_rhs.py); reference analog: the reshape/permutedims
staging around ManyColumnLU (columnwise_lu_solver.jl:555).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _k_to_blocks(x_ref, y_ref):
    # x block [B, 1, v, k, ji] -> y block [1, k, v, B, ji]
    xv = x_ref[...][:, 0]                      # [B, v, k, ji]
    y_ref[...] = jnp.transpose(xv, (2, 1, 0, 3))[None]


def _k_from_blocks(y_ref, x_ref):
    yv = y_ref[...][0]                         # [k, v, B, ji]
    x_ref[...] = jnp.transpose(yv, (2, 1, 0, 3))[:, None]


@functools.partial(jax.jit, static_argnames=("layout_dims", "block_eh",
                                             "interpret"))
def to_blocks_vm(x, *, layout_dims, block_eh: int = 64,
                 interpret: bool = False):
    """x [E, nvars, Np] -> [nv, Nq3·nvars, ncol] (VMColumnLayout
    ordering: rows (k, var) k-major, cols (Eh, j, i))."""
    Eh, nv, nvars, Nq3, ji = layout_dims
    x5 = x.reshape(Eh, nv, nvars, Nq3, ji)
    B = block_eh
    while Eh % B != 0:
        B //= 2
    grid = (nv, Eh // B)
    y4 = pl.pallas_call(
        _k_to_blocks,
        grid=grid,
        in_specs=[pl.BlockSpec((B, 1, nvars, Nq3, ji),
                               lambda iv, ib: (ib, iv, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Nq3, nvars, B, ji),
                               lambda iv, ib: (iv, 0, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, Nq3, nvars, Eh, ji), x.dtype),
        interpret=interpret,
    )(x5)
    return y4.reshape(nv, Nq3 * nvars, Eh * ji)


@functools.partial(jax.jit, static_argnames=("layout_dims", "block_eh",
                                             "interpret"))
def from_blocks_vm(yb, *, layout_dims, block_eh: int = 64,
                   interpret: bool = False):
    """[nv, Nq3·nvars, ncol] -> [E, nvars, Np] (inverse of
    to_blocks_vm)."""
    Eh, nv, nvars, Nq3, ji = layout_dims
    y4 = yb.reshape(nv, Nq3, nvars, Eh, ji)
    B = block_eh
    while Eh % B != 0:
        B //= 2
    grid = (nv, Eh // B)
    x5 = pl.pallas_call(
        _k_from_blocks,
        grid=grid,
        in_specs=[pl.BlockSpec((1, Nq3, nvars, B, ji),
                               lambda iv, ib: (iv, 0, 0, ib, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 1, nvars, Nq3, ji),
                               lambda iv, ib: (ib, iv, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Eh, nv, nvars, Nq3, ji),
                                       yb.dtype),
        interpret=interpret,
    )(y4)
    return x5.reshape(Eh * nv, nvars, Nq3 * ji)
