"""Iterative system solvers demo (reference
tutorials/Numerics/SystemSolvers/{cg.jl, bgmres.jl}).

Solves the backward-Euler diffusion operator A(x) = x - dt div(D grad x)
built from the DG discretization (the same operator shape the IMEX
stages solve) three ways and reports iterations-to-tolerance:

- ``conjugate_gradient`` — A is SPD in the mass inner product (cg.jl),
- ``gmres`` — restarted GMRES on the global system,
- ``batched_gmres`` — one small independent system per vertical column,
  the reference's BatchedGeneralizedMinimalResidual concept (bgmres.jl)
  exercised over the leading batch axis.

Smoke::

    python examples/solvers_demo.py
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.solvers.iterative import (batched_gmres,
                                                  conjugate_gradient, gmres)
from climatemachine_tpu.testing.advection_diffusion import AdvectionDiffusion


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=6)
    p.add_argument("--poly", type=int, default=3)
    p.add_argument("--dt", type=float, default=0.5)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    def init(coords, t):
        x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
        return (jnp.sin(2 * np.pi * x) * jnp.cos(2 * np.pi * y)
                + 0.3 * jnp.sin(4 * np.pi * z))

    model = AdvectionDiffusion(u=(0.0, 0.0, 0.0), diffusivity=0.01,
                               init_fn=init)
    ranges = [np.linspace(0.0, 1.0, args.nel + 1)] * 3
    topo = brick_topology(ranges, periodicity=(True,) * 3)
    grid = make_grid(topo, args.poly, dtype=np.float64)
    dg = DGModel(model, grid)
    b, aux = init_ode_state(dg)

    shape = b.shape

    def A(x_flat):
        # backward-Euler operator of the diffusion balance law
        x = x_flat.reshape(shape)
        tend, _ = dg(x, aux, 0.0)
        return (x - args.dt * tend).reshape(-1)

    bf = b.reshape(-1)
    r0 = float(jnp.linalg.norm(bf))

    x, _ = gmres(A, bf, n_krylov=20, restarts=10)
    res = float(jnp.linalg.norm(A(x) - bf)) / r0
    print(f"gmres:           relres {res:.2e}")
    assert res < 1e-6

    # CG needs the SYMMETRIC form: the DG diffusion operator is
    # self-adjoint in the mass inner product, so solve M A x = M b
    # (the reference's cg.jl solves the mass-weighted SPD system)
    M = grid.M[..., None]

    def A_sym(x_flat):
        x = x_flat.reshape(shape)
        tend, _ = dg(x, aux, 0.0)
        return (M * (x - args.dt * tend)).reshape(-1)

    bM = (M * b).reshape(-1)
    x, _ = conjugate_gradient(A_sym, bM, n_iter=80)
    res = float(jnp.linalg.norm(A(x) - bf)) / r0
    print(f"cg (M-weighted): relres {res:.2e}")
    assert res < 1e-6

    # batched: many small independent systems solved concurrently (the
    # reference's BatchedGeneralizedMinimalResidual concept — per-column
    # implicit systems); here a batch of SPD tridiagonal operators
    B, n = 64, 25
    rng = np.random.RandomState(0)
    off = rng.uniform(0.1, 0.4, size=(B, n - 1))
    diag = 2.0 + rng.uniform(0.0, 1.0, size=(B, n))
    offj, diagj = jnp.asarray(off), jnp.asarray(diag)

    def A_batch(xb):                   # [B, n] -> [B, n]
        y = diagj * xb
        y = y.at[:, 1:].add(offj * xb[:, :-1])
        y = y.at[:, :-1].add(offj * xb[:, 1:])
        return y

    bb = jnp.asarray(rng.randn(B, n))
    xb, _ = batched_gmres(A_batch, bb, n_krylov=12, restarts=4)
    res = float(jnp.max(jnp.linalg.norm(A_batch(xb) - bb, axis=1)
                        / jnp.linalg.norm(bb, axis=1)))
    print(f"batched_gmres:   worst relres {res:.2e} over {B} systems")
    assert res < 1e-6


if __name__ == "__main__":
    main()
