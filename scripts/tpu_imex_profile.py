"""Device-honest profile of the IMEX north-star step components at
benchmark scale: remainder RHS, vertical linear RHS, block-tridiag
solve, assembled-operator matvec, full ARK2GKC step.

All multi-GB operands (columnwise factors, assembled operator blocks)
are threaded through jit as ARGUMENTS — capturing them as constants
inflates the HLO past the remote-compile payload limit (the same
pitfall documented in PERF_NOTES for bench.py)."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def titer_args(body, x0, args, k_lo=1, k_hi=4, reps=3):
    """Per-iteration ms of y -> body(y, args), loop-carried, args as
    jit arguments (never constants), forced scalar fetch."""

    @partial(jax.jit, static_argnums=2)
    def runk(x, a, k):
        y = jax.lax.fori_loop(0, k, lambda i, y: body(y, a), x)
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l * 0.0) + l.ravel()[0] * 1e-30 for l in leaves)

    def t(k):
        float(runk(x0, args, k))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(runk(x0, args, k))
        return (time.perf_counter() - t0) / reps * 1e3

    return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance

    nh = int(os.environ.get("NH", "16"))
    nv = int(os.environ.get("NV", "8"))
    cfg = held_suarez_config(n_horz=nh, n_vert=nv, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    ark = IMEXSolverType().make(dg, q, aux, dt)
    col = ark.solver
    print(f"nh={nh} nv={nv} dt={dt:.2f}s "
          f"surf={dg._fast_surface} vol={dg._pallas_volume}", flush=True)

    # full step: factors + op_args threaded as args (like step() does)
    factors = ark._factors()
    op_args = col.op_args()

    def step_body(y, a):
        qq, aa = y
        fac, op = a
        return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)
    ms = titer_args(step_body, (q, aux), (factors, op_args),
                    k_lo=1, k_hi=4)
    print(f"IMEX ARK2GKC step  : {ms:7.2f} ms", flush=True)

    # remainder RHS (the explicit stage work)
    def rem_body(y, a):
        qq, aa = y
        dq, aa = ark.rhs_ex(qq, aa, 0.0)
        return (dq, aa)
    ms = titer_args(rem_body, (q, aux), (), k_lo=1, k_hi=6)
    print(f"remainder RHS      : {ms:7.2f} ms", flush=True)

    # vertical linear RHS (stage-0 G path)
    def lin_body(y, a):
        qq, aa = y
        dq, _ = ark.rhs_im(qq, aa, 0.0)
        return (dq, aa)
    ms = titer_args(lin_body, (q, aux), (), k_lo=1, k_hi=6)
    print(f"vertical lin RHS   : {ms:7.2f} ms", flush=True)

    # solve (prefactorized; factors as args)
    gam = float(ark.A_im[1, 1])
    fac = factors[gam]

    def solve_body(y, a):
        return col.solve(y, gam * dt, factors=a)
    ms = titer_args(solve_body, q, fac, k_lo=1, k_hi=6)
    print(f"block-tridiag solve: {ms:7.2f} ms", flush=True)

    # assembled-operator matvec (blocks as args)
    def op_body(y, a):
        return col.apply_op(y, a)
    ms = titer_args(op_body, q, op_args, k_lo=1, k_hi=8)
    print(f"apply_op matvec    : {ms:7.2f} ms", flush=True)

    # full dg RHS (for comparison with the explicit bench)
    def full_body(y, a):
        qq, aa = y
        dq, aa = dg(qq, aa, 0.0)
        return (dq, aa)
    ms = titer_args(full_body, (q, aux), (), k_lo=1, k_hi=6)
    print(f"full DG RHS        : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
