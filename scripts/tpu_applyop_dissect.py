"""Dissect apply_op at benchmark scale: layout transposes, sel gather,
block matvec, scatter, from_columns — each loop-carried on TPU."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, body, x0, args, k_lo=2, k_hi=12, reps=3):
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

    ms = (t(k_hi) - t(k_lo)) / (k_hi - k_lo)
    print(f"{name:22s}: {ms:7.3f} ms", flush=True)
    return ms


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    ark = IMEXSolverType().make(dg, q, aux, dt)
    col = ark.solver
    lay = col.layout
    op_args = col.op_args()
    Lc, Dc, Uc, b = op_args
    sel = jnp.asarray(col._sel)
    print(f"nb={col.nb} sel={len(col._sel)} "
          f"block GB={3 * Dc.size * 4 / 1e9:.2f}", flush=True)

    # 1. full apply_op
    bench("apply_op", lambda y, a: col.apply_op(y, a), q, op_args,
          k_lo=1, k_hi=6)

    # 2. to_columns + back
    def tc(y, a):
        return lay.from_columns(lay.to_columns(y))
    bench("to/from_columns", tc, q, ())

    # 3. blk transpose + sel gather + scatter + back (no math)
    def blksel(y, a):
        xb = col._blk(lay.to_columns(y))
        xs = xb[:, sel]
        yf = jnp.zeros_like(xb).at[:, sel].set(xs)
        return lay.from_columns(
            jnp.transpose(yf, (2, 0, 1)).reshape(lay.ncol, lay.Nv))
    bench("blk+sel+scatter", blksel, q, ())

    # 4. the three bmv sweeps alone on a column-layout carry
    xs0 = col._blk(lay.to_columns(q))[:, sel]
    def sweeps(x, a):
        L, D, U = a
        y = col._bmv(D, x)
        y = y.at[1:].add(col._bmv(L[1:], x[:-1]))
        y = y.at[:-1].add(col._bmv(U[:-1], x[1:]))
        return y * 1e-6 + x * 0.999
    bench("3x bmv sweeps", sweeps, xs0, (Lc, Dc, Uc))

    # 5. solve
    gam = float(ark.A_im[1, 1])
    fac = ark._factors()[gam]
    bench("solve", lambda y, a: col.solve(y, gam * dt, factors=a), q, fac,
          k_lo=1, k_hi=6)


if __name__ == "__main__":
    main()
