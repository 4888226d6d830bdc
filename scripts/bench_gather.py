"""Micro-benchmark the face-exchange gather on TPU: where do the ms go,
and which layout gathers fastest?  Perf scratchpad."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def timeit(fn, *args, n=30, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    g = dg.grid
    q, aux = init_ode_state(dg)
    E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
    idx = g.face_nbr_row
    print(f"E={E} Np={Np} nface={nface} Nfp={Nfp} "
          f"rows={E*nface}", flush=True)

    key = jax.random.PRNGKey(0)
    for n in (4, 12, 25):
        x = jax.random.normal(key, (E, Np, n), dtype=jnp.float32)
        X = Nfp * n
        ms_rows = timeit(jax.jit(dg._face_rows), x)
        rows = dg._face_rows(x)
        ms_gather = timeit(jax.jit(lambda r: r[idx]), rows)
        ms_full = timeit(jax.jit(
            lambda x: dg._gather_faces(x, tuple(range(nface)))), x)
        # variant: pad row width to a lane multiple before the gather
        Xp = ((X + 127) // 128) * 128

        def padded(x):
            r = dg._face_rows(x)
            r = jnp.pad(r, ((0, 0), (0, Xp - X)))
            return r[idx][:, :X]
        ms_pad = timeit(jax.jit(padded), x)

        # variant: gather in [rows, Nfp, n] shape
        def shaped(x):
            r = dg._face_rows(x).reshape(E * nface, Nfp, n)
            return r[idx]
        ms_shape = timeit(jax.jit(shaped), x)

        # variant: gather whole elements' face bundles: r2 [E, nface*X],
        # one gather per face over E rows using elem-granular index
        nbr_e = np.asarray(idx).reshape(E, nface) // nface
        nbr_f = np.asarray(idx).reshape(E, nface) % nface
        nbr_e_j = jnp.asarray(nbr_e)
        nbr_f_j = jnp.asarray(nbr_f)

        def elemrows(x):
            r = dg._face_rows(x).reshape(E, nface, X)
            # per target face f: pick neighbor element rows then select
            # the source face via one-hot sum (nface small)
            outs = []
            for f in range(nface):
                re = r[nbr_e_j[:, f]]                    # [E, nface, X]
                oh = jax.nn.one_hot(nbr_f_j[:, f], nface,
                                    dtype=r.dtype)       # [E, nface]
                outs.append(jnp.einsum("efx,ef->ex", re, oh))
            return jnp.stack(outs, axis=1)
        ms_elem = timeit(jax.jit(elemrows), x)

        bw = (E * nface * X * 4 * 2) / 1e9
        print(f"n={n:3d}  rows {ms_rows:7.3f}  gather {ms_gather:7.3f}  "
              f"full {ms_full:7.3f}  padded {ms_pad:7.3f}  "
              f"shaped {ms_shape:7.3f}  elem1hot {ms_elem:7.3f} ms   "
              f"(payload r+w {bw*1e3:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
