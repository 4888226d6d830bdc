"""Phase-level timing of the Held-Suarez p4 DG RHS — pieces first, full
RHS last, progressive prints (kill-tolerant).  Perf scratchpad."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def timeit(fn, *args, n=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    n_horz = 6 if on_cpu else 16
    n_vert = 4 if on_cpu else 8
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    bl, g = dg.balance_law, dg.grid
    q, aux = init_ode_state(dg)
    print("pallas:", dg._pallas_volume, " elems:", g.nelem, flush=True)

    def P(name, fn, *args):
        t0 = time.perf_counter()
        ms = timeit(fn, *args)
        print(f"{name:15s}: {ms:9.3f} ms   (compile+meas "
              f"{time.perf_counter()-t0:.0f}s)", flush=True)

    upd = jax.jit(lambda q, aux: bl.update_auxiliary_state(g, q, aux, 0.0))
    P("update_aux", upd, q, aux)
    aux2 = upd(q, aux)

    if dg._pallas_volume:
        from climatemachine_tpu.dg import pallas_volume as _pv
        vol = jax.jit(lambda q, aux: _pv.volume_tendency_from_grid(
            dg, q, aux, interpret=dg._pallas_interpret))
        P("pallas volume", vol, q, aux2)

    P("hyperdiff chain", jax.jit(
        lambda q, aux: dg.hyperdiffusive_state(q, aux, 0.0)), q, aux2)

    faces = tuple(range(g.nface))
    P("face bundle", jax.jit(lambda q, aux: dg._gather_faces(
        jnp.concatenate([q, aux], axis=-1), faces)), q, aux2)

    def surf(q, aux):
        nq = q.shape[-1]
        bM, bP = dg._gather_faces(jnp.concatenate([q, aux], axis=-1), faces)
        qM, auxM = bM[..., :nq], bM[..., nq:]
        qP, auxP = bP[..., :nq], bP[..., nq:]
        nrm = g.normals[:, faces, :, :]
        qP, auxP = dg._boundary_plus(
            lambda tag: bl.boundary_state(tag, nrm, qM, auxM, 0.0),
            faces, nrm, qM, auxM, qP, auxP, 0.0)
        fstar = dg.nf1(bl, nrm, qM, auxM, qP, auxP, 0.0)
        sM = g.sM[:, faces, :, None]
        return dg._lift(sM * fstar, faces)
    P("surface total", jax.jit(surf), q, aux2)

    P("source", jax.jit(lambda q, aux: bl.source(q, None, aux, 0.0)),
      q, aux2)

    P("full RHS", jax.jit(lambda q, aux: dg(q, aux, 0.0)), q, aux)


if __name__ == "__main__":
    main()
