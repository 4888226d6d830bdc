"""Phase-level timing of the Held-Suarez p4 DG RHS on the current backend.

Times each piece of DGModel.__call__ in isolation (jitted, warm) so we can
see where the step time goes.  Not a test — a perf scratchpad.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.balance_laws import state_types as st


def timeit(fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    n_horz = 6 if on_cpu else 16
    n_vert = 4 if on_cpu else 8
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    bl, g = dg.balance_law, dg.grid
    q, aux = init_ode_state(dg)
    t = 0.0

    dt = 0.3 * min_node_distance(cfg.grid) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, tt: dg(a, b, tt), dt)
    step = jax.jit(solver.step)
    print("full step      :", timeit(step, q, aux, t), "ms  (5 RHS calls)")

    rhs = jax.jit(lambda q, aux: dg(q, aux, 0.0))
    print("full RHS       :", timeit(rhs, q, aux), "ms")

    upd = jax.jit(lambda q, aux: bl.update_auxiliary_state(g, q, aux, 0.0))
    print("update_aux     :", timeit(upd, q, aux), "ms")
    aux2 = upd(q, aux)

    if dg._pallas_volume:
        from climatemachine_tpu.dg import pallas_volume as _pv
        vol = jax.jit(lambda q, aux: _pv.volume_tendency_from_grid(
            dg, q, aux, interpret=dg._pallas_interpret))
        print("pallas volume  :", timeit(vol, q, aux2), "ms")

    hyp = jax.jit(lambda q, aux: dg.hyperdiffusive_state(q, aux, 0.0))
    print("hyperdiff chain:", timeit(hyp, q, aux2), "ms")

    faces = tuple(range(g.nface))
    gath = jax.jit(lambda q, aux: dg._gather_faces(
        jnp.concatenate([q, aux], axis=-1), faces))
    print("face bundle    :", timeit(gath, q, aux2), "ms")

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
    print("surface total  :", timeit(jax.jit(surf), q, aux2), "ms")

    src = jax.jit(lambda q, aux: bl.source(q, None, aux, 0.0))
    print("source         :", timeit(src, q, aux2), "ms")


if __name__ == "__main__":
    main()
