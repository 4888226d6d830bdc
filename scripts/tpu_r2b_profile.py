"""One-shot TPU measurement for the round-2b chain/surface optimizations:
fused Wcat matmuls in the var-major LDG chain + var-major scalar-hyper
surface correction.  Prints step / RHS / chain / surface / scalar-hyper
(old vs new) at the benchmark grid."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg import ldg_varmajor as lvm
    from climatemachine_tpu.dg.spatial import (DGModel, init_ode_state,
                                               direction_faces)
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    bl, g = dg.balance_law, dg.grid
    faces = direction_faces(dg.direction, g.dim)

    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)

    def body_step():
        def body(y):
            qq, aa = y
            return solver.step(qq, aa, 0.0)
        return body

    ms = titer(body_step, (q, aux), k_lo=1, k_hi=6)
    print(f"LSRK54 step        : {ms:7.2f} ms", flush=True)

    def body_rhs():
        def body(y):
            qq, aa = y
            tend, a2 = dg(qq, aa, 0.0)
            return (qq + 1e-30 * tend, a2)
        return body

    ms_rhs = titer(body_rhs, (q, aux), k_lo=2, k_hi=10)
    print(f"full RHS           : {ms_rhs:7.2f} ms", flush=True)

    def embed(h, qq):
        red = jnp.sum(h, axis=tuple(range(2, h.ndim)))
        return qq + 1e-30 * red[..., None]

    def body_chain():
        def body(y):
            h = dg.hyperdiffusive_state(y, aux, 0.0)
            return embed(h, y)
        return body

    ms = titer(body_chain, q, k_lo=2, k_hi=10)
    print(f"chain (var-major)  : {ms:7.2f} ms", flush=True)

    # fast surface alone
    from climatemachine_tpu.dg import fast_surface as fs

    def body_surf():
        def body(y):
            tend = fs.surface_tendency(dg, y, aux, 0.0)
            return y + 1e-30 * tend
        return body

    ms = titer(body_surf, q, k_lo=2, k_hi=12)
    print(f"fast surface       : {ms:7.2f} ms", flush=True)

    # scalar hyper correction old vs new (same F2 input)
    hyper = dg.hyperdiffusive_state(q, aux, 0.0)
    F2 = bl.flux_second_order(q, None, hyper, aux, 0.0)
    F2 = jax.block_until_ready(F2)

    def body_sh_new():
        def body(f2):
            out = lvm.scalar_hyper_correction(dg, f2, faces)
            return f2 + 1e-30 * out[..., None, :]
        return body

    ms = titer(body_sh_new, F2, k_lo=2, k_hi=12)
    print(f"scalar hyper (new) : {ms:7.2f} ms", flush=True)

    def body_sh_old():
        def body(f2):
            dg._ldg_vm, keep = False, dg._ldg_vm
            try:
                out = dg._scalar_hyper_correction(q, aux, f2, faces)
            finally:
                dg._ldg_vm = keep
            return f2 + 1e-30 * out[..., None, :]
        return body

    ms = titer(body_sh_old, F2, k_lo=2, k_hi=12)
    print(f"scalar hyper (old) : {ms:7.2f} ms", flush=True)

    # update_aux + source remainder attribution
    def body_aux():
        def body(y):
            a2 = bl.update_auxiliary_state(g, y, aux, 0.0)
            return y + 1e-30 * a2[..., :y.shape[-1]]
        return body

    ms = titer(body_aux, q, k_lo=2, k_hi=12)
    print(f"update_aux         : {ms:7.2f} ms", flush=True)

    gp = q.shape[0] * q.shape[1]
    print(f"explicit throughput: {gp / (ms_rhs * 4 * 5 / 4):,.0f}"
          " (approx; see bench.py for the real number)", flush=True)


if __name__ == "__main__":
    main()
