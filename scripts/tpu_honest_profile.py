"""Device-honest TPU profile (loop-carried + fetch-forced; see
_bench_util.titer) of the Held-Suarez p4 RHS, the hyperdiffusion chain,
and its volume/face split."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import (DGModel, init_ode_state,
                                               direction_dims,
                                               direction_faces,
                                               strong_gradient, ref_gradient)
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    bl, g = dg.balance_law, dg.grid
    direction = getattr(bl, "hyperdiffusion_direction", None) \
        or dg.diffusion_direction
    dims = direction_dims(direction, g.dim)
    faces = direction_faces(direction, g.dim)
    nq = q.shape[-1]

    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)

    def body_step():
        def body(y):
            qq, aa = y
            q2, a2 = solver.step(qq, aa, 0.0)
            return (q2, a2)
        return body

    ms = titer(body_step, (q, aux), k_lo=1, k_hi=6)
    print(f"LSRK54 step      : {ms:7.2f} ms", flush=True)

    def body_rhs():
        def body(y):
            qq, aa = y
            tend, a2 = dg(qq, aa, 0.0)
            return (qq + 1e-30 * tend, a2)
        return body

    ms = titer(body_rhs, (q, aux), k_lo=2, k_hi=10)
    print(f"full RHS         : {ms:7.2f} ms", flush=True)

    def embed(h, qq):
        # fold the hyper state back into a q-shaped carry
        red = jnp.sum(h, axis=tuple(range(2, h.ndim)))
        return qq + 1e-30 * red[..., None]

    def body_chain():
        def body(y):
            h = dg.hyperdiffusive_state(y, aux, 0.0)
            return embed(h, y)
        return body

    ms = titer(body_chain, q, k_lo=2, k_hi=10)
    print(f"chain (full)     : {ms:7.2f} ms", flush=True)

    def vol_div(v):
        E, nc, n = v.shape[0], v.shape[2], v.shape[3]
        vflat = v.reshape(E, g.Np, nc * n)
        dv = ref_gradient(g, vflat, dims)
        dv = dv.reshape(E, len(dims), g.Np, nc, n)
        div = 0.0
        for idx, a in enumerate(dims):
            div = div + jnp.sum(g.xi_x[:, :, a, :, None] * dv[:, idx],
                                axis=2)
        return div

    def body_chain_vol():
        def body(y):
            gl = bl.compute_gradient_laplacian_argument(y, aux, 0.0)
            grad = strong_gradient(g, gl, dims)
            lap = vol_div(grad)
            grad_lap = strong_gradient(g, lap, dims)
            h = bl.transform_post_gradient_laplacian(grad_lap, y, aux, 0.0)
            return embed(h, y)
        return body

    ms = titer(body_chain_vol, q, k_lo=2, k_hi=10)
    print(f"chain (vol only) : {ms:7.2f} ms", flush=True)

    def face_grad(x):
        xM, xP = dg._gather_faces(x, faces)
        nrm = g.normals[:, faces, :, :]
        corr = nrm[..., :, None] * (0.5 * (xP + xM) - xM)[..., None, :]
        sM = g.sM[:, faces, :, None, None]
        return dg._lift(sM * corr, faces)

    def face_div(v):
        E, nc, n = v.shape[0], v.shape[2], v.shape[3]
        vflat = v.reshape(E, g.Np, nc * n)
        nrm = g.normals[:, faces, :, :]
        vM, vP = dg._gather_faces(vflat, faces)
        vM = vM.reshape(vM.shape[:-1] + (nc, n))
        vP = vP.reshape(vP.shape[:-1] + (nc, n))
        diff = 0.5 * (vP + vM) - vM
        corr = sum(nrm[..., c, None] * diff[..., c, :]
                   for c in range(nrm.shape[-1]))
        sM = g.sM[:, faces, :, None]
        return dg._lift(sM * corr, faces)

    def body_chain_face():
        def body(y):
            gl = bl.compute_gradient_laplacian_argument(y, aux, 0.0)
            grad = face_grad(gl)
            lap = face_div(grad)
            grad_lap = face_grad(lap)
            h = bl.transform_post_gradient_laplacian(grad_lap, y, aux, 0.0)
            return embed(h, y)
        return body

    ms = titer(body_chain_face, q, k_lo=2, k_hi=10)
    print(f"chain (face only): {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
